"""Workarounds for TPU compiler (libtpu) bugs on this rig.

August-2026 libtpu: several HLO analysis passes assume every ``while`` in
the module has a tuple shape, but the jellyfish pipeline itself produces
single-carry (leaf-shaped) whiles when optimizing the flagship's composed
encode/decode program (the construct is absent from our input StableHLO —
all whiles are emitted variadic with >= 5 operands; verified by dumping the
lowered module). The affected passes then die with CHECK failures inside
the AOT compile helper (SIGABRT, uncatchable from Python):

  * AllReduceSimplifier -> HloReplicationAnalysis:
      Check failed: return_shape->IsTuple() Invalid index {0} for shape
      u32[131072]
  * HloModuleDCE -> HloLivenessAnalysis::MarkLiveAtIndex:
      Cannot index into a leaf node  (tuple_tree.cc)
  * ScanLoopAccumulatorInputUnification -> HloDataflowAnalysis::
      UpdateGetTupleElementValueSet: Cannot index into a leaf node

All three are optional optimization passes (the first two only matter for
multi-replica all-reduce graphs and cross-computation DCE; the third is a
scan memory optimization), so disabling them is semantics-preserving. This
must happen BEFORE the first XLA compile options are built: the debug
options ride the per-compile request into the compile helper, and the env
var is snapshotted on first use.

Round-2 note (BENCH_r02 succeeded without this): the rig's libtpu was
updated between rounds; the pass set is keyed to the current build and is
harmless where the passes behave (unknown/healthy passes simply run).
"""
import os

_BROKEN_PASSES = (
    'all-reduce-simplifier',
    'hlo-module-dce',
    # NOTE underscores: this pass registers with underscores, unlike most.
    'scan_loop_accumulator_input_unification',
)


def apply() -> None:
    """Append --xla_disable_hlo_passes for the broken passes to XLA_FLAGS
    (idempotent; merges with an existing user-provided disable list)."""
    flags = os.environ.get('XLA_FLAGS', '')
    existing = ''
    for tok in flags.split():
        if tok.startswith('--xla_disable_hlo_passes='):
            existing = tok.split('=', 1)[1]
    merged = [p for p in existing.split(',') if p]
    for p in _BROKEN_PASSES:
        if p not in merged:
            merged.append(p)
    new_tok = '--xla_disable_hlo_passes=' + ','.join(merged)
    if existing:
        flags = ' '.join(new_tok if tok.startswith('--xla_disable_hlo_passes=')
                         else tok for tok in flags.split())
    else:
        flags = (flags + ' ' + new_tok).strip()
    os.environ['XLA_FLAGS'] = flags
