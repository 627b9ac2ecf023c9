"""Bisect the libtpu leaf-while SIGABRT that blocks the FAST_CONV path.

The Aug-2026 libtpu on this rig CHECK-fails (tuple_tree.h "Cannot index
into a leaf node", inside LayoutAssignment/TuplePointsToAnalysis) while
compiling the lossl_coord encode program with the Pallas windowed conv
enabled (PERFNOTES.md round 4). The crash takes the compile-helper
subprocess down with SIGABRT, and on this rig the FIRST such failure
poisons the calling process too — so each probe variant runs in its own
subprocess, AOT compile only (no execution), and this parent just collects
return codes.

Variants (FASTPCC_FAR_COMPACT, see ops/sparse.py):
  argsort  shipped far-row compaction (stable argsort -> suspect sort
           expansion)
  cumsum   prefix-sum slot + single scatter (no sort)
  none     far correction elided entirely (NOT exact; isolates whether the
           trigger is the Pallas kernel itself vs the correction graph)

Usage: python scripts/fastconv_compile_probe.py [--channels 128]
Prints one line per variant: <mode> rc=<rc> <verdict>.
"""
import argparse
import os
import subprocess
import sys

_CHILD = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from fastpcc_tpu.ops.sparse import set_fast_conv
set_fast_conv(True)
from fastpcc_tpu.models.lossl_coord import Config
from fastpcc_tpu.models.lossl_coord.model import Model, _bucket, sp_pad_codes
from fastpcc_tpu.data.datasets.Synthetic import synthetic_lidar_scan
from fastpcc_tpu.ops.morton import np_morton_encode

ch = int(sys.argv[1])
cfg = Config(); cfg.channels = ch; cfg.coord_bits = 16; cfg.check()
model = Model(cfg)
params = model.init_params(jax.random.PRNGKey(0))
xyz = synthetic_lidar_scan(seed=1, resolution=65536)
codes_np = np.unique(np_morton_encode(xyz.astype(np.int64)))
cap = _bucket(len(codes_np))
caps, meas_mask = model._scale_plan(codes_np, cap)
# PROBE_MASK: 'all' = every scale cond-free windowed (the round-4-proven
# form); 'split' = measured density mask — dense scales windowed, sparse
# scales keep the nhit cond tree, so Mosaic outputs TRANSITIVELY feed
# lax.cond trees (the open compile question this probe answers).
mask_mode = os.environ.get('PROBE_MASK', 'all')
fast_mask = meas_mask if mask_mode == 'split' else (1 << 15) - 1
print(f'mask_mode={mask_mode} fast_mask=0x{fast_mask:x} '
      f'measured=0x{meas_mask:x}', flush=True)
codes = jnp.asarray(sp_pad_codes(codes_np, cap))
count = jnp.int32(len(codes_np))
enc = jax.jit(model._traced_encode, static_argnums=(3, 4))
enc.lower(params, codes, count, caps, fast_mask).compile()
print('ENCODE_COMPILED_OK', flush=True)
if os.environ.get('PROBE_DECODE'):
    # decode too: abstract encode outputs via eval_shape (no execution)
    bptr_s, buf_s, _c, eb_s, bc_s = jax.eval_shape(
        lambda p, c, n: model._traced_encode(p, c, n, caps, fast_mask),
        params, codes, count)
    dec = jax.jit(model._traced_decode_verify, static_argnums=(7, 8))
    dec.lower(params, eb_s, bc_s, bptr_s, buf_s,
              jax.ShapeDtypeStruct(codes.shape, codes.dtype),
              jax.ShapeDtypeStruct((), jnp.int32), caps, fast_mask).compile()
    print('DECODE_COMPILED_OK', flush=True)
print('COMPILED_OK', flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--channels', type=int, default=128)
    ap.add_argument('--modes', type=str, default='none,cumsum,argsort')
    ap.add_argument('--mask', type=str, default='all',
                    help="'all' = every scale windowed (cond-free program); "
                         "'split' = measured density mask (dense scales "
                         "windowed, sparse scales keep the cond tree)")
    ap.add_argument('--timeout', type=int, default=900)
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for mode in args.modes.split(','):
        env = dict(os.environ, FASTPCC_FAR_COMPACT=mode,
                   PROBE_MASK=args.mask)
        try:
            r = subprocess.run(
                [sys.executable, '-c', _CHILD, str(args.channels)],
                cwd=root, env=env, timeout=args.timeout,
                capture_output=True, text=True)
            ok = r.returncode == 0 and 'COMPILED_OK' in r.stdout
            tail = '' if ok else ' | ' + ' / '.join(
                ln for ln in r.stderr.splitlines()[-6:] if ln.strip())[:300]
            results[mode] = ok
            print(f'{mode:8s} rc={r.returncode} '
                  f'{"COMPILES" if ok else "CRASHES"}{tail}', flush=True)
        except subprocess.TimeoutExpired:
            results[mode] = False
            print(f'{mode:8s} rc=TIMEOUT', flush=True)
    return 0 if any(results.values()) else 1


if __name__ == '__main__':
    sys.exit(main())
