"""Pallas TPU kernel: windowed 3^3 sparse conv (gather in VMEM via one-hot
MXU matmuls).

The XLA per-tap formulation (ops/sparse.py::sparse_conv_apply ``full``
branch) reads the feature matrix 27x from HBM (27 row gathers, ~0.21 ms
each at 131k x 128) plus 27 accumulate GEMMs: ~10.6 ms per conv. At the
dense pyramid scales where that branch actually runs, neighbor row offsets
are tiny in Morton order (bench cloud, scale 5-7: p50 span 1-5 rows, p90
15-146 — see PERFNOTES.md), so almost every neighbor of a block of rows
lives within a small window around it. This kernel exploits that:

  * grid over row blocks of ``blk`` rows; the kernel sees a window of
    2*blk feature rows (four blk/2-row BlockSpec views of the same feats
    array — no copies), i.e. margin = blk/2 on each side;
  * per tap, the in-window gather is a one-hot [blk, 2*blk] x [2*blk, Cin]
    matmul generated in VMEM and consumed by the MXU (TPU has no
    arbitrary-index VMEM gather; the one-hot matmul IS the idiomatic
    gather, and its mask never touches HBM);
  * products are exact (one term per output row; bf16 one-hot x bf16
    feature with f32 accumulate), so the result equals the XLA gather
    path up to f32 summation order of the 27 taps.

The kernel's FLOPs are dominated by the one-hot matmuls: per row per tap
2*blk x Cin + Cin x Cout MACs, so blk is the cost knob. Round-5
measurement on the bench cloud: shrinking blk 256 -> 128 cuts per-conv
FLOPs 40% while the far-row rate at the two dominant scales (5-6, 85% of
windowed-conv rows) only rises 0.020->0.028 / 0.076->0.106 — still far
below the n/4 correction cap. The blk choice is a pure function of the
static row capacity (window_plan), so encoder and decoder always agree.

Out-of-window neighbors are NOT handled here: the caller must add a
compacted correction over the rows whose far taps this kernel dropped —
see sparse_conv_apply. The far set is pure table arithmetic (far_mask,
same window_plan), so encoder and decoder agree.

Shapes: Cin/Cout must be multiples of 128 and N a multiple of 256
(per-scale capacities are pow-2 or 8k-multiples >= 128). sparse_conv_apply
pads narrower channel counts up to 128 lanes before calling in (the MXU is
128 lanes wide either way, so the padding is free) and falls back to the
XLA path for N % 256 != 0 or non-bf16 feats.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK = 256          # legacy output rows per grid step (window_plan may shrink)
MARGIN = 128       # legacy margin (= BLK // 2; kept for doc/test reference)


def window_plan(n: int) -> int:
    """blk for a conv over n rows (margin is always blk/2) — a pure function
    of the STATIC row capacity, so encoder and decoder derive the same
    window from the per-scale capacities already carried in the bitstream
    header.

    Large caps (>= 98304: the ~full-resolution LiDAR scales where conv time
    concentrates and Morton locality is tightest) take the small window;
    everything else keeps the round-3 geometry whose far rates are known."""
    return 128 if n >= 98304 else BLK


def _wconv_kernel(tbl_ref, f0_ref, f1_ref, f2_ref, f3_ref, w_ref, out_ref,
                  *, r, cout, cap, taps):
    b = pl.program_id(0)
    margin = r // 2
    base = b * r - margin                     # window start row in feats
    w_rows = 2 * r
    window = jnp.concatenate(
        [f0_ref[...], f1_ref[...], f2_ref[...], f3_ref[...]], axis=0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, w_rows), 1)
    acc = jnp.zeros((r, cout), jnp.float32)
    for t in range(taps):
        tcol = tbl_ref[:, t:t + 1]            # [r, 1] int32
        rel = jnp.where(tcol < cap, tcol - base, -1)
        onehot = (rel == iota).astype(jnp.bfloat16)     # [r, w_rows]
        g = jnp.dot(onehot, window, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(g.astype(jnp.bfloat16), w_ref[t],
                            preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def windowed_conv(feats: jax.Array, table: jax.Array, weights: jax.Array,
                  interpret: bool = False,
                  out_dtype=jnp.float32) -> jax.Array:
    """In-window part of a 3^3 sparse conv.

    feats:   [N, Cin] bf16 (N % 256 == 0, Cin % 128 == 0)
    table:   [N, 27] int32 neighbor rows, miss sentinel == N
    weights: [27, Cin, Cout] (cast to bf16; Cout % 128 == 0)
    -> [N, Cout] out_dtype; taps whose neighbor row is outside
    [i//blk*blk - blk/2, i//blk*blk + 3*blk/2) contribute zero, with
    blk = window_plan(N). out_dtype=bf16 halves the kernel's HBM writes
    and kills the downstream convert (callers cast to bf16 anyway).

    interpret=True runs the kernel in Pallas interpret mode (tests on the
    CPU backend); production callers leave it False.
    """
    n, cin = feats.shape
    taps = table.shape[1]
    cout = weights.shape[-1]
    blk = window_plan(n)
    sub = blk // 2                           # feats view granularity
    assert n % blk == 0 and cin % 128 == 0 and cout % 128 == 0, (n, cin, cout)
    assert feats.dtype == jnp.bfloat16
    tbl32 = jnp.pad(table.astype(jnp.int32), ((0, 0), (0, 32 - taps)),
                    constant_values=n)
    wts = weights.astype(jnp.bfloat16)
    grid = n // blk
    nsub = n // sub

    def view(off):
        # feats view: sub-row block (2*b + off), clamped at the edges;
        # out-of-range rel never matches the clamped content (masked by the
        # sentinel/rel checks in the kernel: a clamped view's window
        # positions correspond to row ids < 0 or >= n, which no valid
        # table entry carries).
        return pl.BlockSpec(
            (sub, cin), lambda b, off=off: (jnp.clip(2 * b + off, 0, nsub - 1), 0))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_wconv_kernel, r=blk, cout=cout, cap=n,
                              taps=taps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((blk, 32), lambda b: (b, 0)),
                view(-1), view(0), view(1), view(2),
                pl.BlockSpec((taps, cin, cout), lambda b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((blk, cout), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((n, cout), out_dtype),
            interpret=interpret,
        )(tbl32, feats, feats, feats, feats, wts)
    return out


def far_mask(table: jax.Array, n: int):
    """[N, 27] bool: valid neighbor outside the kernel's window (the part
    windowed_conv drops). Pure table arithmetic over the same static
    window_plan(n) — encoder and decoder agree."""
    blk = window_plan(n)
    margin = blk // 2
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    base = (rows // blk) * blk - margin
    rel = table - base
    return (table < n) & ((rel < 0) | (rel >= 2 * blk))
