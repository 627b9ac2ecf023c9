"""Pallas TPU kernel: windowed 3^3 sparse conv (gather in VMEM via one-hot
MXU matmuls).

The XLA per-tap formulation (ops/sparse.py::sparse_conv_apply ``full``
branch) reads the feature matrix 27x from HBM (27 row gathers, ~0.21 ms
each at 131k x 128) plus 27 accumulate GEMMs: ~10.6 ms per conv. At the
dense pyramid scales where that branch actually runs, neighbor row offsets
are tiny in Morton order (bench cloud, scale 5-7: p50 span 1-5 rows, p90
15-146 — see PERFNOTES.md), so almost every neighbor of a block of rows
lives within +-128 rows of it. This kernel exploits that:

  * grid over row blocks of BLK rows; the kernel sees a window of
    BLK + 2*MARGIN feature rows (four 128-row BlockSpec views of the
    same feats array — no copies);
  * per tap, the in-window gather is a one-hot [BLK, W] x [W, Cin] matmul
    generated in VMEM and consumed by the MXU (TPU has no arbitrary-index
    VMEM gather; the one-hot matmul IS the idiomatic gather, and its mask
    never touches HBM);
  * products are exact (one term per output row; bf16 one-hot x bf16
    feature with f32 accumulate), so the result equals the XLA gather
    path up to f32 summation order of the 27 taps.

Out-of-window neighbors (2-25% of rows at the dense scales) are NOT
handled here: the caller must add a compacted correction over the rows
whose far taps this kernel dropped — see sparse_conv_apply. The far set
is pure table arithmetic (far_mask), so encoder and decoder agree.

Shapes: Cin/Cout must be multiples of 128 and N a multiple of 256
(per-scale capacities are pow-2 >= 128). sparse_conv_apply pads narrower
channel counts up to 128 lanes before calling in (the MXU is 128 lanes
wide either way, so the padding is free) and falls back to the XLA path
for N % 256 != 0 or non-bf16 feats.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK = 256          # output rows per grid step
MARGIN = 128       # in-window reach beyond the block on each side
_SUB = 128         # feats view granularity (window = BLK + 2*MARGIN rows)


def _wconv_kernel(tbl_ref, f0_ref, f1_ref, f2_ref, f3_ref, w_ref, out_ref,
                  *, r, cout, cap, taps):
    b = pl.program_id(0)
    base = b * r - MARGIN                     # window start row in feats
    w_rows = r + 2 * MARGIN
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
    out_ref[...] = acc


def windowed_conv(feats: jax.Array, table: jax.Array, weights: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """In-window part of a 3^3 sparse conv.

    feats:   [N, Cin] bf16 (N % 256 == 0, Cin % 128 == 0)
    table:   [N, 27] int32 neighbor rows, miss sentinel == N
    weights: [27, Cin, Cout] (cast to bf16; Cout % 128 == 0)
    -> [N, Cout] f32; taps whose neighbor row is outside
    [i//BLK*BLK - MARGIN, i//BLK*BLK + BLK + MARGIN) contribute zero.

    interpret=True runs the kernel in Pallas interpret mode (tests on the
    CPU backend); production callers leave it False.
    """
    n, cin = feats.shape
    taps = table.shape[1]
    cout = weights.shape[-1]
    assert n % BLK == 0 and cin % 128 == 0 and cout % 128 == 0, (n, cin, cout)
    assert feats.dtype == jnp.bfloat16
    tbl32 = jnp.pad(table.astype(jnp.int32), ((0, 0), (0, 32 - taps)),
                    constant_values=n)
    wts = weights.astype(jnp.bfloat16)
    grid = n // BLK
    nsub = n // _SUB
    k = BLK // _SUB                          # sub-blocks per output block

    def sub(off):
        # feats view: 128-row sub-block (k*b + off), clamped at the edges;
        # out-of-range rel never matches the clamped content (masked by the
        # sentinel/rel checks in the kernel: a clamped view's window
        # positions correspond to row ids < 0 or >= n, which no valid
        # table entry carries).
        return pl.BlockSpec(
            (_SUB, cin), lambda b, off=off: (jnp.clip(k * b + off, 0, nsub - 1), 0))

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_wconv_kernel, r=BLK, cout=cout, cap=n,
                              taps=taps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((BLK, 32), lambda b: (b, 0)),
                sub(-1), sub(0), sub(1), sub(2),
                pl.BlockSpec((taps, cin, cout), lambda b: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BLK, cout), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((n, cout), jnp.float32),
            interpret=interpret,
        )(tbl32, feats, feats, feats, feats, wts)
    return out


def far_mask(table: jax.Array, n: int):
    """[N, 27] bool: valid neighbor outside the kernel's window (the part
    windowed_conv drops). Pure table arithmetic — encoder and decoder agree."""
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]
    base = (rows // BLK) * BLK - MARGIN
    rel = table - base
    return (table < n) & ((rel < 0) | (rel >= BLK + 2 * MARGIN))
