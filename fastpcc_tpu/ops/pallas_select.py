"""Pallas TPU kernel: fused (Dense ch -> 8*ch) + octant child selection.

The XLA form of OctantSelectDense (nn/blocks.py) runs 8 masked GEMMs whose
where-select chain materializes ~8 x [N, ch] bf16 intermediates in HBM
(~0.8 GB of traffic per call at 131k x 128 — round-5 fusion-tail
attribution). This kernel computes the full [R, 8*ch] product in VMEM and
writes only the selected [R, ch] rows: HBM traffic drops to one read of the
gathered parent features plus one ch-wide write.

Numerics match the XLA path: bf16 GEMM with f32 accumulate, bias added in
the activation dtype per octant block, select by integer octant compare.
Like every eval-side Pallas kernel here it has no VJP — callers gate on the
fast-conv scope so training always takes the XLA path.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 256


def _select_kernel(g_ref, oct_ref, k_ref, out_ref, *, ch: int):
    g = g_ref[...]                                        # [R, cin] bf16
    k = k_ref[...]                                        # [cin, 8ch]
    y = jnp.dot(g, k, preferred_element_type=jnp.float32)   # [R, 8ch] f32
    y = y.astype(g.dtype)
    oct_c = oct_ref[...]                                  # [R, 1] int32
    out = jnp.zeros((g.shape[0], ch), g.dtype)
    for o in range(8):
        # bias is added OUTSIDE the kernel (an [8, ch] octant gather —
        # Mosaic on this rig cannot legalize the [1, 8ch] -> [R, ch]
        # sublane broadcast the in-kernel add would need)
        out = jnp.where(oct_c == o, y[:, o * ch:(o + 1) * ch], out)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=('interpret',))
def octant_select_dense(gathered: jax.Array, octant: jax.Array,
                        kernel: jax.Array, bias: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """gathered [N, cin] (parent features pre-gathered per child row),
    octant [N] int32, kernel [cin, 8*ch], bias [8*ch] -> [N, ch].

    Requires N % 256 == 0, cin % 128 == 0, ch % 128 == 0 and bf16 inputs;
    callers fall back to the XLA path otherwise."""
    n, cin = gathered.shape
    ch = kernel.shape[-1] // 8
    assert n % _ROWS == 0 and cin % 128 == 0 and ch % 128 == 0, (n, cin, ch)
    oct32 = octant.astype(jnp.int32)
    kd = kernel.astype(gathered.dtype)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_select_kernel, ch=ch),
            grid=(n // _ROWS,),
            in_specs=[
                pl.BlockSpec((_ROWS, cin), lambda i: (i, 0)),
                pl.BlockSpec((_ROWS, 1), lambda i: (i, 0)),
                pl.BlockSpec((cin, 8 * ch), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((_ROWS, ch), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, ch), gathered.dtype),
            interpret=interpret,
        )(gathered, oct32.reshape(n, 1), kd)
    # per-octant bias: an [8, ch] row gather + add, fused by XLA into the
    # kernel's consumer (bf16 add matches the XLA path's epilogue order)
    bsel = bias.astype(gathered.dtype).reshape(8, ch)[oct32]
    return out + bsel


def _lut_select_kernel(x_ref, oct_ref, luts_ref, out_ref, *, out_w: int):
    """out[i, j] = x[i, luts[oct_i, j]] via in-VMEM one-hot f32 dots
    (index values < 2^24 -> exact)."""
    x = x_ref[...].astype(jnp.float32)                    # [R, in_w]
    oct_c = oct_ref[...]                                  # [R, 1] int32
    out = jnp.zeros((x.shape[0], out_w), jnp.float32)
    for o in range(8):
        y = jnp.dot(x, luts_ref[o], preferred_element_type=jnp.float32)
        out = jnp.where(oct_c == o, y, out)
    out_ref[...] = out.astype(jnp.int32)


def lut_select_pallas(x: jax.Array, octant: jax.Array, lut,
                      interpret: bool = False) -> jax.Array:
    """Per-row static lane selection: out[i, j] = x[i, lut[octant_i, j]].

    x: [N, in_w] int32 (values < 2^24), octant: [N] int32 in [0, 8),
    lut: numpy [8, out_w] int32 of lane indices -> [N, out_w] int32.

    Replaces the XLA masked one-hot HIGHEST matmul chain of
    sparse.child_table_from_parent (which materializes f32 copies of the
    [N, in_w] operands plus 8 where-passes in HBM per stage — round-5
    fusion attribution); here the one-hot dots and the converts all stay
    in VMEM. N % 256 == 0 and lane widths get padded to 128 internally.
    """
    import numpy as np
    n, in_w = x.shape
    out_w = lut.shape[1]
    in_p = -(-in_w // 128) * 128
    out_p = -(-out_w // 128) * 128
    if in_p != in_w:
        x = jnp.pad(x, ((0, 0), (0, in_p - in_w)))
    luts = np.zeros((8, in_p, out_p), np.float32)
    for o in range(8):
        luts[o, lut[o], np.arange(out_w)] = 1.0
    rows = min(_ROWS, n)
    assert n % rows == 0, f'row count {n} not divisible by block {rows}'
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_lut_select_kernel, out_w=out_p),
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, in_p), lambda i: (i, 0)),
                      pl.BlockSpec((rows, 1), lambda i: (i, 0)),
                      pl.BlockSpec((8, in_p, out_p), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((rows, out_p), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, out_p), jnp.int32),
            interpret=interpret,
        )(x, octant.astype(jnp.int32).reshape(n, 1), jnp.asarray(luts))
    return out[:, :out_w]
