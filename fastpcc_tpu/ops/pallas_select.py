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
