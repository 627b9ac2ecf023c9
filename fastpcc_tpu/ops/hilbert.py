"""3D Hilbert-curve codes, vectorized (Skilling's transpose algorithm).

Counterpart of the reference's LUT-based CUDA kernel
(reference: lib/space_filling_curves/hilbert3d.cu:10-62). Used as an
alternative dataset sort order; any fixed Hilbert convention works for that
purpose (this one is Skilling 2004, which differs from the reference's LUT
orientation but has identical locality properties).
"""
import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('bits',))
def hilbert3d_encode(xyz: jax.Array, bits: int = 21) -> jax.Array:
    """[N, 3] non-negative ints (< 2^bits) -> [N] int64 Hilbert indexes."""
    x = [xyz[..., i].astype(jnp.int64) for i in range(3)]

    m = jnp.int64(1) << (bits - 1)
    # inverse undo excess work
    q = m
    for _ in range(bits - 1):
        p = q - 1
        for i in range(3):
            cond = (x[i] & q) != 0
            x0_flip = x[0] ^ p
            t = (x[0] ^ x[i]) & p
            x0_swap = x[0] ^ t
            xi_swap = x[i] ^ t
            x[0] = jnp.where(cond, x0_flip, x0_swap)
            if i != 0:
                x[i] = jnp.where(cond, x[i], xi_swap)
        q >>= 1

    # Gray encode
    for i in range(1, 3):
        x[i] = x[i] ^ x[i - 1]
    t = jnp.zeros_like(x[0])
    q = m
    for _ in range(bits - 1):
        t = jnp.where((x[2] & q) != 0, t ^ (q - 1), t)
        q >>= 1
    for i in range(3):
        x[i] = x[i] ^ t

    # interleave (x major): bit b of axis i -> position 3b + (2 - i)
    out = jnp.zeros_like(x[0])
    for b in range(bits):
        for i in range(3):
            bit = (x[i] >> b) & 1
            out = out | (bit << (3 * b + (2 - i)))
    return out
