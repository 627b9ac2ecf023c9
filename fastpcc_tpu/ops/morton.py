"""3D Morton (Z-order) codes as vectorized XLA integer ops.

The reference implements these as CUDA magic-bits kernels with a numpy
fallback (reference: lib/space_filling_curves/morton3d.cu:8-37,
lib/space_filling_curves/__init__.py:46-88); on TPU they are plain fused
integer element-wise ops — no kernel needed.

Convention: this framework always uses the reference's *inverse* axis order
('xyz' reversed to 'zyx'): z occupies bit 0, y bit 1, x bit 2 of each 3-bit
level, so x is the most significant axis. Consequently ``code & 7`` equals the
child-offset index i = 4x+2y+z used by the reference's unfold kernel
(reference: lossl_coord/model.py:338-340), and sorting by code reproduces
``morton_sort_inverse: True`` dataset order.
"""
import functools

import jax
import jax.numpy as jnp

MAX_BITS = 21  # 3*21 = 63 bits


def _spread3(v: jax.Array) -> jax.Array:
    """Interleave: spread the low 21 bits of v so bit i moves to bit 3i."""
    v = v.astype(jnp.int64)
    v = (v | (v << 32)) & jnp.int64(0x1F00000000FFFF)
    v = (v | (v << 16)) & jnp.int64(0x1F0000FF0000FF)
    v = (v | (v << 8)) & jnp.int64(0x100F00F00F00F00F)
    v = (v | (v << 4)) & jnp.int64(0x10C30C30C30C30C3)
    v = (v | (v << 2)) & jnp.int64(0x1249249249249249)
    return v


def _compact3(v: jax.Array) -> jax.Array:
    """Inverse of _spread3: gather every 3rd bit back into the low 21 bits."""
    v = v & jnp.int64(0x1249249249249249)
    v = (v ^ (v >> 2)) & jnp.int64(0x10C30C30C30C30C3)
    v = (v ^ (v >> 4)) & jnp.int64(0x100F00F00F00F00F)
    v = (v ^ (v >> 8)) & jnp.int64(0x1F0000FF0000FF)
    v = (v ^ (v >> 16)) & jnp.int64(0x1F00000000FFFF)
    v = (v ^ (v >> 32)) & jnp.int64(0x1FFFFF)
    return v


def morton_encode_xyz(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """Encode non-negative integer coords (< 2^21 each); x most significant."""
    return (_spread3(x) << 2) | (_spread3(y) << 1) | _spread3(z)


# NOTE: these are jitted at definition on purpose. Executed eagerly, each
# magic-bits step becomes its own program embedding a large int64 literal,
# which trips this TPU runtime's pathological slow mode (all subsequent
# dispatches in the process degrade to ~2s; found by bisection). In-trace the
# same constants are harmless.
@jax.jit
def morton_encode(xyz: jax.Array) -> jax.Array:
    """xyz: [..., 3] int array -> [...] int64 codes."""
    return morton_encode_xyz(xyz[..., 0], xyz[..., 1], xyz[..., 2])


@jax.jit
def morton_decode(code: jax.Array) -> jax.Array:
    """[...] int64 codes -> [..., 3] int32 coords."""
    x = _compact3(code >> 2)
    y = _compact3(code >> 1)
    z = _compact3(code)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('bits',))
def masked_decode(codes: jax.Array, bits: int) -> jax.Array:
    """Strip the batch field and decode: [..., 3] coords."""
    mask = (jnp.int64(1) << (3 * bits)) - 1
    return morton_decode(codes & mask)


@functools.partial(jax.jit, static_argnames=('bits',))
def sort_points_by_code(xyz: jax.Array, bits: int = MAX_BITS):
    """Return (sorted codes, permutation) for integer coords [N, 3]."""
    del bits
    codes = morton_encode(xyz)
    perm = jnp.argsort(codes)
    return codes[perm], perm


def np_morton_decode(code) -> 'np.ndarray':
    """Host-side inverse of np_morton_encode -> [..., 3] int64 coords."""
    import numpy as np
    c = np.asarray(code, np.int64)
    cols = []
    for shift in (2, 1, 0):
        a = (c >> shift) & 0x1249249249249249
        a = (a | (a >> 2)) & 0x10C30C30C30C30C3
        a = (a | (a >> 4)) & 0x100F00F00F00F00F
        a = (a | (a >> 8)) & 0x1F0000FF0000FF
        a = (a | (a >> 16)) & 0x1F00000000FFFF
        a = (a | (a >> 32)) & 0x1FFFFF
        cols.append(a)
    return np.stack(cols, axis=-1)


def np_morton_encode(xyz) -> 'np.ndarray':
    """Host-side numpy variant (dataset prep / collate; same bit layout)."""
    import numpy as np
    v = xyz.astype(np.int64)
    out = 0
    parts = []
    for col, shift in ((0, 2), (1, 1), (2, 0)):
        a = v[..., col]
        a = (a | (a << 32)) & 0x1F00000000FFFF
        a = (a | (a << 16)) & 0x1F0000FF0000FF
        a = (a | (a << 8)) & 0x100F00F00F00F00F
        a = (a | (a << 4)) & 0x10C30C30C30C30C3
        a = (a | (a << 2)) & 0x1249249249249249
        parts.append(a << shift)
    return parts[0] | parts[1] | parts[2]
