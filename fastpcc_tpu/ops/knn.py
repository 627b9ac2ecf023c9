"""K-nearest-neighbor search as tiled XLA compute.

TPU-native replacement for the reference's knn3d CUDA extension
(reference: lib/knn3d/__init__.py:39-45, knn3d.cu:25-72): used for the Dist
reconstruction loss target (reference: lossy_coord/generative_upsample.py:152-157)
and KNN recoloring (reference: lossy_coord_lossy_color/layers.py:288-325).

Strategy: scan over reference-point tiles; per tile compute the [Nq, T]
squared-distance matrix on the MXU (|q|^2 - 2 q.r + |r|^2) and merge into a
running top-k via sort. Static shapes; masked tails use +inf distance.
"""
import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('k', 'tile'))
def knn(query: jax.Array, ref: jax.Array, ref_count, k: int = 1,
        tile: int = 2048):
    """query: [Nq, 3] float; ref: [Nr, 3] float (padded rows allowed —
    ref_count masks them). Returns (dists2 [Nq, k], idx [Nq, k])."""
    nq = query.shape[0]
    nr = ref.shape[0]
    n_tiles = -(-nr // tile)
    pad = n_tiles * tile - nr
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    q2 = (query * query).sum(-1, keepdims=True)           # [Nq, 1]

    best_d = jnp.full((nq, k), jnp.inf, query.dtype)
    best_i = jnp.full((nq, k), nr, jnp.int32)

    def body(carry, t):
        bd, bi = carry
        r = jax.lax.dynamic_slice(ref_p, (t * tile, 0), (tile, 3))
        r2 = (r * r).sum(-1)                              # [T]
        d = q2 - 2.0 * (query @ r.T) + r2[None, :]        # [Nq, T]
        gid = (t * tile + jnp.arange(tile)).astype(jnp.int32)
        valid = gid < ref_count
        d = jnp.where(valid[None, :], d, jnp.inf)
        cat_d = jnp.concatenate([bd, d], axis=1)
        cat_i = jnp.concatenate([bi, jnp.broadcast_to(gid[None, :],
                                                      (nq, tile))], axis=1)
        order = jnp.argsort(cat_d, axis=1)[:, :k]
        return (jnp.take_along_axis(cat_d, order, 1),
                jnp.take_along_axis(cat_i, order, 1)), None

    (best_d, best_i), _ = jax.lax.scan(body, (best_d, best_i),
                                       jnp.arange(n_tiles))
    return jnp.maximum(best_d, 0.0), best_i


def nn_distance(query: jax.Array, ref: jax.Array, ref_count) -> jax.Array:
    """Squared distance of each query to its nearest reference point."""
    d, _ = knn(query, ref, ref_count, k=1)
    return d[:, 0]
