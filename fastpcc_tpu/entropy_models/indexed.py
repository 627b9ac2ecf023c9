"""Parameter-indexed entropy model.

JAX rebuild of the reference's ContinuousIndexedEntropyModel
(reference: lib/entropy_models/continuous_indexed.py:16-358): an ``indexes``
tensor selects per-element distribution parameters from a bounded grid; one
shared CDF table covers the whole grid, and multi-dimensional indexes are
flattened by strides for the coder. The canonical instantiation is the
scale-indexed noisy Normal used by hyperpriors (reference:
continuous_indexed.py:266-274).
"""
from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import noisy_normal_likelihood, LIKELIHOOD_BOUND
from ..runtime import IndexedRansCoder


def bound_indexes(raw: jax.Array, num_indexes: int) -> jax.Array:
    """Clip to [0, num_indexes-1] with identity-if-towards gradient
    (reference: continuous_indexed.py:105-126, utils.py:33-77)."""
    lo, hi = 0.0, float(num_indexes - 1)
    clipped = jnp.clip(raw, lo, hi)
    return raw + jax.lax.stop_gradient(clipped - raw)


class ScaleIndexedNormalEntropyModel(nn.Module):
    """Noisy Normal with scale selected from a log-spaced table by index."""
    num_scales: int = 64
    scale_min: float = 0.11
    scale_max: float = 64.0
    tail_range: int = 64

    def scale_table(self) -> jax.Array:
        log_min, log_max = jnp.log(self.scale_min), jnp.log(self.scale_max)
        return jnp.exp(jnp.linspace(log_min, log_max, self.num_scales))

    def likelihood(self, y_tilde: jax.Array, indexes: jax.Array) -> jax.Array:
        idx = bound_indexes(indexes, self.num_scales)
        table = self.scale_table()
        # differentiable lookup: linear interp between adjacent table entries
        i0 = jnp.floor(idx).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, self.num_scales - 1)
        w = idx - i0
        scale = table[i0] * (1 - w) + table[i1] * w
        return noisy_normal_likelihood(y_tilde, 0.0, scale)

    def __call__(self, y: jax.Array, indexes: jax.Array, rng: jax.Array):
        y_tilde = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        p = self.likelihood(y_tilde, indexes)
        return y_tilde, -jnp.log2(p)

    def pmf_table(self) -> jax.Array:
        xs = jnp.arange(-self.tail_range, self.tail_range + 1,
                        dtype=jnp.float32)
        scales = self.scale_table()
        return noisy_normal_likelihood(xs[None, :], 0.0, scales[:, None])


def build_scale_indexed_coder(apply_fn, params,
                              module: ScaleIndexedNormalEntropyModel,
                              batch_size: int = 1) -> IndexedRansCoder:
    pmf = np.asarray(apply_fn(params,
                              method=ScaleIndexedNormalEntropyModel.pmf_table),
                     dtype=np.float64)
    offsets = np.full((pmf.shape[0],), -module.tail_range, np.int32)
    coder = IndexedRansCoder(True, batch_size)
    coder.init_with_pmfs(pmf, offsets)
    return coder


class ContinuousIndexedEntropyModel(nn.Module):
    """Generic indexed EM: ``likelihood_fn(y, params)`` with parameters
    gathered from learnable per-index tables built by ``param_fns``.

    index_ranges: size of each index dimension; multi-dim indexes are
    flattened row-major (reference: continuous_indexed.py:157-172)."""
    index_ranges: Tuple[int, ...]
    likelihood_fn: Callable = None        # (y, *params) -> likelihood
    param_tables: Tuple[Tuple[str, Tuple[int, ...]], ...] = ()
    tail_range: int = 64

    def setup(self):
        self.tables = {
            name: self.param(name, nn.initializers.normal(1.0), shape,
                             jnp.float32)
            for name, shape in self.param_tables}

    def flatten_indexes(self, indexes: jax.Array) -> jax.Array:
        """[..., D] int indexes -> [...] flat (row-major strides)."""
        if len(self.index_ranges) == 1:
            return indexes.reshape(indexes.shape[:-1]) \
                if indexes.shape[-1] == 1 else indexes
        strides = jnp.asarray(flat_index_strides(self.index_ranges),
                              indexes.dtype)
        return (indexes * strides).sum(-1)


def flat_index_strides(index_ranges: Sequence[int]) -> np.ndarray:
    """strides[i] = prod(index_ranges[i+1:]) (row-major flattening,
    reference: continuous_indexed.py:157-172)."""
    out = np.ones(len(index_ranges), np.int64)
    for i in range(len(index_ranges) - 2, -1, -1):
        out[i] = out[i + 1] * index_ranges[i + 1]
    return out
