"""Parameter-indexed entropy models.

JAX rebuild of the reference's ContinuousIndexedEntropyModel
(reference: lib/entropy_models/continuous_indexed.py:16-358): an ``indexes``
tensor selects per-element distribution parameters from a bounded grid; one
shared CDF table covers the whole grid, and multi-dimensional indexes are
flattened by strides for the coder. Two instantiations:

  * ``ScaleIndexedNormalEntropyModel`` — the scale-indexed noisy Normal used
    by classic hyperpriors (reference: continuous_indexed.py:266-274).
  * ``IndexedNoisyDeepFactorized`` — per-element tiny DeepFactorized CDF nets
    whose weights/biases/factors are produced from the index vector by
    learnable transforms ('transform') or by splitting the index channels
    ('split') (reference: continuous_indexed.py:277-358).

Coding runs on either side of the host boundary:
  * host: IndexedRansCoder with the full-grid quantized CDF table (the
    reference's flow, reference: continuous_indexed.py:174-255);
  * device: quantized CDF rows gathered from the grid table by flat index and
    fed to the interleaved word coder (ops/ilv_rans.py) — this keeps
    recurrent per-scale decoders entirely on the TPU (no reference analog).
"""
import functools
import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import (noisy_normal_likelihood, LIKELIHOOD_BOUND)
from ..runtime import IndexedRansCoder


def bound_indexes(raw: jax.Array, num_indexes) -> jax.Array:
    """Clip to [0, num_indexes-1] with identity-if-towards gradient
    (reference: continuous_indexed.py:105-126, utils.py:33-77).
    num_indexes: int or per-last-dim int array."""
    hi = (jnp.asarray(num_indexes, raw.dtype) - 1.0)
    clipped = jnp.clip(raw, 0.0, hi)
    return raw + jax.lax.stop_gradient(clipped - raw)


def flat_index_strides(index_ranges: Sequence[int]) -> np.ndarray:
    """strides[i] = prod(index_ranges[i+1:]) (row-major flattening,
    reference: continuous_indexed.py:157-172)."""
    out = np.ones(len(index_ranges), np.int64)
    for i in range(len(index_ranges) - 2, -1, -1):
        out[i] = out[i + 1] * index_ranges[i + 1]
    return out


def pmf_to_quantized_cdf_rows(pmf: jax.Array) -> jax.Array:
    """[N, S] pmf -> [N, S] uint16 CDF rows in the device-coder convention
    (row[s] = cumulative count through s, row[-1] = 65535; every frequency
    >= 1). Matches the flagship's softmax quantizer arithmetic."""
    s = pmf.shape[-1]
    pmf = pmf / jnp.maximum(pmf.sum(-1, keepdims=True), LIKELIHOOD_BOUND)
    q = jnp.floor(pmf * (65536 - s)) + 1.0
    cdf = jnp.cumsum(q, axis=-1)
    cdf = cdf.at[..., -1].set(65535.0)
    return cdf.astype(jnp.uint16)


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


def _deep_factorized_logits_chain(x: jax.Array,
                                  weights: Sequence[jax.Array],
                                  biases: Sequence[jax.Array],
                                  factors: Sequence[jax.Array]) -> jax.Array:
    """Elementwise monotone logits-CDF chain with PER-ELEMENT parameters.

    x: [...]; weights[i]: [..., f_{i+1}, f_i]; biases[i]: [..., f_{i+1}];
    factors[i]: [..., f_{i+1}] (one fewer than weights). Same arithmetic as
    the reference distribution (reference: distributions/deep_factorized.py:24-52)
    but vmapped over elements instead of channels."""
    u = x[..., None]                                     # [..., f0=1]
    for i, (w, b) in enumerate(zip(weights, biases)):
        u = jnp.einsum('...ij,...j->...i', jax.nn.softplus(w), u) + b
        if i < len(weights) - 1:
            u = u + jnp.tanh(factors[i]) * jnp.tanh(u)
    return u[..., 0]


class IndexedNoisyDeepFactorized(nn.Module):
    """Generic indexed EM over NoisyDeepFactorized priors.

    indexes: [..., D] floats (D = len(index_ranges)); each element's prior is
    a tiny DeepFactorized CDF net parameterized from its index vector.
    'transform': learnable MLP stacks map the normalized index vector to each
    parameter group (reference: continuous_indexed.py:328-355); 'split': the
    index channels ARE the parameters (reference: :305-326).
    """
    index_ranges: Tuple[int, ...]
    num_filters: Tuple[int, ...] = (1, 3, 3, 1)
    parameter_fns_type: str = 'transform'
    mlp_num: int = 2                   # reference parameter_fns_mlp_num
    indexes_scaler: float = 0.0        # 0 => normalize indexes to [-1, 1]
    noise_width: float = 1.0
    bottleneck_process: str = 'noise'  # 'noise' | 'ste' | '' (passthrough)
    support_lower: int = -32           # CDF table support (integer values)
    support_upper: int = 32
    bottleneck_scaler: int = 1

    def setup(self):
        f = self.num_filters
        assert f[0] == 1 and f[-1] == 1 and len(f) >= 2
        self._w_numel = [f[i + 1] * f[i] for i in range(len(f) - 1)]
        self._b_numel = list(f[1:])
        self._a_numel = list(f[1:-1])
        if self.parameter_fns_type == 'transform':
            d = len(self.index_ranges)

            def stack(out_ch, name):
                layers = []
                for i in range(self.mlp_num - 2):
                    layers.append(nn.Dense(d, param_dtype=jnp.float32,
                                           name=f'{name}_m{i}'))
                layers.append(nn.Dense(out_ch, param_dtype=jnp.float32,
                                       name=f'{name}_mo'))
                layers.append(nn.Dense(out_ch, param_dtype=jnp.float32,
                                       name=f'{name}_lin'))
                return layers

            self._w_tf = [stack(n, f'w{i}') for i, n in enumerate(self._w_numel)]
            self._b_tf = [stack(n, f'b{i}') for i, n in enumerate(self._b_numel)]
            self._a_tf = [stack(n, f'a{i}') for i, n in enumerate(self._a_numel)]
        else:
            assert self.parameter_fns_type == 'split'
            total = sum(self._w_numel) + sum(self._b_numel) + sum(self._a_numel)
            assert len(self.index_ranges) == total, \
                f'split: need {total} index channels, got {len(self.index_ranges)}'

    def _apply_stack(self, layers, v):
        for i, lyr in enumerate(layers):
            v = lyr(v)
            if i < len(layers) - 1:
                v = jax.nn.relu(v)
        return v

    def bound(self, indexes: jax.Array) -> jax.Array:
        return bound_indexes(indexes, jnp.asarray(self.index_ranges,
                                                  indexes.dtype))

    def _normalize(self, bounded: jax.Array, rounded: bool) -> jax.Array:
        """Reference make_prior: eval rounds, then scales (reference:
        continuous_indexed.py:72-86)."""
        idx = jnp.round(bounded) if rounded else bounded
        if self.indexes_scaler != 0:
            return idx / self.indexes_scaler
        r = jnp.asarray([r - 1 for r in self.index_ranges], idx.dtype)
        return (idx / r - 0.5) * 2

    def _chain_params(self, idx_norm: jax.Array):
        """[..., D] normalized indexes -> (weights, biases, factors) lists of
        per-element parameter tensors."""
        f = self.num_filters
        if self.parameter_fns_type == 'split':
            chunks = np.cumsum([0, *self._w_numel, *self._b_numel,
                                *self._a_numel])
            parts = [idx_norm[..., chunks[i]:chunks[i + 1]]
                     for i in range(len(chunks) - 1)]
            nw = len(self._w_numel)
            nb = len(self._b_numel)
            ws = [parts[i].reshape(*idx_norm.shape[:-1], f[i + 1], f[i])
                  for i in range(nw)]
            bs = parts[nw:nw + nb]
            fs = parts[nw + nb:]
            return ws, bs, fs
        ws = [self._apply_stack(tf, idx_norm)
              .reshape(*idx_norm.shape[:-1], f[i + 1], f[i])
              for i, tf in enumerate(self._w_tf)]
        bs = [self._apply_stack(tf, idx_norm) for tf in self._b_tf]
        fs = [self._apply_stack(tf, idx_norm) for tf in self._a_tf]
        return ws, bs, fs

    def likelihood(self, y: jax.Array, indexes: jax.Array,
                   rounded_indexes: bool = False) -> jax.Array:
        """P(y) under the per-element noisy prior. y: [...];
        indexes: [..., D]."""
        bounded = self.bound(indexes)
        idx_norm = self._normalize(bounded, rounded_indexes)
        ws, bs, fs = self._chain_params(idx_norm)
        half = self.noise_width / 2
        upper = _deep_factorized_logits_chain(y + half, ws, bs, fs)
        lower = _deep_factorized_logits_chain(y - half, ws, bs, fs)
        sign = jax.lax.stop_gradient(-jnp.sign(upper + lower))
        p = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return jnp.maximum(p, LIKELIHOOD_BOUND)

    def __call__(self, y: jax.Array, indexes: jax.Array,
                 rng: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None):
        """Training pass -> (y_tilde, total bits)."""
        if self.bottleneck_scaler != 1:
            y = y * self.bottleneck_scaler
        if self.bottleneck_process == 'noise':
            y_tilde = y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        elif self.bottleneck_process == 'ste':
            y_tilde = y + jax.lax.stop_gradient(jnp.round(y) - y)
        else:
            y_tilde = y
        p = self.likelihood(y_tilde, indexes)
        bits = -jnp.log2(p)
        if mask is not None:
            bits = bits * mask
        if self.bottleneck_scaler != 1:
            y_tilde = y_tilde / self.bottleneck_scaler
        return y_tilde, bits.sum()

    # --------------------------------------------------------------- coding

    def grid_pmf(self) -> jax.Array:
        """[prod(index_ranges), V] pmf over integer support for every index
        combination (reference make_range_coding_prior_indexes,
        continuous_indexed.py:92-103)."""
        grids = jnp.meshgrid(*[jnp.arange(r, dtype=jnp.float32)
                               for r in self.index_ranges], indexing='ij')
        idx = jnp.stack(grids, axis=-1).reshape(-1, len(self.index_ranges))
        idx_norm = self._normalize(idx, rounded=True)
        ws, bs, fs = self._chain_params(idx_norm)   # each [R, ...]
        xs = jnp.arange(self.support_lower, self.support_upper + 1,
                        dtype=jnp.float32)
        x_grid = jnp.broadcast_to(xs[:, None], (xs.shape[0], idx.shape[0]))
        half = self.noise_width / 2
        upper = _deep_factorized_logits_chain(x_grid + half, ws, bs, fs)
        lower = _deep_factorized_logits_chain(x_grid - half, ws, bs, fs)
        sign = -jnp.sign(upper + lower)
        p = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return jnp.maximum(p, LIKELIHOOD_BOUND).T      # [R, V]

    def quantized_cdf_table(self) -> jax.Array:
        """[R, V] uint16 rows for the device word coder."""
        return pmf_to_quantized_cdf_rows(self.grid_pmf())

    def flatten_indexes(self, indexes: jax.Array) -> jax.Array:
        """[..., D] (possibly float) bounded indexes -> [...] flat int32."""
        idx = jnp.round(self.bound(indexes)).astype(jnp.int32)
        strides = jnp.asarray(flat_index_strides(self.index_ranges), jnp.int32)
        return (idx * strides).sum(-1)


def build_indexed_coder(pmf_grid: np.ndarray, support_lower: int,
                        overflow_coding: bool = True,
                        batch_size: int = 1) -> IndexedRansCoder:
    """Host coder over the full index grid (reference flow: one shared CDF
    table, flat indexes per element; continuous_indexed.py:174-255)."""
    offsets = np.full((pmf_grid.shape[0],), support_lower, np.int32)
    coder = IndexedRansCoder(overflow_coding, batch_size)
    coder.init_with_pmfs(np.asarray(pmf_grid, np.float64), offsets)
    return coder


# backwards-compatible alias (round 1 scaffolding name)
ContinuousIndexedEntropyModel = IndexedNoisyDeepFactorized
