"""Factorized-prior ("batched") entropy model.

JAX rebuild of the reference's ContinuousBatchedEntropyModel
(reference: lib/entropy_models/continuous_batched.py:17-200): training adds
uniform noise and scores bits under the DeepFactorized prior; evaluation
builds per-channel quantized CDF tables (trimming/offsets handled by the
native CDF quantizer) and runs the overflow-capable IndexedRansCoder. The
channel index pattern is the coder's implicit ``j % n_cdfs`` — flattened
[..., C] symbol order makes that exactly per-channel CDF selection.
"""
import functools
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .distributions import (DeepFactorized, noisy_logits_likelihood,
                            LIKELIHOOD_BOUND)
from ..runtime import IndexedRansCoder


class ContinuousBatchedEntropyModel(nn.Module):
    channels: int
    filters: Tuple[int, ...] = (3, 3, 3)
    init_scale: float = 10.0
    tail_range: int = 32          # CDF table support [-tail_range, tail_range]
    bottleneck_process: str = 'noise'   # 'noise' | 'ste'

    def setup(self):
        self.prior = DeepFactorized(self.channels, self.filters,
                                    self.init_scale)

    def perturb(self, y: jax.Array, rng: jax.Array) -> jax.Array:
        if self.bottleneck_process == 'noise':
            return y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)
        rounded = jnp.round(y)
        return y + jax.lax.stop_gradient(rounded - y)   # STE round

    def bits(self, y_tilde: jax.Array, mask: Optional[jax.Array] = None):
        """Total bits of the (noisy) bottleneck under the prior."""
        p = noisy_logits_likelihood(self.prior.logits_cdf, y_tilde)
        bits = -jnp.log2(p)
        if mask is not None:
            bits = bits * mask[..., None]
        return bits.sum()

    def __call__(self, y: jax.Array, rng: jax.Array,
                 mask: Optional[jax.Array] = None):
        y_tilde = self.perturb(y, rng)
        return y_tilde, self.bits(y_tilde, mask)

    def pmf_table(self, lower: int, upper: int) -> jax.Array:
        """[C, upper-lower+1] pmf of each integer value (for CDF building)."""
        xs = jnp.arange(lower, upper + 1, dtype=jnp.float32)
        grid = jnp.broadcast_to(xs[:, None], (xs.shape[0], self.channels))
        p = noisy_logits_likelihood(self.prior.logits_cdf, grid)  # [V, C]
        return p.T


def build_coder(pmf_fn, channels: int, tail_range: int,
                batch_size: int = 1) -> IndexedRansCoder:
    """Host-side CDF-table construction (the analog of the reference's
    .eval()-triggered build_quantized_cdf_table, continuous_base.py:87-146,
    made explicit here — no implicit mode-switch side effects).

    pmf_fn(lower, upper) -> [C, upper-lower+1] pmf array."""
    pmf = np.asarray(pmf_fn(-tail_range, tail_range), dtype=np.float64)
    offsets = np.full((channels,), -tail_range, np.int32)
    coder = IndexedRansCoder(True, batch_size)
    coder.init_with_pmfs(pmf, offsets)
    return coder


def compress_with_coder(coder: IndexedRansCoder, y_int: np.ndarray) -> List[bytes]:
    """y_int: [units, ..., C] integer symbols."""
    units = y_int.shape[0]
    return coder.encode(y_int.reshape(units, -1).astype(np.int32))


def decompress_with_coder(coder: IndexedRansCoder, streams: List[bytes],
                          shape: Tuple[int, ...]) -> np.ndarray:
    out = np.empty((len(streams), int(np.prod(shape))), np.int32)
    coder.decode(streams, out)
    return out.reshape((len(streams),) + tuple(shape))
