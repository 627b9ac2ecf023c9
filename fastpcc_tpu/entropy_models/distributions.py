"""Prior distributions for learned entropy models.

JAX rebuild of the reference's distribution zoo
(reference: lib/entropy_models/distributions/deep_factorized.py:24-77,
uniform_noise.py:21-133, special_math.py): the Ballé fully-factorized
logits-CDF network and uniform-noise-relaxed likelihoods with numerically
stable tail handling (jax.scipy.special provides log_ndtr natively, so no
Cephes port is needed).
"""
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LIKELIHOOD_BOUND = 1e-9


class DeepFactorized(nn.Module):
    """Per-channel monotone CDF network producing logits of F(x).

    Matches the reference parameterization: per layer, x' = softplus(H) x + b,
    then x' += tanh(a) * tanh(x') between layers
    (reference: distributions/deep_factorized.py:24-52).
    """
    channels: int
    filters: Sequence[int] = (3, 3, 3)
    init_scale: float = 10.0

    @nn.compact
    def logits_cdf(self, x: jax.Array) -> jax.Array:
        """x: [..., C] -> logits of the CDF at x, same shape."""
        f = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        u = x[..., None]                      # [..., C, 1]
        for k in range(len(f) - 1):
            h_init = nn.initializers.constant(
                jnp.log(jnp.expm1(1 / scale / f[k + 1])))
            h = self.param(f'h{k}', h_init, (self.channels, f[k + 1], f[k]),
                           jnp.float32)
            b = self.param(f'b{k}', nn.initializers.uniform(1.0),
                           (self.channels, f[k + 1], 1), jnp.float32)
            u = jnp.einsum('cij,...cj->...ci', jax.nn.softplus(h), u) + b[..., 0]
            if k < len(f) - 2:
                a = self.param(f'a{k}', nn.initializers.zeros,
                               (self.channels, f[k + 1], 1), jnp.float32)
                u = u + jnp.tanh(a[..., 0]) * jnp.tanh(u)
        return u[..., 0]

    def __call__(self, x):
        return self.logits_cdf(x)


def noisy_logits_likelihood(logits_cdf_fn, y: jax.Array) -> jax.Array:
    """P(y + U(-1/2, 1/2)) for a logits-CDF prior, with the sign trick for
    numerical stability in the tails (reference: uniform_noise.py:30-87)."""
    upper = logits_cdf_fn(y + 0.5)
    lower = logits_cdf_fn(y - 0.5)
    sign = -jnp.sign(upper + lower)
    sign = jax.lax.stop_gradient(sign)
    p = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
    return jnp.maximum(p, LIKELIHOOD_BOUND)


def noisy_normal_likelihood(y: jax.Array, loc, scale) -> jax.Array:
    """P(y + U(-1/2, 1/2)) under Normal(loc, scale), via the stable
    cdf/sf difference (reference: uniform_noise.py:58-87)."""
    x = (y - loc) / scale
    half = 0.5 / scale
    # survival-function form: both terms stay small in the tails, so the
    # difference keeps precision where cdf(big) - cdf(small) would cancel
    # to 0 in float32 (symmetric: P(|x| in band) identical either side of 0)
    p = jax.scipy.special.ndtr(-(jnp.abs(x) - half)) - \
        jax.scipy.special.ndtr(-(jnp.abs(x) + half))
    return jnp.maximum(p, LIKELIHOOD_BOUND)


def bits_from_likelihood(p: jax.Array, mask=None) -> jax.Array:
    bits = -jnp.log2(p)
    if mask is not None:
        bits = bits * mask
    return bits.sum()
