"""Entropy-model tests: likelihood sanity (integrates to ~1, matches numeric
integration), bits loss finiteness, and factorized-prior compress round trip
through the real rANS coder (SURVEY §4: EM log-prob vs numeric integration)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.entropy_models import (
    DeepFactorized, noisy_logits_likelihood, noisy_normal_likelihood,
    ContinuousBatchedEntropyModel, concat_byte_streams, split_byte_streams,
)
from fastpcc_tpu.entropy_models.batched import (
    build_coder, compress_with_coder, decompress_with_coder)


def test_deep_factorized_is_valid_pmf():
    mod = DeepFactorized(channels=4)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4)), method=DeepFactorized.logits_cdf)
    # init_scale=10 puts the CDF's unit slope near x/10; +-150 covers the
    # tails to ~1e-6 mass
    xs = jnp.arange(-150, 151, dtype=jnp.float32)
    grid = jnp.broadcast_to(xs[:, None], (301, 4))
    p = noisy_logits_likelihood(
        lambda x: mod.apply(params, x, method=DeepFactorized.logits_cdf), grid)
    total = np.asarray(p.sum(0))
    np.testing.assert_allclose(total, 1.0, atol=1e-2)
    # CDF must be monotone -> all probabilities positive
    assert (np.asarray(p) > 0).all()


def test_noisy_normal_matches_numeric():
    y = jnp.asarray([-2.0, -0.3, 0.0, 1.7, 5.0])
    p = np.asarray(noisy_normal_likelihood(y, 0.0, 1.3))
    from scipy.stats import norm
    expected = norm.cdf(np.asarray(y) + 0.5, 0, 1.3) - \
        norm.cdf(np.asarray(y) - 0.5, 0, 1.3)
    np.testing.assert_allclose(p, expected, rtol=1e-5)


def test_batched_em_training_bits():
    em = ContinuousBatchedEntropyModel(channels=3)
    y = jax.random.normal(jax.random.PRNGKey(1), (100, 3)) * 3
    params = em.init(jax.random.PRNGKey(0), y, jax.random.PRNGKey(2))
    y_tilde, bits = em.apply(params, y, jax.random.PRNGKey(3))
    assert np.isfinite(float(bits))
    assert float(bits) > 0
    # noisy value stays within half a unit of the input
    assert float(jnp.abs(y_tilde - y).max()) <= 0.5 + 1e-6


def test_batched_em_roundtrip():
    em = ContinuousBatchedEntropyModel(channels=3, tail_range=16)
    y = jax.random.normal(jax.random.PRNGKey(1), (50, 3)) * 2
    params = em.init(jax.random.PRNGKey(0), y, jax.random.PRNGKey(2))
    coder = build_coder(
        lambda lo, hi: em.apply(params, lo, hi,
                                method=ContinuousBatchedEntropyModel.pmf_table),
        3, 16, batch_size=1)
    y_int = np.asarray(jnp.round(y)).astype(np.int32)[None]
    streams = compress_with_coder(coder, y_int)
    decoded = decompress_with_coder(coder, streams, (50, 3))
    np.testing.assert_array_equal(decoded[0], y_int[0])
    # out-of-table values survive via overflow coding
    y_big = y_int.copy()
    y_big[0, 0] = [100, -100, 40]
    streams = compress_with_coder(coder, y_big)
    decoded = decompress_with_coder(coder, streams, (50, 3))
    np.testing.assert_array_equal(decoded[0], y_big[0])


def test_byte_stream_concat_roundtrip():
    streams = [b'hello', b'', b'x' * 70000, b'\x00\x01']
    blob = concat_byte_streams(streams)
    out = split_byte_streams(blob, expected=4)
    assert out == streams
