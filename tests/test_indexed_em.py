"""Generic indexed entropy model (entropy_models/indexed.py).

Mirrors the reference's ContinuousIndexedEntropyModel semantics
(reference: lib/entropy_models/continuous_indexed.py:174-358): full-grid CDF
table + flat indexes, 'transform' and 'split' parameter fns, round trip via
the host IndexedRansCoder and via the device word coder.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.entropy_models.indexed import (
    IndexedNoisyDeepFactorized, build_indexed_coder, flat_index_strides,
    pmf_to_quantized_cdf_rows)
from fastpcc_tpu.ops import ilv_rans as ir


def _make(ranges=(4, 4, 4), fns='transform', **kw):
    em = IndexedNoisyDeepFactorized(
        index_ranges=ranges, num_filters=(1, 2, 1), parameter_fns_type=fns,
        support_lower=-8, support_upper=8, **kw)
    rng = jax.random.PRNGKey(0)
    y = jnp.zeros((16,))
    idx = jnp.zeros((16, len(ranges)))
    params = em.init({'params': rng}, y, idx, rng,
                     method=IndexedNoisyDeepFactorized.__call__)
    return em, params


def test_pmf_normalizes():
    em, params = _make()
    pmf = em.apply(params, method=IndexedNoisyDeepFactorized.grid_pmf)
    pmf = np.asarray(pmf)
    assert pmf.shape == (64, 17)
    # noisy CDF-net priors integrate to <= 1; most mass inside the support
    # (out-of-support mass is handled by the coder's overflow coding)
    sums = pmf.sum(-1)
    assert (sums <= 1.001).all()
    assert np.median(sums) > 0.9


def test_likelihood_matches_grid_pmf():
    """likelihood() at integer y with rounded indexes must equal the
    corresponding grid_pmf entry (the coder-side consistency condition)."""
    em, params = _make()
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, size=(32, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-6, 7, size=(32,)).astype(np.float32))
    p = em.apply(params, y, idx, True,
                 method=IndexedNoisyDeepFactorized.likelihood)
    grid = em.apply(params, method=IndexedNoisyDeepFactorized.grid_pmf)
    flat = em.apply(params, idx,
                    method=IndexedNoisyDeepFactorized.flatten_indexes)
    expect = np.asarray(grid)[np.asarray(flat),
                              np.asarray(y).astype(int) + 8]
    np.testing.assert_allclose(np.asarray(p), expect, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize('fns,ranges', [
    ('transform', (4, 4, 4)),
    ('split', (2,) * 9),   # w: 2+2, b: 2+1, a: 2 -> 9 channels
])
def test_host_coder_roundtrip(fns, ranges):
    em, params = _make(ranges, fns)
    rng = np.random.default_rng(1)
    n = 500
    idx = rng.integers(0, np.asarray(ranges), size=(n, len(ranges)))
    y = rng.integers(-8, 9, size=(n,))
    pmf = np.asarray(em.apply(params,
                              method=IndexedNoisyDeepFactorized.grid_pmf),
                     np.float64)
    coder = build_indexed_coder(pmf, -8)
    flat = np.asarray(em.apply(params, jnp.asarray(idx, jnp.float32),
                               method=IndexedNoisyDeepFactorized.flatten_indexes))
    strides = flat_index_strides(ranges)
    np.testing.assert_array_equal(flat, (idx * strides).sum(-1))
    blobs = coder.encode_with_indexes(y[None].astype(np.int32),
                                      flat[None].astype(np.int32))
    out = np.empty((1, n), np.int32)
    coder.decode_with_indexes(blobs, flat[None].astype(np.int32), out)
    np.testing.assert_array_equal(out[0], y)


def test_device_coder_roundtrip():
    """Gather quantized CDF rows from the grid table by flat index and code
    with the interleaved word coder — the TPU-resident path."""
    em, params = _make()
    rng = np.random.default_rng(2)
    lanes, n = 16, 320
    idx = rng.integers(0, 4, size=(n, 3))
    y = rng.integers(-8, 9, size=(n,))
    table = em.apply(params,
                     method=IndexedNoisyDeepFactorized.quantized_cdf_table)
    flat = em.apply(params, jnp.asarray(idx, jnp.float32),
                    method=IndexedNoisyDeepFactorized.flatten_indexes)
    rows = jnp.asarray(table)[flat]                      # [n, V]
    syms = jnp.asarray(y + 8)
    # encode pairs from rows
    s = rows.shape[-1]
    r = jnp.arange(n)
    end = jnp.where(syms == s - 1, 65536, rows[r, syms].astype(jnp.int32))
    start = jnp.where(syms == 0, 0,
                      rows[r, jnp.maximum(syms - 1, 0)].astype(jnp.int32))
    capw = ir.word_capacity_for(n, lanes)
    st, bptr, buf = ir.init_encoder(lanes, capw)
    st, bptr, buf = ir.encode_segment(
        st, bptr, buf, start.astype(jnp.uint16),
        (end - start).astype(jnp.uint16), jnp.int32(n))
    bptr, buf = ir.encode_flush(st, bptr, buf)
    ds, ptr = ir.init_decoder(buf, bptr, lanes)
    _, _, out = ir.decode_segment(ds, ptr, buf, rows, jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(out)[:n] - 8, y)


def test_training_bits_and_grads():
    em, params = _make(bottleneck_process='noise')
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    idx = jnp.asarray(rng.uniform(0, 3, size=(64, 3)).astype(np.float32))

    def loss(p, i):
        _, bits = em.apply(p, y, i, jax.random.PRNGKey(1))
        return bits

    bits = loss(params, idx)
    assert np.isfinite(float(bits)) and float(bits) > 0
    from jax.flatten_util import ravel_pytree
    g = jax.grad(loss)(params, idx)
    flat, _ = ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    gi = jax.grad(loss, argnums=1)(params, idx)
    assert np.isfinite(np.asarray(gi)).all()
    assert float(jnp.abs(gi).sum()) > 0  # indexes get gradient signal
