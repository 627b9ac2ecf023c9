"""Device lane-rANS tests: multi-segment LIFO round trips with masked
partial rows, skewed CDFs, and determinism."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpcc_tpu.ops.device_rans import (
    init_lane_state, lane_encode_segment, lane_decode_segment,
    lane_flush_to_bytes, lane_bytes_to_state)


def _pairs_from_cdfs(cdfs: np.ndarray, syms: np.ndarray):
    """Host mirror of the (start, freq-1) gather."""
    n, s = cdfs.shape
    start = np.where(syms == 0, 0, cdfs[np.arange(n), np.maximum(syms - 1, 0)])
    end = np.where(syms == s - 1, 65536,
                   cdfs[np.arange(n), syms].astype(np.int64))
    return start.astype(np.uint16), (end - start - 1).astype(np.uint16)


def _random_cdfs(rng, n, s):
    pmf = rng.random((n, s)) + 0.01
    pmf /= pmf.sum(1, keepdims=True)
    q = np.floor(pmf * (65536 - s)) + 1
    cdf = np.cumsum(q, axis=1)
    cdf[:, -1] = 65535
    return cdf.astype(np.uint16)


@pytest.mark.parametrize('lanes,counts', [
    (8, [100]),               # single segment, partial rows
    (8, [64, 37, 200]),       # multi-segment session
    (16, [5]),                # fewer symbols than lanes
])
def test_lane_rans_roundtrip(lanes, counts):
    rng = np.random.default_rng(0)
    cap = 256
    segs = []
    for i, m in enumerate(counts):
        cdfs = _random_cdfs(rng, cap, 16)
        syms = rng.integers(0, 16, (cap,)).astype(np.int32)
        segs.append((cdfs, syms, m))

    states, pos, buf = init_lane_state(lanes, 1 << 12)
    # encode in reverse decode order (LIFO across segments)
    for cdfs, syms, m in reversed(segs):
        st, fq = _pairs_from_cdfs(cdfs, syms)
        states, pos, buf = lane_encode_segment(
            states, pos, buf, jnp.asarray(st), jnp.asarray(fq), jnp.int32(m))
    blob = lane_flush_to_bytes(states, pos, buf)

    states, pos, dbuf, consumed = lane_bytes_to_state(blob, lanes, 1 << 12)
    assert consumed == len(blob)
    for cdfs, syms, m in segs:
        states, pos, out = lane_decode_segment(
            states, pos, dbuf, jnp.asarray(cdfs), jnp.int32(m))
        np.testing.assert_array_equal(np.asarray(out)[:m], syms[:m])


def test_lane_rans_skewed_and_escape_symbols():
    rng = np.random.default_rng(1)
    lanes, cap = 8, 128
    # extremely skewed: symbol 0 has freq 1
    cdf = np.zeros((cap, 4), np.uint16)
    cdf[:] = np.array([1, 2, 3, 65535], np.uint16)
    syms = rng.integers(0, 4, (cap,)).astype(np.int32)
    st, fq = _pairs_from_cdfs(cdf, syms)
    states, pos, buf = init_lane_state(lanes, 1 << 12)
    states, pos, buf = lane_encode_segment(
        states, pos, buf, jnp.asarray(st), jnp.asarray(fq), jnp.int32(cap))
    blob = lane_flush_to_bytes(states, pos, buf)
    states, pos, dbuf, _ = lane_bytes_to_state(blob, lanes, 1 << 12)
    _, _, out = lane_decode_segment(states, pos, dbuf, jnp.asarray(cdf),
                                    jnp.int32(cap))
    np.testing.assert_array_equal(np.asarray(out), syms)


def test_lane_rans_compression_ratio():
    """Low-entropy data must compress well below 1 byte/symbol."""
    rng = np.random.default_rng(2)
    lanes, cap = 16, 4096
    cdf = np.zeros((cap, 4), np.uint16)
    cdf[:] = np.array([60000, 62000, 64000, 65535], np.uint16)
    syms = (rng.random(cap) > 0.92).astype(np.int32)  # mostly symbol 0
    st, fq = _pairs_from_cdfs(cdf, syms)
    states, pos, buf = init_lane_state(lanes, 1 << 12)
    states, pos, buf = lane_encode_segment(
        states, pos, buf, jnp.asarray(st), jnp.asarray(fq), jnp.int32(cap))
    blob = lane_flush_to_bytes(states, pos, buf)
    # overhead: 2B length + 4B state per lane
    payload = len(blob) - lanes * 6
    assert payload < cap * 0.2
    states, pos, dbuf, _ = lane_bytes_to_state(blob, lanes, 1 << 12)
    _, _, out = lane_decode_segment(states, pos, dbuf, jnp.asarray(cdf),
                                    jnp.int32(cap))
    np.testing.assert_array_equal(np.asarray(out), syms)
