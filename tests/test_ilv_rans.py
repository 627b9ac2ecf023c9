"""Interleaved single-stream word rANS (ops/ilv_rans.py).

Round-trip semantics mirror the reference coder self-tests
(reference: lib/entropy_models/rans_coder/__init__.py:9-103) for the
device-side format: multi-segment LIFO sessions, skewed CDFs, partial rows,
and the zero-copy loopback read straight from the encoder buffer.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fastpcc_tpu.ops import ilv_rans as ir


def _random_cdfs(rng, n, s, skew=1.0):
    """[n, s] uint16 CDF rows: row[i] = cum count through i, row[-1]=65535."""
    pmf = rng.dirichlet(np.full(s, skew), size=n)
    q = np.floor(pmf * (65536 - s)) + 1.0
    cdf = np.cumsum(q, axis=-1)
    cdf[:, -1] = 65535
    return cdf.astype(np.uint16)


def _pairs(cdfs, syms):
    """Per-symbol (start, freq) uint16 from CDF rows."""
    n, s = cdfs.shape
    rows = np.arange(n)
    c = cdfs.astype(np.int64)
    start = np.where(syms == 0, 0, c[rows, np.maximum(syms - 1, 0)])
    end = np.where(syms == s - 1, 65536, c[rows, syms])
    return start.astype(np.uint16), (end - start).astype(np.uint16)


def _roundtrip(segments, lanes, cap_words=None):
    """segments: list of (cdfs [cap, S], syms [cap], count). Returns decoded
    symbol arrays via the full host-blob path."""
    total = sum(c.shape[0] for c, _, _ in segments)
    capw = cap_words or ir.word_capacity_for(total, lanes)
    states, bptr, buf = ir.init_encoder(lanes, capw)
    for cdfs, syms, count in segments:                      # encode order 1..K
        st, fq = _pairs(cdfs, np.asarray(syms))
        states, bptr, buf = ir.encode_segment(
            states, bptr, buf, jnp.asarray(st), jnp.asarray(fq),
            jnp.int32(count))
    bptr, buf = ir.encode_flush(states, bptr, buf)
    blob = ir.stream_to_bytes(bptr, buf, lanes)

    stream, n_words, consumed = ir.bytes_to_stream(blob, capw, lanes)
    assert consumed == len(blob)
    dstates, ptr = ir.init_decoder(stream, jnp.int32(0), lanes)
    out = []
    for cdfs, _, count in reversed(segments):               # decode order K..1
        dstates, ptr, syms = ir.decode_segment(
            dstates, ptr, stream, jnp.asarray(cdfs), jnp.int32(count))
        out.append(np.asarray(syms))
    assert int(ptr) == n_words, 'decoder must consume the exact stream'
    return list(reversed(out)), len(blob)


@pytest.mark.parametrize('lanes,counts', [
    (8, [64, 64]),
    (8, [13, 1, 29]),          # partial rows, single-symbol segment
    (32, [200, 0, 77]),        # empty segment in the chain
    (128, [1000]),
])
def test_ilv_roundtrip(lanes, counts):
    rng = np.random.default_rng(0)
    s = 255
    segments = []
    for c in counts:
        cap = -(-max(c, 1) // lanes) * lanes
        cdfs = _random_cdfs(rng, cap, s)
        syms = rng.integers(0, s, size=cap).astype(np.int64)
        segments.append((cdfs, syms, c))
    outs, _ = _roundtrip(segments, lanes)
    for (cdfs, syms, c), out in zip(segments, outs):
        np.testing.assert_array_equal(out[:c], syms[:c])
        assert (out[c:] == 0).all()


def test_ilv_skewed_compresses():
    """A near-deterministic distribution must code far below 8 bits/symbol,
    and an almost-uniform one near log2(255)."""
    rng = np.random.default_rng(1)
    lanes, n, s = 64, 4096, 255
    # skewed: symbol 7 with prob ~0.99
    pmf = np.full(s, 0.01 / (s - 1))
    pmf[7] = 0.99
    q = np.floor(pmf * (65536 - s)) + 1.0
    cdf = np.cumsum(q)
    cdf[-1] = 65535
    cdfs = np.tile(cdf.astype(np.uint16), (n, 1))
    syms = np.full(n, 7, np.int64)
    syms[rng.integers(0, n, 30)] = rng.integers(0, s, 30)
    outs, nbytes = _roundtrip([(cdfs, syms, n)], lanes)
    np.testing.assert_array_equal(outs[0][:n], syms)
    overhead = 4 + 4 * lanes + 2 * lanes          # header + states + slack-ish
    assert nbytes - overhead < n * 0.5            # << 1 byte/symbol

    u_cdfs = _random_cdfs(np.random.default_rng(2), n, s, skew=100.0)
    u_syms = rng.integers(0, s, size=n).astype(np.int64)
    outs, nbytes_u = _roundtrip([(u_cdfs, u_syms, n)], lanes)
    np.testing.assert_array_equal(outs[0][:n], u_syms)
    assert nbytes_u > n * 0.9                     # ~1 byte/symbol


def test_ilv_device_loopback():
    """Decode straight from the encoder's buffer (no host flush): the decoder
    starts at the encoder's final bptr and reads forward."""
    rng = np.random.default_rng(3)
    lanes, s = 16, 17
    counts = [100, 37]
    capw = ir.word_capacity_for(sum(counts) + 2 * lanes, lanes)
    segs = []
    states, bptr, buf = ir.init_encoder(lanes, capw)
    for c in counts:
        cap = -(-c // lanes) * lanes
        cdfs = _random_cdfs(rng, cap, s)
        syms = rng.integers(0, s, size=cap).astype(np.int64)
        segs.append((cdfs, syms, c))
        st, fq = _pairs(cdfs, syms)
        states, bptr, buf = ir.encode_segment(
            states, bptr, buf, jnp.asarray(st), jnp.asarray(fq), jnp.int32(c))
    bptr, buf = ir.encode_flush(states, bptr, buf)
    dstates, ptr = ir.init_decoder(buf, bptr, lanes)
    for cdfs, syms, c in reversed(segs):
        dstates, ptr, out = ir.decode_segment(
            dstates, ptr, buf, jnp.asarray(cdfs), jnp.int32(c))
        np.testing.assert_array_equal(np.asarray(out)[:c], syms[:c])


def test_ilv_trailing_state_is_initial():
    """After a full decode every lane must return to the init state 2^16."""
    rng = np.random.default_rng(4)
    lanes, s, n = 8, 31, 96
    cdfs = _random_cdfs(rng, n, s)
    syms = rng.integers(0, s, size=n).astype(np.int64)
    capw = ir.word_capacity_for(n, lanes)
    states, bptr, buf = ir.init_encoder(lanes, capw)
    st, fq = _pairs(cdfs, syms)
    states, bptr, buf = ir.encode_segment(
        states, bptr, buf, jnp.asarray(st), jnp.asarray(fq), jnp.int32(n))
    bptr, buf = ir.encode_flush(states, bptr, buf)
    dstates, ptr = ir.init_decoder(buf, bptr, lanes)
    dstates, ptr, _ = ir.decode_segment(
        dstates, ptr, buf, jnp.asarray(cdfs), jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(dstates),
                                  np.full(lanes, 1 << 16, np.uint32))
