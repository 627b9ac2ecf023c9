"""rANS coder tests — ports the reference's import-time self-tests
(reference: lib/entropy_models/rans_coder/__init__.py:9-103 and
models/convolutional/lossy_coord_v3/rans_coder/__init__.py:8-72) as pytest,
plus randomized round-trips and CDF-quantization invariants."""
import numpy as np
import pytest

from fastpcc_tpu.runtime import (
    batched_pmf_to_quantized_cdf, IndexedRansCoder, BinaryRansCoder,
    RansEncoder, RansDecoder,
)


def _roundtrip(coder, symbols, indexes=None):
    symbols = np.array(symbols, dtype=np.int32)
    decoded = np.empty_like(symbols)
    if indexes is not None:
        indexes = np.array(indexes, dtype=np.int32)
        enc = coder.encode_with_indexes(symbols, indexes)
        coder.decode_with_indexes(enc, indexes, decoded)
    else:
        enc = coder.encode(symbols)
        coder.decode(enc, decoded)
    np.testing.assert_array_equal(symbols, decoded)
    return enc


def test_indexed_overflow_roundtrip():
    np.random.seed(0)
    coder = IndexedRansCoder(True, 2, 100)
    pmfs = np.random.rand(3, 4).astype(np.float64) / 4
    offsets = np.array([-2, -2, -2], dtype=np.int32)
    coder.init_with_pmfs(pmfs, offsets)
    _roundtrip(coder, [[-2049, -2049], [2049, 2049]], [[0, 1], [2, 1]])
    _roundtrip(coder, [[-2, -1], [0, 10]], [[0, 1], [2, 1]])


def test_indexed_init_with_quantized_cdfs():
    np.random.seed(1)
    coder = IndexedRansCoder(True, 2, 100)
    pmfs = np.random.rand(3, 4).astype(np.float64) / 4
    offsets = np.array([-2, -2, -2], dtype=np.int32)
    cdfs = batched_pmf_to_quantized_cdf(pmfs, offsets, True)
    coder.init_with_quantized_cdfs(cdfs, offsets)
    _roundtrip(coder, [[-2049, -2049], [2049, 2049]], [[0, 1], [2, 1]])
    _roundtrip(coder, [[-2, -1], [0, 10]], [[0, 1], [2, 1]])


def test_degenerate_pmfs_match_reference():
    """Exact CDF/offset values asserted by the reference self-test
    (reference: rans_coder/__init__.py:72-77)."""
    coder = IndexedRansCoder(True, 2, 100)
    pmfs = np.array([[0, 0, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1],
                     [2 ** -17, 1, 0, 0]], dtype=np.float64)
    offsets = np.array([0] * 4, dtype=np.int32)
    coder.init_with_pmfs(pmfs, offsets)
    cdfs = coder.get_cdfs()
    assert cdfs == [[0, 1, 65536]] + [[0, 65535, 65536]] * 3
    np.testing.assert_array_equal(coder.get_offset_array(),
                                  np.array([4, 0, 3, 1], np.int32))
    _roundtrip(coder, [[-2, -1], [0, 10]], [[0, 1], [2, 2]])


def test_degenerate_pmfs_batch8():
    coder = IndexedRansCoder(True, 8, 100)
    pmfs = np.array([[0, 0, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1],
                     [2 ** -17, 1, 0, 0]], dtype=np.float64)
    offsets = np.array([0] * 4, dtype=np.int32)
    coder.init_with_pmfs(pmfs, offsets)
    _roundtrip(coder, [[0], [1], [0], [1], [0], [1], [3], [3]],
               [[0], [0], [1], [1], [2], [2], [3], [3]])


def test_no_overflow_mode():
    coder = IndexedRansCoder(False, 4, 100)
    pmfs = np.array([[0, 0, 1], [1, 1, 2]], dtype=np.float64)
    offsets = np.array([0, 0], dtype=np.int32)
    coder.init_with_pmfs(pmfs, offsets)
    _roundtrip(coder, [[0, 1, 1, 0]] * 4)  # index defaults to j % n_cdfs


def test_binary_coder_roundtrip():
    np.random.seed(0)
    coder = BinaryRansCoder(2, 100)
    symbols = np.random.randint(0, 2, (2, 100)).astype(np.bool_)
    probs = np.clip(np.round(np.random.rand(2, 100) * (1 << 16)),
                    1, (1 << 16) - 1).astype(np.uint32)
    enc = coder.encode(symbols, probs)
    decoded = np.empty_like(symbols)
    coder.decode(enc, probs, decoded)
    np.testing.assert_array_equal(symbols, decoded)


def test_indexed_large_random():
    np.random.seed(7)
    n_cdfs, n_sym, batch = 16, 5000, 3
    pmfs = np.random.rand(n_cdfs, 8).astype(np.float64)
    pmfs /= pmfs.sum(1, keepdims=True) * 1.01  # leave some overflow mass
    offsets = np.full((n_cdfs,), -3, dtype=np.int32)
    coder = IndexedRansCoder(True, batch)
    coder.init_with_pmfs(pmfs, offsets)
    symbols = np.random.randint(-3, 5, (batch, n_sym)).astype(np.int32)
    symbols[0, :10] = [-300, 300, -3, 4, 1000, -1000, 0, 7, -5, 12]
    indexes = np.random.randint(0, n_cdfs, (batch, n_sym)).astype(np.int32)
    _roundtrip(coder, symbols, indexes)


def test_streaming_lifo_ordering():
    """LIFO across calls, forward within a call
    (reference: lossy_coord_v3/rans_coder/__init__.py:42-63)."""
    enc = RansEncoder(1 << 20)
    # cdf rows: uniform over 4 symbols -> cumulative counts scaled by 16384
    cdf4 = (np.arange(1, 5, dtype=np.uint16) * 16384)
    cdf4[-1] = 65535
    cdf4 = cdf4[None].repeat(6, 0)
    syms_a = np.array([0, 1, 2, 3, 2, 1], dtype=np.uint16)
    syms_b = np.array([3, 3, 0, 0, 1, 2], dtype=np.uint16)
    enc.encode(cdf4, syms_a)
    enc.encode(cdf4, syms_b)
    blob = enc.flush()
    dec = RansDecoder()
    dec.flush(blob)
    out_b = np.empty((6,), dtype=np.uint16)
    out_a = np.empty((6,), dtype=np.uint16)
    dec.decode(cdf4, out_b)  # last encoded, first decoded
    dec.decode(cdf4, out_a)
    np.testing.assert_array_equal(out_b, syms_b)
    np.testing.assert_array_equal(out_a, syms_a)


def test_streaming_single_row_broadcast_and_bin():
    np.random.seed(3)
    enc = RansEncoder(1 << 20)
    cdf = np.array([[10000, 30000, 50000, 65535]], dtype=np.uint16)
    syms = np.random.randint(0, 4, (1000,)).astype(np.uint16)
    enc.encode(cdf, syms)
    thresholds = np.random.randint(1, 65535, (500,)).astype(np.uint16)
    bits = np.random.randint(0, 2, (500,)).astype(np.uint8)
    enc.encode_bin(thresholds, bits)
    blob = enc.flush()

    dec = RansDecoder()
    dec.flush(blob)
    out_bits = np.empty((500,), dtype=np.uint8)
    dec.decode_bin(thresholds, out_bits)
    np.testing.assert_array_equal(out_bits, bits)
    out_syms = np.empty((1000,), dtype=np.uint16)
    dec.decode(cdf, out_syms)
    np.testing.assert_array_equal(out_syms, syms)


def test_streaming_encoder_reuse_after_flush():
    enc = RansEncoder(1 << 16)
    cdf = np.array([[32768, 65535]], dtype=np.uint16)
    s1 = np.array([0, 1, 1, 0], dtype=np.uint16)
    enc.encode(cdf, s1)
    b1 = enc.flush()
    s2 = np.array([1, 1, 0, 1], dtype=np.uint16)
    enc.encode(cdf, s2)
    b2 = enc.flush()
    dec = RansDecoder()
    out = np.empty((4,), dtype=np.uint16)
    dec.flush(b1)
    dec.decode(cdf, out)
    np.testing.assert_array_equal(out, s1)
    dec.flush(b2)
    dec.decode(cdf, out)
    np.testing.assert_array_equal(out, s2)


def test_streaming_buffer_growth():
    enc = RansEncoder(64)  # tiny initial buffer; must grow transparently
    cdf = np.array([[1, 2, 65535]], dtype=np.uint16)  # skewed -> low compression of sym 2
    syms = np.full((100000,), 0, dtype=np.uint16)  # p(0)=1/65536 -> expands
    enc.encode(cdf, syms)
    blob = enc.flush()
    assert len(blob) > 64
    dec = RansDecoder()
    dec.flush(blob)
    out = np.empty_like(syms)
    dec.decode(cdf, out)
    np.testing.assert_array_equal(out, syms)


def test_cdf_quantization_invariants():
    np.random.seed(11)
    pmfs = np.random.rand(32, 64).astype(np.float64)
    pmfs /= pmfs.sum(1, keepdims=True)
    offsets = np.zeros((32,), dtype=np.int32)
    cdfs = batched_pmf_to_quantized_cdf(pmfs, offsets, True)
    for cdf in cdfs:
        assert cdf[0] == 0 and cdf[-1] == 65536
        diffs = np.diff(cdf)
        assert (diffs > 0).all()  # every symbol has nonzero frequency
