"""ctypes bindings for the native rANS runtime.

Public surface mirrors the reference coders:
  * ``batched_pmf_to_quantized_cdf`` (reference: cdf_ops.cpp:136-143)
  * ``IndexedRansCoder`` / ``BinaryRansCoder``
    (reference: lib/entropy_models/rans_coder/rans_wrapper.cpp:89-428)
  * streaming ``RansEncoder`` / ``RansDecoder``
    (reference: models/convolutional/lossy_coord_v3/rans_coder/simple_rans_wrapper.cpp)
"""
import ctypes
from typing import List, Optional, Sequence

import numpy as np

from .build import build_rans_lib

_i64 = ctypes.c_int64
_p = ctypes.POINTER

PROB_SCALE = 1 << 16
PRECISION = 16


def _load():
    lib = ctypes.CDLL(build_rans_lib())
    u8p, u16p, u32p = _p(ctypes.c_uint8), _p(ctypes.c_uint16), _p(ctypes.c_uint32)
    i32p, i64p, f64p = _p(ctypes.c_int32), _p(ctypes.c_int64), _p(ctypes.c_double)

    lib.fpc_pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.fpc_pmf_to_quantized_cdf.argtypes = [f64p, _i64, _i64, ctypes.c_int, i32p, u32p, i32p]
    lib.fpc_indexed_encode.restype = ctypes.c_int
    lib.fpc_indexed_encode.argtypes = [u32p, i32p, _i64, _i64, i32p, i32p, i32p,
                                       _i64, _i64, ctypes.c_int, u8p, _i64, i64p]
    lib.fpc_indexed_decode.restype = ctypes.c_int
    lib.fpc_indexed_decode.argtypes = [u32p, i32p, _i64, _i64, i32p, u8p, i64p,
                                       i32p, _i64, _i64, ctypes.c_int, i32p]
    lib.fpc_binary_encode.restype = ctypes.c_int
    lib.fpc_binary_encode.argtypes = [u8p, u32p, _i64, _i64, u8p, _i64, i64p]
    lib.fpc_binary_decode.restype = ctypes.c_int
    lib.fpc_binary_decode.argtypes = [u8p, i64p, u32p, _i64, _i64, u8p]

    lib.fpc_enc_new.restype = ctypes.c_void_p
    lib.fpc_enc_new.argtypes = [_i64]
    lib.fpc_enc_free.argtypes = [ctypes.c_void_p]
    lib.fpc_enc_put.restype = _i64
    lib.fpc_enc_put.argtypes = [ctypes.c_void_p, u16p, _i64, _i64, u16p, _i64]
    lib.fpc_enc_put_bin.restype = _i64
    lib.fpc_enc_put_bin.argtypes = [ctypes.c_void_p, u16p, _i64, u8p, _i64]
    lib.fpc_enc_put_raw.restype = _i64
    lib.fpc_enc_put_raw.argtypes = [ctypes.c_void_p, u16p, u16p, _i64]
    lib.fpc_enc_size.restype = _i64
    lib.fpc_enc_size.argtypes = [ctypes.c_void_p]
    lib.fpc_enc_flush.restype = _i64
    lib.fpc_enc_flush.argtypes = [ctypes.c_void_p, u8p]

    lib.fpc_dec_new.restype = ctypes.c_void_p
    lib.fpc_dec_free.argtypes = [ctypes.c_void_p]
    lib.fpc_dec_init.restype = ctypes.c_int
    lib.fpc_dec_init.argtypes = [ctypes.c_void_p, u8p, _i64]
    lib.fpc_dec_get.restype = ctypes.c_int
    lib.fpc_dec_get.argtypes = [ctypes.c_void_p, u16p, _i64, _i64, u16p, _i64]
    lib.fpc_dec_get_bin.restype = ctypes.c_int
    lib.fpc_dec_get_bin.argtypes = [ctypes.c_void_p, u16p, _i64, u8p, _i64]
    return lib


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        _LIB = _load()
    return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(_p(ctype))


def batched_pmf_to_quantized_cdf(pmfs: np.ndarray, offsets: np.ndarray,
                                 overflow_coding: bool) -> List[List[int]]:
    """Quantize [B, S] float64 pmfs to 16-bit integer CDFs. Mutates offsets
    in place when overflow trimming shifts them (reference: cdf_ops.cpp:50)."""
    pmfs = np.ascontiguousarray(pmfs, dtype=np.float64)
    assert pmfs.ndim == 2
    assert offsets.dtype == np.int32 and offsets.shape == (pmfs.shape[0],)
    n, s = pmfs.shape
    cdfs = np.zeros((n, s + 2), dtype=np.uint32)
    sizes = np.zeros((n,), dtype=np.int32)
    rc = _lib().fpc_pmf_to_quantized_cdf(
        _ptr(pmfs, ctypes.c_double), n, s, int(overflow_coding),
        _ptr(offsets, ctypes.c_int32), _ptr(cdfs, ctypes.c_uint32),
        _ptr(sizes, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError('pmf_to_quantized_cdf failed (unrepairable pmf)')
    return [cdfs[i, :sizes[i]].tolist() for i in range(n)]


class IndexedRansCoder:
    """Batch coder with per-symbol CDF selection and Exp-Golomb overflow
    bypass (reference: rans_wrapper.cpp:89-300)."""

    def __init__(self, overflow_coding: bool, batch_size: int,
                 enc_buf_size: int = 8 * 1024 * 1024):
        self.overflow_coding = overflow_coding
        self.batch_size = batch_size
        self.enc_buf_size = enc_buf_size
        self._cdfs_flat: Optional[np.ndarray] = None
        self._cdf_sizes: Optional[np.ndarray] = None
        self._offsets: Optional[np.ndarray] = None
        self._cdfs_list: List[List[int]] = []

    def init_with_pmfs(self, pmfs: np.ndarray, offsets: np.ndarray) -> int:
        offsets = np.ascontiguousarray(offsets, dtype=np.int32)
        cdfs = batched_pmf_to_quantized_cdf(pmfs, offsets, self.overflow_coding)
        return self.init_with_quantized_cdfs(cdfs, offsets)

    def init_with_quantized_cdfs(self, cdfs: Sequence[Sequence[int]],
                                 offsets: np.ndarray) -> int:
        self._cdfs_list = [list(c) for c in cdfs]
        max_len = max(len(c) for c in cdfs)
        flat = np.zeros((len(cdfs), max_len), dtype=np.uint32)
        sizes = np.zeros((len(cdfs),), dtype=np.int32)
        for i, c in enumerate(cdfs):
            flat[i, :len(c)] = c
            sizes[i] = len(c)
        self._cdfs_flat, self._cdf_sizes = flat, sizes
        self._offsets = np.ascontiguousarray(offsets, dtype=np.int32)
        return 0

    def get_cdfs(self) -> List[List[int]]:
        return self._cdfs_list

    def get_offset_array(self) -> np.ndarray:
        return self._offsets

    def _encode(self, symbols: np.ndarray, indexes: Optional[np.ndarray]) -> List[bytes]:
        symbols = np.ascontiguousarray(symbols, dtype=np.int32)
        assert symbols.ndim == 2 and symbols.shape[0] == self.batch_size
        n_sym = symbols.shape[1]
        unit = max(8 * n_sym + 1024, 4096)
        out = np.empty((self.batch_size, unit), dtype=np.uint8)
        sizes = np.zeros((self.batch_size,), dtype=np.int64)
        idx_ptr = None
        if indexes is not None:
            indexes = np.ascontiguousarray(indexes, dtype=np.int32)
            assert indexes.shape == symbols.shape
            idx_ptr = _ptr(indexes, ctypes.c_int32)
        rc = _lib().fpc_indexed_encode(
            _ptr(self._cdfs_flat, ctypes.c_uint32), _ptr(self._cdf_sizes, ctypes.c_int32),
            self._cdfs_flat.shape[0], self._cdfs_flat.shape[1],
            _ptr(self._offsets, ctypes.c_int32),
            _ptr(symbols, ctypes.c_int32), idx_ptr,
            self.batch_size, n_sym, int(self.overflow_coding),
            _ptr(out, ctypes.c_uint8), unit, _ptr(sizes, ctypes.c_int64))
        if rc != 0:
            raise RuntimeError('rANS encode buffer overflow')
        return [out[b, unit - sizes[b]:].tobytes() for b in range(self.batch_size)]

    def _decode(self, encoded_list: Sequence[bytes], indexes: Optional[np.ndarray],
                symbols_out: np.ndarray) -> int:
        assert len(encoded_list) == self.batch_size
        assert symbols_out.ndim == 2 and symbols_out.dtype == np.int32
        n_sym = symbols_out.shape[1]
        offsets = np.zeros((self.batch_size,), dtype=np.int64)
        pos = 0
        for i, s in enumerate(encoded_list):
            offsets[i] = pos
            pos += len(s)
        blob = np.frombuffer(b''.join(encoded_list), dtype=np.uint8)
        idx_ptr = None
        if indexes is not None:
            indexes = np.ascontiguousarray(indexes, dtype=np.int32)
            idx_ptr = _ptr(indexes, ctypes.c_int32)
        return _lib().fpc_indexed_decode(
            _ptr(self._cdfs_flat, ctypes.c_uint32), _ptr(self._cdf_sizes, ctypes.c_int32),
            self._cdfs_flat.shape[0], self._cdfs_flat.shape[1],
            _ptr(self._offsets, ctypes.c_int32),
            _ptr(blob, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64), idx_ptr,
            self.batch_size, n_sym, int(self.overflow_coding),
            _ptr(symbols_out, ctypes.c_int32))

    def encode(self, symbols: np.ndarray) -> List[bytes]:
        return self._encode(symbols, None)

    def encode_with_indexes(self, symbols: np.ndarray, indexes: np.ndarray) -> List[bytes]:
        return self._encode(symbols, indexes)

    def decode(self, encoded_list: Sequence[bytes], symbols_out: np.ndarray) -> int:
        return self._decode(encoded_list, None, symbols_out)

    def decode_with_indexes(self, encoded_list: Sequence[bytes], indexes: np.ndarray,
                            symbols_out: np.ndarray) -> int:
        return self._decode(encoded_list, indexes, symbols_out)


class BinaryRansCoder:
    """Per-symbol-probability binary coder (reference: rans_wrapper.cpp:302-428).
    probs are uint32 P(symbol=1) scaled to 1<<16, clipped to [1, 65535]."""

    def __init__(self, batch_size: int, enc_buf_size: int = 8 * 1024 * 1024):
        self.batch_size = batch_size

    def encode(self, symbols: np.ndarray, probs: np.ndarray) -> List[bytes]:
        symbols = np.ascontiguousarray(symbols, dtype=np.uint8)
        probs = np.ascontiguousarray(probs, dtype=np.uint32)
        assert symbols.shape == probs.shape and symbols.ndim == 2
        b, n = symbols.shape
        unit = max(n // 2 + 1024, 4096)
        out = np.empty((b, unit), dtype=np.uint8)
        sizes = np.zeros((b,), dtype=np.int64)
        rc = _lib().fpc_binary_encode(
            _ptr(symbols, ctypes.c_uint8), _ptr(probs, ctypes.c_uint32), b, n,
            _ptr(out, ctypes.c_uint8), unit, _ptr(sizes, ctypes.c_int64))
        if rc != 0:
            raise RuntimeError('binary rANS encode buffer overflow')
        return [out[i, unit - sizes[i]:].tobytes() for i in range(b)]

    def decode(self, encoded_list: Sequence[bytes], probs: np.ndarray,
               symbols_out: np.ndarray) -> int:
        probs = np.ascontiguousarray(probs, dtype=np.uint32)
        assert symbols_out.dtype == np.bool_ or symbols_out.dtype == np.uint8
        b, n = probs.shape
        offsets = np.zeros((b,), dtype=np.int64)
        pos = 0
        for i, s in enumerate(encoded_list):
            offsets[i] = pos
            pos += len(s)
        blob = np.frombuffer(b''.join(encoded_list), dtype=np.uint8)
        view = symbols_out.view(np.uint8)
        return _lib().fpc_binary_decode(
            _ptr(blob, ctypes.c_uint8), _ptr(offsets, ctypes.c_int64),
            _ptr(probs, ctypes.c_uint32), b, n, _ptr(view, ctypes.c_uint8))


class RansEncoder:
    """Streaming LIFO encoder: many encode() calls share one rANS state;
    flush() emits the stream and resets (reference: simple_rans_wrapper.cpp:5-134).
    Calls decode in reverse call order; symbols within a call decode forward."""

    def __init__(self, enc_buf_size: int = 32 * 1024 * 1024):
        self._h = _lib().fpc_enc_new(enc_buf_size)

    def __del__(self):
        if getattr(self, '_h', None):
            _lib().fpc_enc_free(self._h)
            self._h = None

    def encode(self, cdf_arr: np.ndarray, symbol_arr: np.ndarray) -> int:
        """cdf_arr: [n_cdfs, max_sym] uint16 CDF rows (cumulative counts, last
        element 65535-sentinel convention); symbol_arr: [n] uint16."""
        cdf_arr = np.ascontiguousarray(cdf_arr, dtype=np.uint16)
        symbol_arr = np.ascontiguousarray(symbol_arr, dtype=np.uint16)
        assert cdf_arr.ndim == 2
        n_cdfs, max_sym = cdf_arr.shape
        n_sym = symbol_arr.shape[0]
        assert n_sym == n_cdfs or n_cdfs == 1
        return _lib().fpc_enc_put(
            self._h, _ptr(cdf_arr, ctypes.c_uint16), n_cdfs, max_sym,
            _ptr(symbol_arr, ctypes.c_uint16), n_sym)

    def encode_raw(self, starts: np.ndarray, freqs_minus_1: np.ndarray) -> int:
        """Encode with pre-gathered per-symbol (start, freq-1) uint16 pairs;
        bitstream-identical to encode() with the CDFs the pairs came from."""
        starts = np.ascontiguousarray(starts, dtype=np.uint16)
        freqs_minus_1 = np.ascontiguousarray(freqs_minus_1, dtype=np.uint16)
        assert starts.shape == freqs_minus_1.shape and starts.ndim == 1
        return _lib().fpc_enc_put_raw(
            self._h, _ptr(starts, ctypes.c_uint16),
            _ptr(freqs_minus_1, ctypes.c_uint16), starts.shape[0])

    def encode_bin(self, cdf_arr: np.ndarray, symbol_arr: np.ndarray) -> int:
        cdf_arr = np.ascontiguousarray(cdf_arr, dtype=np.uint16).reshape(-1)
        symbol_arr = np.ascontiguousarray(symbol_arr, dtype=np.uint8)
        n_cdfs = cdf_arr.shape[0]
        n_sym = symbol_arr.shape[0]
        assert n_sym == n_cdfs or n_cdfs == 1
        return _lib().fpc_enc_put_bin(
            self._h, _ptr(cdf_arr, ctypes.c_uint16), n_cdfs,
            _ptr(symbol_arr, ctypes.c_uint8), n_sym)

    def flush(self) -> bytes:
        size_guess = _lib().fpc_enc_size(self._h) + 8  # + flushed state bytes
        out = np.empty((size_guess,), dtype=np.uint8)
        size = _lib().fpc_enc_flush(self._h, _ptr(out, ctypes.c_uint8))
        return out[:size].tobytes()


class RansDecoder:
    """Streaming decoder mirroring RansEncoder (reference: simple_rans_wrapper.cpp:136-270)."""

    def __init__(self):
        self._h = _lib().fpc_dec_new()

    def __del__(self):
        if getattr(self, '_h', None):
            _lib().fpc_dec_free(self._h)
            self._h = None

    def flush(self, encoded: bytes) -> int:
        arr = np.frombuffer(encoded, dtype=np.uint8)
        return _lib().fpc_dec_init(self._h, _ptr(arr, ctypes.c_uint8), arr.shape[0])

    def decode(self, cdf_arr: np.ndarray, symbol_out: np.ndarray) -> int:
        cdf_arr = np.ascontiguousarray(cdf_arr, dtype=np.uint16)
        assert cdf_arr.ndim == 2
        assert symbol_out.dtype == np.uint16
        n_cdfs, max_sym = cdf_arr.shape
        n_sym = symbol_out.shape[0]
        assert n_sym == n_cdfs or n_cdfs == 1
        return _lib().fpc_dec_get(
            self._h, _ptr(cdf_arr, ctypes.c_uint16), n_cdfs, max_sym,
            _ptr(symbol_out, ctypes.c_uint16), n_sym)

    def decode_bin(self, cdf_arr: np.ndarray, symbol_out: np.ndarray) -> int:
        cdf_arr = np.ascontiguousarray(cdf_arr, dtype=np.uint16).reshape(-1)
        n_cdfs = cdf_arr.shape[0]
        n_sym = symbol_out.shape[0]
        view = symbol_out.view(np.uint8)
        return _lib().fpc_dec_get_bin(
            self._h, _ptr(cdf_arr, ctypes.c_uint16), n_cdfs,
            _ptr(view, ctypes.c_uint8), n_sym)
