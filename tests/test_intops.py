"""Integer-op determinism tests: int8 GEMM exactness, requant rounding,
integer softmax CDF validity + cross-call determinism."""
import numpy as np
import jax
import jax.numpy as jnp

from fastpcc_tpu.ops.intops import (
    int8_matmul, requant, int_softmax_cdf, make_exp_lut, prelu_int,
    quantize_scale_to_mul_shift)


def test_int8_matmul_exact():
    rng = np.random.default_rng(0)
    a = rng.integers(-128, 128, (64, 32)).astype(np.int8)
    w = rng.integers(-128, 128, (32, 16)).astype(np.int8)
    out = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(w)))
    expected = a.astype(np.int64) @ w.astype(np.int64)
    np.testing.assert_array_equal(out, expected)


def test_requant_rounding():
    acc = jnp.asarray([100, -100, 255, 256, -257], jnp.int32)
    out = np.asarray(requant(acc, jnp.int32(1), jnp.int32(8)))
    # (x + 128) >> 8 with arithmetic (floor) shift
    np.testing.assert_array_equal(out, [0, 0, 1, 1, -1])


def test_requant_clamps():
    acc = jnp.asarray([1 << 20, -(1 << 20)], jnp.int32)
    out = np.asarray(requant(acc, jnp.int32(1 << 10), jnp.int32(2)))
    np.testing.assert_array_equal(out, [127, -128])


def test_mul_shift_roundtrip():
    for scale in (0.5, 0.001, 1.7, 3e-5):
        mul, shift = quantize_scale_to_mul_shift(scale)
        approx = mul / (1 << shift)
        assert abs(approx - scale) / scale < 1e-6


def test_exp_lut_values():
    lut = make_exp_lut()
    assert lut[0] == 65536
    assert lut[512] == round(np.exp(-1) * 65536)
    assert lut[-1] == round(np.exp(-12) * 65536)


def test_int_softmax_cdf_valid_and_deterministic():
    rng = np.random.default_rng(1)
    logits = (rng.normal(size=(40, 255)) * (3 << 16)).astype(np.int32)
    cdf1 = np.asarray(int_softmax_cdf(jnp.asarray(logits)))
    cdf2 = np.asarray(int_softmax_cdf(jnp.asarray(logits)))
    np.testing.assert_array_equal(cdf1, cdf2)
    as32 = cdf1.astype(np.int64)
    # strictly monotone rows ending at 65535 (every symbol freq >= 1
    # under the streaming-coder convention where end(last) = 65536)
    assert (np.diff(as32, axis=1) >= 1).all()
    assert (as32[:, -1] == 65535).all()
    assert (as32[:, 0] >= 1).all()
    # matches float softmax shape: argmax symbol has the largest frequency
    freqs = np.diff(np.concatenate([np.zeros((40, 1), np.int64), as32], 1), axis=1)
    np.testing.assert_array_equal(freqs.argmax(1)[:5],
                                  logits.argmax(1)[:5])


def test_int_softmax_roundtrip_with_rans():
    """Integer CDFs drive the streaming coder losslessly."""
    from fastpcc_tpu.runtime import RansEncoder, RansDecoder
    rng = np.random.default_rng(2)
    logits = (rng.normal(size=(200, 255)) * (2 << 16)).astype(np.int32)
    cdf = np.asarray(int_softmax_cdf(jnp.asarray(logits)))
    syms = rng.integers(0, 255, (200,)).astype(np.uint16)
    enc = RansEncoder(1 << 20)
    enc.encode(cdf, syms)
    blob = enc.flush()
    dec = RansDecoder()
    dec.flush(blob)
    out = np.empty((200,), np.uint16)
    dec.decode(cdf, out)
    np.testing.assert_array_equal(out, syms)


def test_prelu_int():
    x = jnp.asarray([100, -100, 0, -32768], jnp.int32)
    alpha = jnp.int32(8192)  # 0.25 in Q15
    out = np.asarray(prelu_int(x, alpha))
    np.testing.assert_array_equal(out, [100, -25, 0, -8192])
