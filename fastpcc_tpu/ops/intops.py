"""Integer-only compute primitives for cross-platform-deterministic decode.

TPU-native counterpart of the reference's int_sparse_conv CUDA stack
(reference: lib/int_sparse_conv/src/: CUTLASS int8 GEMMs gemm.cu:12-60,
fixed-point requant requant.cu:7-27, integer softmax with an exp LUT
softmax.cu:5-145). Float nondeterminism across platforms is why that stack
exists; on TPU int8 matmuls run natively on the MXU, so the same guarantee
costs one dtype change plus these fixed-point helpers.

Scheme (documented, self-consistent — bitstreams from this path decode
identically on any backend):
  * activations int8 (symmetric per-tensor scale), weights int8 symmetric,
    accumulation int32 (``int8_matmul``),
  * requantization out = (acc * mul + round) >> shift  (``requant``),
  * 255-way integer softmax -> 16-bit CDF rows via a 6145-entry Q16 exp LUT
    over [-12, 0] in 1/512 steps (``int_softmax_cdf``), mirroring the
    reference's LUT resolution (softmax.cu:5).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

EXP_LUT_SIZE = 6145          # [-12, 0] at 1/512 steps
FXP_SHIFT = 16               # Q16 logits


def make_exp_lut() -> np.ndarray:
    """LUT[i] = round(exp(-i/512) * 2^16), uint32 (LUT[0] = 65536)."""
    idx = np.arange(EXP_LUT_SIZE, dtype=np.float64)
    return np.round(np.exp(-idx / 512.0) * 65536.0).astype(np.uint32)


_EXP_LUT_NP = make_exp_lut().astype(np.int32)


def exp_lut() -> jnp.ndarray:
    # constant-folded under jit; a module-level jnp array would leak tracers
    return jnp.asarray(_EXP_LUT_NP)


def int8_matmul(a: jax.Array, w: jax.Array) -> jax.Array:
    """[N, K] int8 x [K, M] int8 -> [N, M] int32 (MXU-native on TPU)."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def requant(acc: jax.Array, mul: jax.Array, shift: jax.Array,
            out_dtype=jnp.int8) -> jax.Array:
    """Rounded fixed-point rescale: (acc * mul + 2^(shift-1)) >> shift,
    clamped to the output dtype (reference: requant.cu:7-27 semantics)."""
    prod = acc.astype(jnp.int64) * mul.astype(jnp.int64)
    sh = shift.astype(jnp.int64)
    half = jnp.where(sh > 0, jnp.int64(1) << jnp.maximum(sh - 1, 0),
                     jnp.int64(0))
    rounded = (prod + half) >> sh
    info = jnp.iinfo(out_dtype)
    return jnp.clip(rounded, info.min, info.max).astype(out_dtype)


def quantize_scale_to_mul_shift(scale: float, max_shift: int = 46):
    """Represent a float multiplier as (int32 mul, shift): mul in
    [2^30, 2^31) for full precision (requant accumulates in int64)."""
    if scale <= 0:
        return 0, 0
    shift = 0
    while scale * (1 << shift) < (1 << 30) and shift < max_shift:
        shift += 1
    mul = min(int(round(scale * (1 << shift))), (1 << 31) - 1)
    return mul, shift


@jax.jit
def int_softmax_cdf(logits_q16: jax.Array) -> jax.Array:
    """Integer softmax -> uint16 CDF rows (streaming-coder convention:
    cumulative counts, last entry 65535). logits_q16: [N, S] int32 in Q16.

    Every operation is integer; identical results on any XLA backend."""
    s = logits_q16.shape[-1]
    m = logits_q16.max(axis=-1, keepdims=True)
    d = jnp.clip(logits_q16 - m, -(12 << FXP_SHIFT), 0)
    idx = (-d) >> 7                                    # Q16 -> 1/512 steps
    e = exp_lut()[idx]                                 # [N, S] int32 Q16
    total = e.sum(axis=-1, keepdims=True).astype(jnp.int64)
    q = (e.astype(jnp.int64) * (65536 - s)) // total + 1
    cdf = jnp.cumsum(q, axis=-1)
    cdf = cdf.at[..., -1].set(65535)
    return cdf.astype(jnp.uint16)


def prelu_int(x: jax.Array, alpha_q15: jax.Array) -> jax.Array:
    """Integer PReLU on int32: negative branch = (x * alpha) >> 15 with
    round-to-nearest (reference: element_wise/prelu semantics)."""
    neg = (x.astype(jnp.int64) * alpha_q15.astype(jnp.int64) + (1 << 14)) >> 15
    return jnp.where(x >= 0, x, neg.astype(jnp.int32))
