"""Pallas TPU kernel: logits -> quantized 16-bit CDF rows in one VMEM pass.

The XLA lowering of ``_cdf_rows`` (softmax -> floor-quantize -> cumsum ->
fixup) materializes several [N, 255] f32 intermediates in HBM (~3.6 ms at
131k x 255 on v5e); this kernel keeps the whole row pipeline in VMEM and
writes only the final uint16 table (~2x). Semantics match
models/lossl_coord/model.py::_cdf_rows (reference CDF convention:
row[s] = cumulative count through s, row[-1] = 65535 — reference:
lossl_coord/model.py:461-468).

Exactness notes (the encoder pairs and the decoder symbol search must see
IDENTICAL tables):
  * the quantized counts q are integers < 2^16 held in f32, and every
    partial cumsum stays < 2^17 < 2^24, so the triangular-matmul cumsum is
    exact in ANY accumulation order;
  * the matmul runs at Precision.HIGHEST — the TPU default computes f32
    dots in bf16 (8 mantissa bits), which would corrupt counts > 256.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 256          # rows per grid step


def _cdf_kernel(logits_ref, out_ref, *, s_valid: int, lanes: int):
    x = logits_ref[...].astype(jnp.float32)               # [R, lanes]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(lane < s_valid, x, jnp.float32(-1e30))
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    pmf = e / jnp.sum(e, axis=1, keepdims=True)
    # floor of a non-negative value via int truncation (Mosaic on this rig
    # cannot legalize tpu.truncf from jnp.floor)
    q = (pmf * jnp.float32(65536 - s_valid)).astype(jnp.int32) \
        .astype(jnp.float32) + jnp.float32(1.0)
    q = jnp.where(lane < s_valid, q, jnp.float32(0.0))
    # inclusive lane-axis cumsum by log-shift adds (integer-valued f32,
    # partial sums < 2^17 -> exact in any order; stays on the VPU — the
    # Precision.HIGHEST matmul alternative fails to legalize on this
    # Mosaic build)
    cdf = q
    k = 1
    while k < lanes:
        shifted = jnp.concatenate(
            [jnp.zeros((cdf.shape[0], k), jnp.float32), cdf[:, :-k]], axis=1)
        cdf = cdf + shifted
        k *= 2
    cdf = jnp.where(lane == s_valid - 1, jnp.float32(65535.0), cdf)
    cdf = jnp.where(lane < s_valid, cdf, jnp.float32(0.0))
    out_ref[...] = cdf.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('interpret',))
def cdf_rows_pallas(logits: jax.Array, interpret: bool = False) -> jax.Array:
    """[N, S] logits -> [N, S] uint16 quantized CDF rows (pallas TPU)."""
    n, s = logits.shape
    lanes = -(-s // 128) * 128
    if lanes != s:
        logits = jnp.pad(logits, ((0, 0), (0, lanes - s)))
    rows = min(_ROWS, n)
    assert n % rows == 0, f'row count {n} not divisible by block {rows}'
    # this repo runs with jax_enable_x64 on (int64 Morton codes), but x64
    # weak-typed literals poison Mosaic lowering (i64/f64 constants fail to
    # legalize) — trace the kernel with x64 off; f32/i32 operands are
    # unaffected by the switch
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_cdf_kernel, s_valid=s, lanes=lanes),
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, lanes), jnp.int32),
            interpret=interpret,
        )(logits)
    return out[:, :s].astype(jnp.uint16)


def _pairs_kernel(logits_ref, syms_ref, out_ref, *, s_valid: int, lanes: int):
    x = logits_ref[...].astype(jnp.float32)               # [R, lanes]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(lane < s_valid, x, jnp.float32(-1e30))
    m = jnp.max(x, axis=1, keepdims=True)
    e = jnp.exp(x - m)
    pmf = e / jnp.sum(e, axis=1, keepdims=True)
    q = (pmf * jnp.float32(65536 - s_valid)).astype(jnp.int32) \
        .astype(jnp.float32) + jnp.float32(1.0)
    q = jnp.where(lane < s_valid, q, jnp.float32(0.0))
    sym = syms_ref[...]                                    # [R, 1] int32
    sym = jnp.minimum(jnp.maximum(sym, 0), s_valid - 1)
    # start = sum_{j < sym} q_j, qs = q_sym: two masked VPU reduces instead
    # of the full cumsum (integer-valued f32 partials < 2^17 -> exact)
    start = jnp.sum(jnp.where(lane < sym, q, 0.0), axis=1, keepdims=True)
    qs = jnp.sum(jnp.where(lane == sym, q, 0.0), axis=1, keepdims=True)
    start_i = start.astype(jnp.int32)
    freq_i = jnp.where(sym == s_valid - 1,
                       jnp.int32(65536) - start_i, qs.astype(jnp.int32))
    # pack (start, freq) into one i32 lane: start<<16 | freq (freq < 2^16
    # always: start >= s_valid-1 > 0 whenever sym is the last symbol)
    out_ref[...] = (start_i << 16) | (freq_i & jnp.int32(0xffff))


@functools.partial(jax.jit, static_argnames=('interpret',))
def enc_pairs_pallas(logits: jax.Array, symbols: jax.Array,
                     interpret: bool = False):
    """[N, S] logits + [N] symbols -> (start, freq) uint16 per row.

    Bit-identical to _enc_pairs(cdf_rows_pallas(logits), symbols)
    (models/lossl_coord/model.py) but never materializes the [N, S] CDF
    table in HBM — on the encode side the table's ONLY consumer is the
    per-symbol pair selection (the word coder takes (start, freq) directly),
    so the whole softmax -> quantize -> select pipeline runs in one VMEM
    pass and writes 4 bytes per row."""
    n, s = logits.shape
    lanes = -(-s // 128) * 128
    if lanes != s:
        logits = jnp.pad(logits, ((0, 0), (0, lanes - s)))
    syms2d = symbols.astype(jnp.int32).reshape(n, 1)
    rows = min(_ROWS, n)
    assert n % rows == 0, f'row count {n} not divisible by block {rows}'
    with jax.enable_x64(False):
        packed = pl.pallas_call(
            functools.partial(_pairs_kernel, s_valid=s, lanes=lanes),
            grid=(n // rows,),
            in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
                      pl.BlockSpec((rows, 1), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, 1), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
            interpret=interpret,
        )(logits, syms2d)
    packed = packed[:, 0]
    start = ((packed >> 16) & 0xffff).astype(jnp.uint16)
    freq = (packed & 0xffff).astype(jnp.uint16)
    return start, freq
