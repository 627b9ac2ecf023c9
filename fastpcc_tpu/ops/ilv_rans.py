"""Interleaved single-stream word rANS on device (pure XLA / Pallas-ready).

Round-2 redesign of the lane coder (see PERFNOTES.md): round 1's per-lane
byte streams required a data-dependent 2-D gather ``buf[lane, pos[lane]]``
inside the decode loop, which XLA executed pathologically (~4s/segment) when
composed into the whole-frame decode program. This format eliminates every
gather/scatter from the loop body:

  * L lanes (default 1024) of 32-bit rANS states advance in lockstep, with
    16-bit renormalization: each symbol reads/writes AT MOST ONE uint16 word
    (state in [2^16, 2^32), PRECISION=16 probabilities).
  * All lanes share ONE word stream, interleaved in decoder read order: at
    each decode row, the lanes that renormalize read the next k words in
    ascending lane order. The encoder (running LIFO: segments in reverse
    decode order, rows in reverse) lays words out to match.
  * The decoder's only memory ops are a contiguous ``dynamic_slice`` window
    of L words and an in-register permutation done as a one-hot f32 matmul
    (exact: one term per output), which maps onto the MXU. The encoder's
    scatter is the transpose of the same trick.
  * Loop trip counts are traced values (ceil(count / (L*UNROLL))), so a
    35-point scale costs one iteration, not capacity/L.

The per-symbol arithmetic is the standard rANS recurrence (ryg_rans family,
public domain), identical in coding efficiency to the reference's byte coder
(reference: lib/entropy_models/rans_coder/rans_byte.h) at 16-bit precision.

Stream layout (uint16 words, little-endian on the wire):
  [2L state words: lane0_hi, lane0_lo, lane1_hi, ...]
  [segment words, first-decoded segment first]

CDF row convention matches the host streaming coder: row[s] = cumulative
count through s (uint16), row[S-1] = 65535, implied end(S-1) = 65536.
"""
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

DEFAULT_LANES = 1024
UNROLL = 8
_F32 = jnp.float32


def init_encoder(lanes: int = DEFAULT_LANES, word_capacity: int = 1 << 16):
    """(states, back-pointer, word buffer) for an encode session.

    The buffer fills BACKWARD from word_capacity - lanes (rANS is LIFO; the
    last `lanes` words are slack so the read-modify-write window never runs
    past the end); the final stream is buf[bptr : word_capacity - lanes].
    Size word_capacity >= total symbols + 2*lanes states + lanes slack."""
    return (jnp.full((lanes,), 1 << 16, jnp.uint32),
            jnp.int32(word_capacity - lanes),
            jnp.zeros((word_capacity,), jnp.int32))


def _row_blocks(count, lanes: int) -> jax.Array:
    """Number of UNROLL-row blocks needed for `count` symbols (traced)."""
    per = lanes * UNROLL
    return (jnp.asarray(count, jnp.int32) + per - 1) // per


def _scatter_window(words: jax.Array, emit: jax.Array, lanes: int):
    """Place emitting lanes' words at window positions 0..k-1 (lane order).

    Returns (window [L] int32 with zeros elsewhere, k). Exact one-hot f32
    matmul: each output position receives at most one term."""
    c = jnp.cumsum(emit.astype(jnp.int32))
    k = c[-1]
    pos = c - 1                                            # [L], valid if emit
    tgt = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    onehot = ((tgt == pos[None, :]) & emit[None, :]).astype(_F32)
    window = jax.lax.dot(onehot, words.astype(_F32)[:, None],
                         precision=jax.lax.Precision.HIGHEST)  # [L, 1]
    # HIGHEST: one-hot selection of 16-bit word values must be exact; the
    # TPU default matmul precision computes f32 dots in bf16 (8 mantissa
    # bits), which corrupts any integer > 256.
    return window[:, 0].astype(jnp.int32), k


def _gather_window(window: jax.Array, need: jax.Array, lanes: int):
    """Inverse of _scatter_window: needy lane l reads window[rank(l)].

    Returns (words [L] uint32, k)."""
    c = jnp.cumsum(need.astype(jnp.int32))
    k = c[-1]
    src = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    onehot = ((src == (c - 1)[:, None]) & need[:, None]).astype(_F32)
    words = jax.lax.dot(onehot, window.astype(_F32)[:, None],
                        precision=jax.lax.Precision.HIGHEST)
    return words[:, 0].astype(jnp.uint32), k


def encode_segment(states, bptr, buf, starts, freqs, count):
    """Encode one segment LIFO (traceable).

    starts/freqs: [cap] uint16 per-symbol (cumulative start, frequency);
    count: number of valid symbols (traced). Rows of L symbols are processed
    in reverse; within a row, emitted words are laid out in ascending lane
    order at descending buffer positions so the decoder reads forward."""
    lanes = states.shape[0]
    cap = starts.shape[0]
    per = lanes * UNROLL
    padded = -(-cap // per) * per
    if padded != cap:
        starts = jnp.pad(starts, (0, padded - cap))
        freqs = jnp.pad(freqs, (0, padded - cap), constant_values=1)
    blocks = _row_blocks(count, lanes)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (lanes, 1), 0)[:, 0]

    def body(i, carry):
        states, bptr, buf = carry
        blk = blocks - 1 - i
        base = blk * per
        st_blk = jax.lax.dynamic_slice(starts, (base,), (per,))
        fq_blk = jax.lax.dynamic_slice(freqs, (base,), (per,))
        for u in range(UNROLL - 1, -1, -1):               # LIFO within block
            idx0 = base + u * lanes
            active = (idx0 + lane_ids) < count
            start = st_blk[u * lanes:(u + 1) * lanes].astype(jnp.uint32)
            freq = fq_blk[u * lanes:(u + 1) * lanes].astype(jnp.uint32)
            freq = jnp.maximum(freq, 1)
            x = states
            emit = active & (x >= (freq << 16))
            word = (x & 0xFFFF).astype(jnp.int32)
            x = jnp.where(emit, x >> 16, x)
            q = x // freq
            x_new = (q << 16) + (x - q * freq) + start
            states = jnp.where(active, x_new, states)
            window, k = _scatter_window(word, emit, lanes)
            bptr = bptr - k
            # read-modify-write: positions >= k of the window hold words
            # emitted by later-decoded rows; keep them.
            existing = jax.lax.dynamic_slice(buf, (bptr,), (lanes,))
            merged = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (lanes, 1), 0)[:, 0] < k,
                window, existing)
            buf = jax.lax.dynamic_update_slice(buf, merged, (bptr,))
        return states, bptr, buf

    return jax.lax.fori_loop(0, blocks, body, (states, bptr, buf))


def encode_flush(states, bptr, buf):
    """Write the 2L state words below bptr (they are read FIRST by the
    decoder). Returns (bptr', buf'). Stream = buf[bptr':]."""
    lanes = states.shape[0]
    hi = (states >> 16).astype(jnp.int32)
    lo = (states & 0xFFFF).astype(jnp.int32)
    words = jnp.stack([hi, lo], axis=1).reshape(-1)        # [2L]
    bptr = bptr - 2 * lanes
    buf = jax.lax.dynamic_update_slice(buf, words, (bptr,))
    return bptr, buf


def init_decoder(stream: jax.Array, ptr, lanes: int = DEFAULT_LANES):
    """Prime decoder states from the first 2L words. Returns (states, ptr')."""
    head = jax.lax.dynamic_slice(stream, (ptr,), (2 * lanes,))
    head = head.reshape(lanes, 2).astype(jnp.uint32)
    states = (head[:, 0] << 16) | head[:, 1]
    return states, ptr + 2 * lanes


def decode_segment(states, ptr, stream, cdfs, count):
    """Decode one segment (traceable).

    cdfs: [cap, S] uint16 rows; count: valid symbols (traced). Returns
    (states, ptr, symbols [cap] int32, zero past count). The stream must have
    >= L words of zero padding after the last valid word (dynamic_slice
    windows must not clamp)."""
    lanes = states.shape[0]
    cap, s = cdfs.shape
    per = lanes * UNROLL
    padded = -(-cap // per) * per
    if padded != cap:
        cdfs = jnp.pad(cdfs, ((0, padded - cap), (0, 0)))
    blocks = _row_blocks(count, lanes)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (lanes, 1), 0)[:, 0]
    sym_cols = jax.lax.broadcasted_iota(jnp.int32, (lanes, s), 1)
    syms_out = jnp.zeros((padded,), jnp.int32)

    def body(b, carry):
        states, ptr, syms_out = carry
        base = b * per
        rows_blk = jax.lax.dynamic_slice(
            cdfs, (base, jnp.zeros_like(base)), (per, s)).astype(jnp.uint32)
        sym_list = []
        for u in range(UNROLL):
            row = rows_blk[u * lanes:(u + 1) * lanes]      # [L, S]
            active = (base + u * lanes + lane_ids) < count
            x = states
            cf = x & 0xFFFF
            sym = jnp.minimum((row <= cf[:, None]).sum(-1), s - 1) \
                .astype(jnp.int32)
            start = jnp.where(sym_cols == (sym - 1)[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            start = jnp.where(sym == 0, 0, start)
            end = jnp.where(sym_cols == sym[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            end = jnp.where(sym == s - 1, jnp.uint32(1 << 16), end)
            freq = end - start
            x2 = freq * (x >> 16) + cf - start
            need = active & (x2 < (1 << 16))
            window = jax.lax.dynamic_slice(stream, (ptr,), (lanes,))
            words, k = _gather_window(window, need, lanes)
            x3 = jnp.where(need, (x2 << 16) | words, x2)
            states = jnp.where(active, x3, states)
            ptr = ptr + k
            sym_list.append(jnp.where(active, sym, 0))
        syms_out = jax.lax.dynamic_update_slice(
            syms_out, jnp.concatenate(sym_list), (base,))
        return states, ptr, syms_out

    states, ptr, syms_out = jax.lax.fori_loop(
        0, blocks, body, (states, ptr, syms_out))
    return states, ptr, syms_out[:cap]


def enc_pairs(cdf_rows: jax.Array, symbols: jax.Array):
    """Per-symbol (start, freq) uint16 pairs from CDF rows (the coder-row
    convention: row[s] = cum count through s, row[-1] = 65535)."""
    s = jnp.clip(symbols, 0, cdf_rows.shape[-1] - 1)
    row = jnp.arange(cdf_rows.shape[0])
    end = jnp.where(s == cdf_rows.shape[-1] - 1, 65536,
                    cdf_rows[row, s].astype(jnp.int32))
    start = jnp.where(s == 0, 0, cdf_rows[row, jnp.maximum(s - 1, 0)]
                      .astype(jnp.int32))
    return start.astype(jnp.uint16), (end - start).astype(jnp.uint16)


# ----------------------------------------------------------------- host I/O

def stream_to_bytes(bptr, buf, lanes: int = DEFAULT_LANES) -> bytes:
    """Host flush: stream words -> little-endian uint16 blob with a u32
    word-count header. `lanes` must match the encode session (tail slack)."""
    bptr = int(bptr)
    assert bptr >= 0, 'ilv_rans word buffer overflow (undersized capacity)'
    words = np.asarray(buf[bptr:buf.shape[0] - lanes]).astype(np.uint16)
    return len(words).to_bytes(4, 'little') + words.tobytes()


def bytes_to_stream(data: bytes, word_capacity: int,
                    lanes: int = DEFAULT_LANES):
    """Parse a blob -> (stream [word_capacity] int32 zero-padded, n_words,
    consumed byte count). word_capacity must be >= n_words + lanes (window
    slack)."""
    n_words = int.from_bytes(data[:4], 'little')
    words = np.frombuffer(data[4:4 + 2 * n_words], np.uint16)
    assert word_capacity >= n_words + lanes, 'decoder stream capacity too small'
    out = np.zeros((word_capacity,), np.int32)
    out[:n_words] = words
    return jnp.asarray(out), n_words, 4 + 2 * n_words


def word_capacity_for(max_symbols: int, lanes: int = DEFAULT_LANES) -> int:
    """Encoder/decoder word capacity: every symbol emits at most one word,
    plus 2L state words and L window slack, rounded up to a power of two."""
    need = max_symbols + 3 * lanes
    return 1 << math.ceil(math.log2(max(need, 4 * lanes)))
