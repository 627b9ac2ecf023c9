"""Lane-interleaved rANS entropy coding on device (pure XLA).

The reference codes every scale on the host, shipping softmax CDF tables
GPU->CPU per scale (reference: lossl_coord/model.py:461-468,533-555). On TPU
that host round trip dominates; instead, L independent byte-rANS states
(same arithmetic as the host coder: 32-bit state, renorm bound 2^23, 16-bit
probabilities) run in lockstep as [L]-wide vector ops inside a fori_loop.
Only compressed bytes ever cross the host boundary.

Format ("lane rANS", L lanes):
  * A session codes several segments (one per scale) in decode order; within
    a segment of M symbols, position i belongs to lane i mod L.
  * Each lane owns a private byte stream, read forward by the decoder.
  * Bitstream: [u32 x L per-lane lengths][lane 0 bytes][lane 1 bytes]...;
    each lane stream starts with its 4 little-endian final-state bytes.
  * Encoding walks segments and rows in reverse (rANS is LIFO); inactive
    lanes in partial rows encode a no-op symbol (start=0, freq=2^16), which
    provably leaves the state unchanged and emits nothing.

Symbols use the streaming-coder CDF row convention: row[s] = cumulative
count through s (uint16), row[-1] = 65535, end(last) = 65536.

TPU shaping: loop iterations on this target cost ~70us of fixed overhead
regardless of body size, so bodies process UNROLL rows per iteration with
one contiguous dynamic_slice per block; byte buffers store one byte per
int32 element (sub-word gathers are emulated and slow).
"""
import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

RANS_L = jnp.uint32(1 << 23)
DEFAULT_LANES = 1024
UNROLL = 8


def init_lane_state(lanes: int = DEFAULT_LANES, byte_capacity: int = 1 << 13):
    """(states, positions, byte buffer) for an encode session."""
    return (jnp.full((lanes,), 1 << 23, jnp.uint32),
            jnp.zeros((lanes,), jnp.int32),
            jnp.zeros((lanes, byte_capacity), jnp.int32))


def _pad_rows(cap: int, lanes: int) -> int:
    blk = lanes * UNROLL
    return -(-cap // blk) * blk


def lane_encode_segment_impl(states, pos, buf, starts, freqs_m1, count):
    """Encode one segment LIFO. starts/freqs_m1: [cap] uint16 per-symbol
    (start, freq-1) pairs; count: valid symbols. Raw traceable body."""
    lanes = states.shape[0]
    cap = starts.shape[0]
    capb = buf.shape[1]
    lane_ids = jnp.arange(lanes)
    padded = _pad_rows(cap, lanes)
    if padded != cap:
        starts = jnp.pad(starts, (0, padded - cap))
        freqs_m1 = jnp.pad(freqs_m1, (0, padded - cap))
    blocks = padded // (lanes * UNROLL)

    def body(b, carry):
        states, pos, buf = carry
        blk = blocks - 1 - b
        base = blk * lanes * UNROLL
        st_blk = jax.lax.dynamic_slice(starts, (base,), (lanes * UNROLL,))
        fm_blk = jax.lax.dynamic_slice(freqs_m1, (base,), (lanes * UNROLL,))
        for u in range(UNROLL - 1, -1, -1):   # reverse within block (LIFO)
            idx0 = base + u * lanes
            mask = (idx0 + lane_ids) < count
            start = jnp.where(mask, st_blk[u * lanes:(u + 1) * lanes], 0) \
                .astype(jnp.uint32)
            freq = jnp.where(mask,
                             fm_blk[u * lanes:(u + 1) * lanes]
                             .astype(jnp.uint32) + 1, jnp.uint32(1 << 16))
            x = states
            x_max = freq << 15
            for _ in range(2):   # byte renorm emits at most 2 bytes/symbol
                emit = x >= x_max
                byte = (x & 0xFF).astype(jnp.int32)
                col = jnp.where(emit, pos, capb)
                buf = buf.at[lane_ids, col].set(byte, mode='drop')
                pos = pos + emit.astype(jnp.int32)
                x = jnp.where(emit, x >> 8, x)
            q = x // freq
            states = (q << 16) + (x - q * freq) + start
        return states, pos, buf

    return jax.lax.fori_loop(0, blocks, body, (states, pos, buf))


def lane_decode_segment_impl(states, pos, buf, cdfs, count):
    """Decode one segment. cdfs: [cap, S] uint16 rows; returns
    (states, pos, symbols [cap] int32). Raw traceable body."""
    lanes = states.shape[0]
    cap, s = cdfs.shape
    capb = buf.shape[1]
    lane_ids = jnp.arange(lanes)
    padded = _pad_rows(cap, lanes)
    if padded != cap:
        cdfs = jnp.pad(cdfs, ((0, padded - cap), (0, 0)))
    blocks = padded // (lanes * UNROLL)
    syms_out = jnp.zeros((padded,), jnp.int32)
    sym_cols = jax.lax.broadcasted_iota(jnp.int32, (lanes, s), 1)

    def body(b, carry):
        states, pos, syms_out = carry
        base = b * lanes * UNROLL
        rows_blk = jax.lax.dynamic_slice(
            cdfs, (base, 0), (lanes * UNROLL, s)).astype(jnp.uint32)
        sym_list = []
        for u in range(UNROLL):
            row = rows_blk[u * lanes:(u + 1) * lanes]          # [L, S]
            mask = (base + u * lanes + lane_ids) < count
            cf = states & 0xFFFF
            sym = jnp.minimum((row <= cf[:, None]).sum(-1), s - 1) \
                .astype(jnp.int32)
            start = jnp.where(sym_cols == (sym - 1)[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            start = jnp.where(sym == 0, 0, start)
            end = jnp.where(sym_cols == sym[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            end = jnp.where(sym == s - 1, jnp.uint32(1 << 16), end)
            freq = end - start
            x = freq * (states >> 16) + cf - start
            new_pos = pos
            for _ in range(2):   # renorm reads at most 2 bytes
                need = x < RANS_L
                byte = buf[lane_ids, jnp.minimum(new_pos, capb - 1)] \
                    .astype(jnp.uint32)
                x = jnp.where(need, (x << 8) | byte, x)
                new_pos = new_pos + need.astype(jnp.int32)
            states = jnp.where(mask, x, states)
            pos = jnp.where(mask, new_pos, pos)
            sym_list.append(jnp.where(mask, sym, 0))
        syms_out = jax.lax.dynamic_update_slice(
            syms_out, jnp.concatenate(sym_list), (base,))
        return states, pos, syms_out

    states, pos, syms_out = jax.lax.fori_loop(
        0, blocks, body, (states, pos, syms_out))
    return states, pos, syms_out[:cap]


def lane_decode_backward_impl(states, pos, buf, cdfs, count):
    """Decode a segment directly from an ENCODER's buffer: bytes were
    appended forward, so renorm reads walk backward (pos decrements), and
    the decoder starts from the encoder's final states — a zero-copy
    device-side loopback (no host flush/reverse). Segments decode in reverse
    encode order, exactly the LIFO contract."""
    lanes = states.shape[0]
    cap, s = cdfs.shape
    capb = buf.shape[1]
    lane_ids = jnp.arange(lanes)
    padded = _pad_rows(cap, lanes)
    if padded != cap:
        cdfs = jnp.pad(cdfs, ((0, padded - cap), (0, 0)))
    blocks = padded // (lanes * UNROLL)
    syms_out = jnp.zeros((padded,), jnp.int32)
    sym_cols = jax.lax.broadcasted_iota(jnp.int32, (lanes, s), 1)

    def body(b, carry):
        states, pos, syms_out = carry
        base = b * lanes * UNROLL
        rows_blk = jax.lax.dynamic_slice(
            cdfs, (base, 0), (lanes * UNROLL, s)).astype(jnp.uint32)
        sym_list = []
        for u in range(UNROLL):
            row = rows_blk[u * lanes:(u + 1) * lanes]
            mask = (base + u * lanes + lane_ids) < count
            cf = states & 0xFFFF
            sym = jnp.minimum((row <= cf[:, None]).sum(-1), s - 1) \
                .astype(jnp.int32)
            start = jnp.where(sym_cols == (sym - 1)[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            start = jnp.where(sym == 0, 0, start)
            end = jnp.where(sym_cols == sym[:, None], row, 0) \
                .sum(1, dtype=jnp.uint32)
            end = jnp.where(sym == s - 1, jnp.uint32(1 << 16), end)
            freq = end - start
            x = freq * (states >> 16) + cf - start
            new_pos = pos
            for _ in range(2):
                need = x < RANS_L
                rd = jnp.clip(new_pos - 1, 0, capb - 1)
                byte = buf[lane_ids, rd].astype(jnp.uint32)
                x = jnp.where(need, (x << 8) | byte, x)
                new_pos = new_pos - need.astype(jnp.int32)
            states = jnp.where(mask, x, states)
            pos = jnp.where(mask, new_pos, pos)
            sym_list.append(jnp.where(mask, sym, 0))
        syms_out = jax.lax.dynamic_update_slice(
            syms_out, jnp.concatenate(sym_list), (base,))
        return states, pos, syms_out

    states, pos, syms_out = jax.lax.fori_loop(
        0, blocks, body, (states, pos, syms_out))
    return states, pos, syms_out[:cap]


lane_encode_segment = jax.jit(lane_encode_segment_impl, donate_argnums=(0, 1, 2))
lane_decode_segment = jax.jit(lane_decode_segment_impl, donate_argnums=(0, 1))


def lane_flush_to_bytes(states, pos, buf) -> bytes:
    """Assemble the bitstream on the host: per-lane, reverse the emitted
    bytes (encoder appends; decoder reads forward) and prepend the 4
    final-state bytes via the same reversal."""
    states = np.asarray(states)
    pos = np.asarray(pos)
    buf = np.asarray(buf).astype(np.uint8)
    max_pos = int(pos.max(initial=0))
    assert max_pos + 4 <= buf.shape[1], 'lane byte buffer overflow'
    lanes = states.shape[0]
    streams = []
    for j in range(lanes):
        body = buf[j, :pos[j]]
        state_bytes = np.array([states[j] >> 24, states[j] >> 16,
                                states[j] >> 8, states[j]], np.uint8)
        streams.append(np.concatenate([body, state_bytes])[::-1].tobytes())
    header = b''.join(len(s).to_bytes(2, 'little') for s in streams)
    return header + b''.join(streams)


def lane_bytes_to_state(data: bytes, lanes: int = DEFAULT_LANES,
                        byte_capacity: int = 1 << 13):
    """Parse a lane bitstream -> (states, positions, padded byte buffer,
    consumed byte count)."""
    lengths = [int.from_bytes(data[2 * j:2 * j + 2], 'little')
               for j in range(lanes)]
    offset = 2 * lanes
    states = np.zeros((lanes,), np.uint32)
    buf = np.zeros((lanes, byte_capacity), np.int32)
    for j in range(lanes):
        stream = np.frombuffer(data[offset:offset + lengths[j]], np.uint8)
        offset += lengths[j]
        states[j] = int.from_bytes(stream[:4].tobytes(), 'little')
        body = stream[4:]
        buf[j, :len(body)] = body
    return (jnp.asarray(states), jnp.zeros((lanes,), jnp.int32),
            jnp.asarray(buf), offset)
