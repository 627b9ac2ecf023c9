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
  * Bitstream: [u16 x L per-lane lengths][lane 0 bytes][lane 1 bytes]...;
    each lane stream starts with its 4 little-endian final-state bytes.
  * Encoding walks segments and rows in reverse (rANS is LIFO); inactive
    lanes in partial rows encode a no-op symbol (start=0, freq=2^16), which
    provably leaves the state unchanged and emits nothing.

Symbols use the streaming-coder CDF row convention: row[s] = cumulative
count through s (uint16), row[-1] = 65535, end(last) = 65536.
"""
import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

RANS_L = jnp.uint32(1 << 23)
DEFAULT_LANES = 256


def init_lane_state(lanes: int = DEFAULT_LANES, byte_capacity: int = 1 << 14):
    """(states, positions, byte buffer) for an encode session."""
    return (jnp.full((lanes,), 1 << 23, jnp.uint32),
            jnp.zeros((lanes,), jnp.int32),
            jnp.zeros((lanes, byte_capacity), jnp.uint8))


def lane_encode_segment_impl(states, pos, buf, starts, freqs_m1, count):
    """Encode one segment LIFO. starts/freqs_m1: [cap] uint16 per-symbol
    (start, freq-1) pairs; count: valid symbols. cap % lanes == 0.
    Raw traceable body — call this inside larger jitted programs."""
    lanes = states.shape[0]
    cap = starts.shape[0]
    capb = buf.shape[1]
    rows = cap // lanes
    lane_ids = jnp.arange(lanes)

    def body(i, carry):
        states, pos, buf = carry
        r = rows - 1 - i
        idx = r * lanes + lane_ids
        mask = idx < count
        start = jnp.where(mask, starts[idx], 0).astype(jnp.uint32)
        freq = jnp.where(mask, freqs_m1[idx].astype(jnp.uint32) + 1,
                         jnp.uint32(1 << 16))
        x = states
        x_max = freq << 15
        for _ in range(2):  # byte renorm emits at most 2 bytes per symbol
            emit = x >= x_max
            byte = (x & 0xFF).astype(jnp.uint8)
            col = jnp.where(emit, pos, capb)
            buf = buf.at[lane_ids, col].set(byte, mode='drop')
            pos = pos + emit.astype(jnp.int32)
            x = jnp.where(emit, x >> 8, x)
        q = x // freq
        states = (q << 16) + (x - q * freq) + start
        return states, pos, buf

    return jax.lax.fori_loop(0, rows, body, (states, pos, buf))


def lane_decode_segment_impl(states, pos, buf, cdfs, count):
    """Decode one segment. cdfs: [cap, S] uint16 rows; returns
    (states, pos, symbols [cap] int32). Raw traceable body."""
    lanes = states.shape[0]
    cap, s = cdfs.shape
    capb = buf.shape[1]
    rows = cap // lanes
    lane_ids = jnp.arange(lanes)
    syms_out = jnp.zeros((cap,), jnp.int32)

    def body(i, carry):
        states, pos, syms_out = carry
        idx = i * lanes + lane_ids
        mask = idx < count
        row = cdfs[jnp.where(mask, idx, 0)].astype(jnp.uint32)   # [L, S]
        cf = states & 0xFFFF
        sym = jnp.minimum((row <= cf[:, None]).sum(-1), s - 1) \
            .astype(jnp.int32)
        start = jnp.where(sym == 0, 0,
                          jnp.take_along_axis(
                              row, jnp.maximum(sym - 1, 0)[:, None],
                              axis=1)[:, 0])
        end = jnp.where(sym == s - 1, jnp.uint32(1 << 16),
                        jnp.take_along_axis(row, sym[:, None], axis=1)[:, 0])
        freq = end - start
        x = freq * (states >> 16) + cf - start
        new_pos = pos
        for _ in range(2):  # renorm reads at most 2 bytes
            need = x < RANS_L
            byte = buf[lane_ids, jnp.minimum(new_pos, capb - 1)] \
                .astype(jnp.uint32)
            x = jnp.where(need, (x << 8) | byte, x)
            new_pos = new_pos + need.astype(jnp.int32)
        states = jnp.where(mask, x, states)
        pos = jnp.where(mask, new_pos, pos)
        syms_out = syms_out.at[idx].set(jnp.where(mask, sym, 0), mode='drop')
        return states, pos, syms_out

    return jax.lax.fori_loop(0, rows, body, (states, pos, syms_out))


lane_encode_segment = jax.jit(lane_encode_segment_impl, donate_argnums=(0, 1, 2))
lane_decode_segment = jax.jit(lane_decode_segment_impl, donate_argnums=(0, 1))


def lane_flush_to_bytes(states, pos, buf) -> bytes:
    """Assemble the bitstream on the host: per-lane, reverse the emitted
    bytes (encoder appends; decoder reads forward) and prepend the 4
    final-state bytes via the same reversal."""
    states = np.asarray(states)
    pos = np.asarray(pos)
    # fetch whole: a device-side trim would cost one more executed program,
    # which is ~2s in this runtime's degraded post-transfer mode
    buf = np.asarray(buf)
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
                        byte_capacity: int = 1 << 14):
    """Parse a lane bitstream -> (states, positions, padded byte buffer,
    consumed byte count)."""
    lengths = [int.from_bytes(data[2 * j:2 * j + 2], 'little')
               for j in range(lanes)]
    offset = 2 * lanes
    states = np.zeros((lanes,), np.uint32)
    buf = np.zeros((lanes, byte_capacity), np.uint8)
    for j in range(lanes):
        stream = np.frombuffer(data[offset:offset + lengths[j]], np.uint8)
        offset += lengths[j]
        states[j] = int.from_bytes(stream[:4].tobytes(), 'little')
        body = stream[4:]
        buf[j, :len(body)] = body
    return (jnp.asarray(states), jnp.zeros((lanes,), jnp.int32),
            jnp.asarray(buf), offset)
