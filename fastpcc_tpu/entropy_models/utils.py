"""Bitstream composition + gradient helpers
(reference: lib/entropy_models/utils.py:7-77 and
hyperprior/noisy_deep_factorized/utils.py:6-76)."""
import io
from typing import List

import jax


def grad_scale(x: jax.Array, scale: float) -> jax.Array:
    """Identity forward, grad * scale backward (reference: utils.py:7-30)."""
    return x * scale + jax.lax.stop_gradient(x * (1 - scale))


def concat_byte_streams(streams: List[bytes]) -> bytes:
    """Length-prefixed concatenation: varint byte count of each stream's
    length, then the length, then the payload (functional equivalent of the
    reference's BytesListUtils, hyperprior/.../utils.py:6-76)."""
    out = io.BytesIO()
    for s in streams:
        ln = len(s)
        n_bytes = max((ln.bit_length() + 7) // 8, 1)
        out.write(bytes([n_bytes]))
        out.write(ln.to_bytes(n_bytes, 'little'))
        out.write(s)
    return out.getvalue()


def split_byte_streams(data: bytes, expected: int = 0) -> List[bytes]:
    streams = []
    pos = 0
    while pos < len(data):
        n_bytes = data[pos]
        pos += 1
        ln = int.from_bytes(data[pos:pos + n_bytes], 'little')
        pos += n_bytes
        streams.append(data[pos:pos + ln])
        pos += ln
    if expected:
        assert len(streams) == expected, (len(streams), expected)
    return streams
