"""ORC boolean bit-RLE codec — also the PRESENT (validity) stream codec.

Mirrors `src/encoding/boolean.rs:33-169`: booleans are packed into bytes
MSB-first (the reference builds an Arrow LSB-first buffer then calls
`reverse_bits` per byte, `boolean.rs:158-169`, which is exactly
big-endian bit order), the final partial byte is zero-padded in its low
bits, and the byte sequence is then Byte-RLE encoded.
"""

from __future__ import annotations

import numpy as np

from .byte_rle import byte_rle_decode, byte_rle_encode


def boolean_encode(values: np.ndarray) -> bytes:
    """Encode a bool array to an ORC boolean/PRESENT stream."""
    bits = np.asarray(values, dtype=bool)
    packed = np.packbits(bits)  # MSB-first, zero-padded
    return byte_rle_encode(packed)


def boolean_decode(buf, n: int) -> np.ndarray:
    """Decode n booleans from an ORC boolean/PRESENT stream."""
    nbytes = (n + 7) // 8
    packed = byte_rle_decode(buf, nbytes)
    return np.unpackbits(packed)[:n].astype(bool)
