"""MSB-first big-endian bit-packing of non-negative integers.

Byte-compatible with the reference writers/readers in
`src/encoding/integer/util.rs:44-362` (read_ints, write_aligned_packed_ints,
write_packed_ints).  The reference's aligned fast paths (widths 1/2/4 and
byte multiples) and the general unaligned path all produce one MSB-first
concatenated bit stream with the final byte zero-padded in its low bits;
a single vectorized implementation therefore covers both.
"""

from __future__ import annotations

import numpy as np

from .util import U64


def pack_ints(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values at `width` bits each, MSB-first across bytes."""
    v = np.ascontiguousarray(values, dtype=U64)
    n = len(v)
    if n == 0:
        return b""
    if width % 8 == 0:
        # byte-aligned: big-endian bytes truncated to width/8 low bytes
        nbytes = width // 8
        be = v.astype(">u8").view(np.uint8).reshape(n, 8)
        return be[:, 8 - nbytes :].tobytes()
    # general path: expand each value to `width` bits, MSB first
    shifts = np.arange(width - 1, -1, -1, dtype=U64)
    bits = ((v[:, None] >> shifts) & U64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def unpack_ints(buf, pos: int, n: int, width: int) -> tuple[np.ndarray, int]:
    """Unpack n uint64 values of `width` bits from buf starting at pos.

    Returns (values, new_pos).
    """
    if n == 0:
        return np.empty(0, dtype=U64), pos
    if width % 8 == 0:
        nbytes = width // 8
        total = n * nbytes
        raw = np.frombuffer(buf, dtype=np.uint8, count=total, offset=pos)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, 8 - nbytes :] = raw.reshape(n, nbytes)
        vals = out.reshape(-1).view(">u8").astype(U64)
        return vals, pos + total
    total_bits = n * width
    total_bytes = (total_bits + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=total_bytes, offset=pos)
    bits = np.unpackbits(raw)[:total_bits].reshape(n, width)
    vals = np.zeros(n, dtype=U64)
    for j in range(width):
        vals = (vals << U64(1)) | bits[:, j].astype(U64)
    return vals, pos + total_bytes


def packed_byte_len(n: int, width: int) -> int:
    """Number of bytes a pack of n values at `width` bits occupies."""
    if width % 8 == 0:
        return n * (width // 8)
    return (n * width + 7) // 8
