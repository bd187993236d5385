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
        # byte-aligned: big-endian bytes truncated to width/8 low bytes.
        # exact-container fast paths (8/16/32/64) skip the 8-byte
        # intermediate — w=16 is the token hot path
        if width == 8:
            return v.astype(np.uint8).tobytes()
        if width == 16:
            return v.astype(">u2").tobytes()
        if width == 32:
            return v.astype(">u4").tobytes()
        if width == 64:
            return v.astype(">u8").tobytes()
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
        if width == 8:
            vals = np.frombuffer(buf, np.uint8, n, pos).astype(U64)
            return vals, pos + total
        if width == 16:
            return np.frombuffer(buf, ">u2", n, pos).astype(U64), pos + total
        if width == 32:
            return np.frombuffer(buf, ">u4", n, pos).astype(U64), pos + total
        if width == 64:
            return np.frombuffer(buf, ">u8", n, pos).astype(U64), pos + total
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


def pack_ints_segmented(values: np.ndarray, lens: np.ndarray,
                        width: int) -> tuple[bytes, np.ndarray]:
    """Pack consecutive segments (lens[i] values each) independently at
    `width` bits, each segment zero-padded to its own byte boundary —
    i.e. the concatenation of per-segment `pack_ints` results, computed
    in one vectorized pass.  Returns (blob, byte_offsets[K+1])."""
    v = np.ascontiguousarray(values, dtype=U64)
    K = len(lens)
    offs = np.zeros(K + 1, dtype=np.int64)
    if width % 8 == 0:
        np.cumsum(lens * (width // 8), out=offs[1:])
        return pack_ints(v, width), offs
    byte_lens = (lens * width + 7) // 8
    np.cumsum(byte_lens, out=offs[1:])
    n = len(v)
    if n == 0:
        return b"", offs
    starts = np.zeros(K, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # int32 index domain halves scatter traffic; guard on total bit
    # count so a >2^31-bit pack falls back to exact int64 arithmetic
    it = np.int32 if int(offs[-1]) * 8 + width < 2**31 else np.int64
    pos_in_seg = np.arange(n, dtype=it) - np.repeat(starts.astype(it), lens)
    val_bit = np.repeat((offs[:-1] * 8).astype(it), lens) \
        + pos_in_seg * it(width)
    bits = np.zeros(int(offs[-1]) * 8, dtype=np.uint8)
    # one scatter per bit position keeps peak memory at O(n), not O(n*w);
    # uint32 value domain for the common width<=32 case (values fit
    # `width` bits by precondition)
    vv = v.astype(np.uint32) if width <= 32 else v
    one = vv.dtype.type(1)
    for k in range(width):
        bits[val_bit + k] = ((vv >> vv.dtype.type(width - 1 - k)) & one) \
            .astype(np.uint8)
    return np.packbits(bits).tobytes(), offs


def unpack_ints_segmented(raw: np.ndarray, lens: np.ndarray,
                          width: int) -> np.ndarray:
    """Inverse of `pack_ints_segmented`: `raw` is the concatenation of
    per-segment packs (each zero-padded to a byte boundary); returns the
    concatenated uint64 values."""
    n = int(lens.sum())
    if n == 0:
        return np.empty(0, dtype=U64)
    if width % 8 == 0:
        nbytes = width // 8
        r = np.ascontiguousarray(np.asarray(raw, dtype=np.uint8))
        if width == 8:
            return r[:n].astype(U64)
        if width == 16:
            return r.view(">u2")[:n].astype(U64)
        if width == 32:
            return r.view(">u4")[:n].astype(U64)
        if width == 64:
            return r.view(">u8")[:n].astype(U64)
        out = np.zeros((n, 8), dtype=np.uint8)
        out[:, 8 - nbytes:] = r.reshape(n, nbytes)
        return out.reshape(-1).view(">u8").astype(U64)
    K = len(lens)
    byte_lens = (lens * width + 7) // 8
    offs = np.zeros(K, dtype=np.int64)
    np.cumsum(byte_lens[:-1], out=offs[1:])
    starts = np.zeros(K, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total_bits = int(offs[-1] + byte_lens[-1]) * 8
    it = np.int32 if total_bits + width < 2**31 else np.int64
    pos_in_seg = np.arange(n, dtype=it) - np.repeat(starts.astype(it), lens)
    val_bit = np.repeat((offs * 8).astype(it), lens) + pos_in_seg * it(width)
    bits = np.unpackbits(np.asarray(raw, dtype=np.uint8))
    # accumulate in uint32 when the value fits, widening once at the end
    acc_t = np.uint32 if width <= 32 else U64
    vals = np.zeros(n, dtype=acc_t)
    for k in range(width):
        vals |= bits[val_bit + k].astype(acc_t) << acc_t(width - 1 - k)
    return vals.astype(U64)


def packed_byte_len(n: int, width: int) -> int:
    """Number of bytes a pack of n values at `width` bits occupies."""
    if width % 8 == 0:
        return n * (width // 8)
    return (n * width + 7) // 8
