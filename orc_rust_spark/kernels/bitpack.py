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
    """Pack non-negative ints at `width` bits each, MSB-first across
    bytes.  uint32 input stays in the 32-bit domain for width <= 32 —
    the u64 upcast was pure memory traffic on the int32 token path."""
    v = np.ascontiguousarray(values)
    if v.dtype != U64 and not (v.dtype == np.uint32 and width <= 32):
        v = v.astype(U64)
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
        if v.dtype == np.uint32:
            be = v.astype(">u4").view(np.uint8).reshape(n, 4)
            return be[:, 4 - nbytes:].tobytes()
        be = v.astype(">u8").view(np.uint8).reshape(n, 8)
        return be[:, 8 - nbytes :].tobytes()
    # general path: expand each value to `width` bits, MSB first
    one = v.dtype.type(1)
    shifts = np.arange(width - 1, -1, -1, dtype=v.dtype)
    bits = ((v[:, None] >> shifts) & one).astype(np.uint8)
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
    v = np.ascontiguousarray(values)
    if v.dtype != U64 and not (width <= 32 and v.dtype == np.uint32):
        v = v.astype(U64)
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
    if width <= 16:
        return _pack_groups8(v, lens, width, offs), offs
    starts = np.zeros(K, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # int32 index domain halves scatter traffic; guard on total bit
    # count so a >2^31-bit pack falls back to exact int64 arithmetic.
    # one repeat of the per-segment constant (offs*8 - starts*width)
    # replaces the two full-length repeats of the naive form
    it = np.int32 if int(offs[-1]) * 8 + width < 2**31 else np.int64
    val_bit = (np.arange(n, dtype=it) * it(width)
               + np.repeat((offs[:-1] * 8 - starts * width).astype(it),
                           lens))
    bits = np.zeros(int(offs[-1]) * 8, dtype=np.uint8)
    # one scatter per bit position keeps peak memory at O(n), not O(n*w);
    # uint32 value domain for the common width<=32 case (values fit
    # `width` bits by precondition)
    vv = v.astype(np.uint32) if width <= 32 and v.dtype != np.uint32 else v
    one = vv.dtype.type(1)
    for k in range(width):
        bits[val_bit + k] = ((vv >> vv.dtype.type(width - 1 - k)) & one) \
            .astype(np.uint8)
    return np.packbits(bits).tobytes(), offs


def _pack_groups8(v: np.ndarray, lens: np.ndarray, width: int,
                  offs: np.ndarray) -> bytes:
    """Segmented pack for width <= 16 via u64 group assembly: 8 values of
    w bits are exactly w bytes, so each zero-padded 8-value group folds
    into one u64 (two for w > 8) with 8 shift-adds over n/8-sized arrays
    — far less memory traffic than the per-bit scatter path (the
    patched-base stripped-value pack at w=4..7 dominated token encode).

    The common shape — every segment a multiple of 8 values (512-value
    RLEv2 blocks) — skips the padding scatter and truncation mask
    entirely; those index arrays were most of the path's cost."""
    K = len(lens)
    n = len(v)
    aligned_lens = bool((lens % 8 == 0).all())
    if aligned_lens:
        n_pad = n
        pv = v.astype(U64, copy=False)
    else:
        groups = (lens + 7) // 8
        n_pad = int(groups.sum()) * 8
        it = np.int32 if n_pad < 2**31 else np.int64
        pv = np.zeros(n_pad, dtype=U64)
        pstart = np.zeros(K, dtype=it)
        np.cumsum((groups[:-1] * 8).astype(it), out=pstart[1:])
        starts = np.zeros(K, dtype=it)
        np.cumsum(lens[:-1].astype(it), out=starts[1:])
        tgt = np.arange(n, dtype=it) + np.repeat(pstart - starts, lens)
        pv[tgt] = v  # upcasts u32 -> u64 in one pass
    gm = pv.reshape(-1, 8)
    if width <= 8:
        # value i occupies bits [64 - (i+1)*w, 64 - i*w) of one u64
        word = gm[:, 0] << U64(64 - width)
        for i in range(1, 8):
            word |= gm[:, i] << U64(64 - (i + 1) * width)
        gbytes = word.astype(">u8").view(np.uint8).reshape(-1, 8)[:, :width]
    else:
        # 8 values span 8w <= 128 bits: word A holds bits [0, 64),
        # word B bits [64, 8w) of the group's big-endian stream
        A = np.zeros(gm.shape[0], dtype=U64)
        B = np.zeros(gm.shape[0], dtype=U64)
        for i in range(8):
            lo, hi = i * width, (i + 1) * width
            if hi <= 64:
                A |= gm[:, i] << U64(64 - hi)
            elif lo >= 64:
                B |= gm[:, i] << U64(128 - hi)
            else:  # straddles the word boundary
                A |= gm[:, i] >> U64(hi - 64)
                B |= gm[:, i] << U64(128 - hi)
        gbytes = np.empty((gm.shape[0], width), dtype=np.uint8)
        gbytes[:, :8] = A.astype(">u8").view(np.uint8).reshape(-1, 8)
        gbytes[:, 8:] = B.astype(">u8").view(np.uint8) \
            .reshape(-1, 8)[:, : width - 8]
    if aligned_lens:
        return gbytes.tobytes()
    # per-segment truncation: padded groups emit ceil(lens/8)*w bytes,
    # the true segment payload is ceil(lens*w/8) — drop the zero tail
    pad_bytes = groups * width
    true_bytes = np.diff(offs)
    total_pad = int(pad_bytes.sum())
    bt = np.int32 if total_pad < 2**31 else np.int64
    bstarts = np.zeros(K, dtype=bt)
    np.cumsum(pad_bytes[:-1].astype(bt), out=bstarts[1:])
    # arange < repeat(bstarts + true_bytes): one repeat, one compare
    keep = (np.arange(total_pad, dtype=bt)
            < np.repeat(bstarts + true_bytes.astype(bt), pad_bytes))
    return gbytes.reshape(-1)[keep].tobytes()


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
    if width <= 16:
        return _unpack_groups8(np.asarray(raw, dtype=np.uint8), lens,
                               byte_lens, width, n)
    offs = np.zeros(K, dtype=np.int64)
    np.cumsum(byte_lens[:-1], out=offs[1:])
    starts = np.zeros(K, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total_bits = int(offs[-1] + byte_lens[-1]) * 8
    it = np.int32 if total_bits + width < 2**31 else np.int64
    val_bit = (np.arange(n, dtype=it) * it(width)
               + np.repeat((offs * 8 - starts * width).astype(it), lens))
    bits = np.unpackbits(np.asarray(raw, dtype=np.uint8))
    # accumulate in uint32 when the value fits, widening once at the end
    acc_t = np.uint32 if width <= 32 else U64
    vals = np.zeros(n, dtype=acc_t)
    for k in range(width):
        vals |= bits[val_bit + k].astype(acc_t) << acc_t(width - 1 - k)
    return vals.astype(U64)


def _unpack_groups8(raw: np.ndarray, lens: np.ndarray,
                    byte_lens: np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of `_pack_groups8` for width <= 16: each 8-value group is
    exactly `width` bytes — fold them into one u64 (two for w > 8) and
    extract the 8 values with shifts, instead of the per-bit loop's
    `width` scatter passes + 8x unpackbits expansion."""
    K = len(lens)
    groups = (lens + 7) // 8
    n_pad_bytes = int(groups.sum()) * width
    aligned = bool((lens % 8 == 0).all())
    if aligned:
        pbytes = raw[:n_pad_bytes]
    else:
        # re-space each segment's bytes to its ceil(len/8)*w padded slot
        it = np.int32 if n_pad_bytes < 2**31 else np.int64
        boffs = np.zeros(K, dtype=it)
        np.cumsum(byte_lens[:-1].astype(it), out=boffs[1:])
        pstart = np.zeros(K, dtype=it)
        np.cumsum((groups[:-1] * width).astype(it), out=pstart[1:])
        nb = int(byte_lens.sum())
        tgt = (np.arange(nb, dtype=it)
               + np.repeat(pstart - boffs, byte_lens))
        pbytes = np.zeros(n_pad_bytes, dtype=np.uint8)
        pbytes[tgt] = raw[:nb]
    gm = np.zeros((n_pad_bytes // width, 8), dtype=np.uint8)
    gb = pbytes.reshape(-1, width)
    m = gm.shape[0]
    mask = U64((1 << width) - 1)
    if width <= 8:
        gm[:, :width] = gb
        word = gm.reshape(-1).view(">u8").astype(U64)
        vals8 = np.empty((m, 8), dtype=U64)
        for i in range(8):
            vals8[:, i] = (word >> U64(64 - (i + 1) * width)) & mask
    else:
        gm[:, :] = gb[:, :8]
        A = gm.reshape(-1).view(">u8").astype(U64)
        gm2 = np.zeros((m, 8), dtype=np.uint8)
        gm2[:, : width - 8] = gb[:, 8:]
        B = gm2.reshape(-1).view(">u8").astype(U64)
        vals8 = np.empty((m, 8), dtype=U64)
        for i in range(8):
            lo, hi = i * width, (i + 1) * width
            if hi <= 64:
                vals8[:, i] = (A >> U64(64 - hi)) & mask
            elif lo >= 64:
                vals8[:, i] = (B >> U64(128 - hi)) & mask
            else:
                vals8[:, i] = ((A << U64(hi - 64))
                               | (B >> U64(128 - hi))) & mask
    flat = vals8.reshape(-1)
    if aligned:
        return flat[:n]
    # drop the per-segment zero-padded tail values
    pad_vals = groups * 8
    total_pad = int(pad_vals.sum())
    vt = np.int32 if total_pad < 2**31 else np.int64
    vstarts = np.zeros(K, dtype=vt)
    np.cumsum(pad_vals[:-1].astype(vt), out=vstarts[1:])
    keep = (np.arange(total_pad, dtype=vt)
            < np.repeat(vstarts + lens.astype(vt), pad_vals))
    return flat[keep]


def packed_byte_len(n: int, width: int) -> int:
    """Number of bytes a pack of n values at `width` bits occupies."""
    if width % 8 == 0:
        return n * (width // 8)
    return (n * width + 7) // 8
