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


class BitSpan:
    """A boolean stream positioned mid-bitstream, as ORC row-index
    positions describe it: `buf` starts at a byte-RLE RUN boundary,
    `skip_bytes` decoded bytes are consumed within it, then `skip_bits`
    bits — the (byte offset, values-into-run, bit offset) triple of the
    public spec's row index.

    When `compression` is set, `buf` holds the RAW (compressed) slice
    and decompression happens lazily in `boolean_decode`, bounded to
    the bytes the requested bit count actually needs — eagerly
    decompressing to stream end cost O(groups x stream) on compressed
    row-group reads."""

    def __init__(self, buf, skip_bytes: int = 0, skip_bits: int = 0,
                 compression: int = 0, block_size: int = 256 * 1024,
                 pre_skip: int = 0):
        self.buf = buf
        self.skip_bytes = skip_bytes
        self.skip_bits = skip_bits
        self.compression = compression
        self.block_size = block_size
        # decompressed bytes to drop before byte-RLE decoding — the
        # in-chunk offset of a compressed stream's row-index position
        self.pre_skip = pre_skip


def boolean_encode_with_marks(values: np.ndarray, mark_bits) -> tuple[bytes, list]:
    """Encode one CONTINUOUS bool stream whose byte-RLE runs flush at
    each mark's byte boundary, so every mark is addressable as
    (stream byte offset at a run start, 0 values into run, bit within
    byte) — exactly what a row-index entry needs.  Returns
    (stream, [(byte_off, 0, bit_off) per mark])."""
    bits = np.asarray(values, dtype=bool)
    packed = np.packbits(bits)
    cuts = sorted({int(mb) // 8 for mb in mark_bits})
    parts = []
    offs_at: dict[int, int] = {0: 0}
    prev = 0
    off = 0
    for b in cuts:
        if b > prev:
            enc = byte_rle_encode(packed[prev:b])
            parts.append(enc)
            off += len(enc)
            prev = b
        offs_at[b] = off
    if prev < len(packed):
        parts.append(byte_rle_encode(packed[prev:]))
    stream = b"".join(parts)
    return stream, [(offs_at[int(mb) // 8], 0, int(mb) % 8)
                    for mb in mark_bits]


def boolean_decode(buf, n: int) -> np.ndarray:
    """Decode n booleans from an ORC boolean/PRESENT stream (bytes or a
    mid-stream `BitSpan`)."""
    if isinstance(buf, BitSpan):
        nbytes = buf.skip_bytes + (buf.skip_bits + n + 7) // 8
        raw = buf.buf
        if buf.compression:
            from .compression import decompress_stream
            # headroom: byte-RLE literal runs spend 1 header byte per
            # 128 payload bytes, plus one extra header per group-flush
            # segment the read spans (boolean_encode_with_marks flushes
            # runs at mark boundaries).  The +16 covers a dozen such
            # segments; if the read still spans more, fall back to full
            # decompression below.
            raw = decompress_stream(raw, buf.compression, buf.block_size,
                                    max_bytes=buf.pre_skip + nbytes
                                    + nbytes // 128 + 16)
        if buf.pre_skip:
            raw = memoryview(raw)[buf.pre_skip:]
        try:
            packed = byte_rle_decode(raw, nbytes, exact=False)
        except IndexError:
            if not buf.compression:
                raise
            raw = decompress_stream(buf.buf, buf.compression,
                                    buf.block_size)
            packed = byte_rle_decode(memoryview(raw)[buf.pre_skip:],
                                     nbytes, exact=False)
        return np.unpackbits(packed[buf.skip_bytes:])[
            buf.skip_bits: buf.skip_bits + n].astype(bool)
    nbytes = (n + 7) // 8
    packed = byte_rle_decode(buf, nbytes)
    return np.unpackbits(packed)[:n].astype(bool)
