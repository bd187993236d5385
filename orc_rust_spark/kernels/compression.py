"""ORC chunked block compression (SURVEY §2.2).

Format per `src/compression.rs:30-347`: a stream is a sequence of
chunks, each prefixed by a 3-byte little-endian header
``(chunk_length << 1) | is_original``; ``is_original=1`` means the chunk
body is stored uncompressed (the reference does the same when
compression does not shrink a block, `compression.rs:104-123`).  Default
block size 256 KiB (`compression.rs:31`).

zlib uses raw DEFLATE (no zlib wrapper), matching ORC's spec and the
reference's flate2 usage.  snappy/lz4/zstd are supported when their
Python modules exist (import-guarded; absent in this container).
"""

from __future__ import annotations

import zlib

DEFAULT_BLOCK_SIZE = 256 * 1024

K_NONE, K_ZLIB, K_SNAPPY, K_LZO, K_LZ4, K_ZSTD = 0, 1, 2, 3, 4, 5
KIND_NAMES = {K_NONE: "none", K_ZLIB: "zlib", K_SNAPPY: "snappy",
              K_LZO: "lzo", K_LZ4: "lz4", K_ZSTD: "zstd"}

try:  # pragma: no cover - not in this container
    import zstandard as _zstd
except ImportError:
    _zstd = None
try:  # pragma: no cover
    import snappy as _snappy
except ImportError:
    _snappy = None
try:  # pragma: no cover
    import lz4.block as _lz4
except ImportError:
    _lz4 = None


def _compress_one(kind: int, block: bytes) -> bytes:
    if kind == K_ZLIB:
        c = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
        return c.compress(block) + c.flush()
    if kind == K_ZSTD and _zstd is not None:
        return _zstd.ZstdCompressor().compress(block)
    if kind == K_SNAPPY and _snappy is not None:
        return _snappy.compress(block)
    if kind == K_LZ4 and _lz4 is not None:
        return _lz4.compress(block, store_size=False)
    raise ValueError(f"unsupported compression kind {kind}")


def _decompress_one(kind: int, block: bytes,
                    max_size: int = DEFAULT_BLOCK_SIZE) -> bytes:
    if kind == K_ZLIB:
        return zlib.decompress(block, -zlib.MAX_WBITS)
    if kind == K_ZSTD and _zstd is not None:
        return _zstd.ZstdDecompressor().decompress(block)
    if kind == K_SNAPPY and _snappy is not None:
        return _snappy.decompress(block)
    if kind == K_LZ4 and _lz4 is not None:
        # raw lz4 blocks don't carry their size; ORC chunk bodies are
        # bounded by the writer's block size, which the decompressor
        # takes as the allocation hint
        return _lz4.decompress(block, uncompressed_size=max_size)
    raise ValueError(f"unsupported compression kind {kind}")


def compress_stream(blob: bytes, kind: int,
                    block_size: int = DEFAULT_BLOCK_SIZE) -> bytes:
    """blob -> ORC chunked stream (header + body per block)."""
    if kind == K_NONE:
        return blob
    out = bytearray()
    for off in range(0, len(blob), block_size):
        block = blob[off: off + block_size]
        comp = _compress_one(kind, block)
        if len(comp) < len(block):
            header = len(comp) << 1
            body = comp
        else:  # stored as original, like the reference
            header = (len(block) << 1) | 1
            body = block
        out += header.to_bytes(3, "little")
        out += body
    return bytes(out)


def decompress_stream(buf, kind: int,
                      block_size: int = DEFAULT_BLOCK_SIZE,
                      max_bytes: int | None = None) -> bytes:
    """`block_size` is the writer's compressionBlockSize (PostScript
    field 3) — the upper bound each chunk decompresses to, needed by
    codecs whose raw blocks don't carry their size (lz4).  `max_bytes`
    stops after the chunk that reaches that many output bytes — readers
    slicing a row group out of a long stream need only its prefix."""
    if kind == K_NONE:
        return bytes(buf)
    buf = memoryview(buf)
    out = bytearray()
    pos = 0
    while pos < len(buf):
        header = int.from_bytes(buf[pos: pos + 3], "little")
        pos += 3
        length = header >> 1
        body = bytes(buf[pos: pos + length])
        pos += length
        out += body if header & 1 else _decompress_one(kind, body, block_size)
        if max_bytes is not None and len(out) >= max_bytes:
            break
    return bytes(out)
