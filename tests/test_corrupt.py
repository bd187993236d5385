"""Corrupt-input behavior: malformed stripes must raise clean errors,
never return garbage rows (the reference ships corrupt fixtures under
`tests/integration/data/corrupt/`; same contract here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from orc_rust_spark.stripes import (
    decode_stripe,
    decode_stripe_rowgroups,
    encode_stripe,
    encode_stripe_rowgroups,
    stripe_num_rows,
    unwrap_compressed,
    wrap_compressed,
)


def _blob():
    rng = np.random.default_rng(0)
    b = pa.record_batch({
        "k": pa.array(np.arange(5000, dtype=np.int64)),
        "s": pa.array([f"row{i}" for i in range(5000)]),
        "f": pa.array(rng.standard_normal(5000)),
    })
    return encode_stripe(b)


def test_bad_magic():
    blob = _blob()
    with pytest.raises(ValueError, match="magic"):
        decode_stripe(b"XXXX" + blob[4:])


def test_truncated_blob():
    blob = _blob()
    for cut in (len(blob) // 2, len(blob) - 7, 10):
        with pytest.raises(Exception) as ei:
            decode_stripe(blob[:cut])
        assert isinstance(ei.value, (ValueError, IndexError))


def test_overlong_stream_length():
    blob = bytearray(_blob())
    ok = decode_stripe(bytes(blob))
    assert ok.num_rows == 5000
    # inflate a directory length varint high byte: find the directory by
    # re-encoding with a poisoned stream table is intrusive; instead chop
    # the payload so the directory's total exceeds the blob
    with pytest.raises(ValueError, match="truncated"):
        decode_stripe(bytes(blob[: len(blob) - 100]))


def test_corrupt_compressed_wrapper():
    blob = _blob()
    wrapped = wrap_compressed(blob, 1)  # zlib
    assert unwrap_compressed(wrapped) == blob
    # flip bytes inside the deflate body -> zlib error, not silent data
    bad = bytearray(wrapped)
    bad[30] ^= 0xFF
    bad[31] ^= 0xFF
    with pytest.raises(Exception):
        decode_stripe(bytes(bad))


def test_rowgroup_truncated():
    b = pa.record_batch({"k": pa.array(np.arange(10_000, dtype=np.int64))})
    blob = encode_stripe_rowgroups(b, group_rows=2000)
    with pytest.raises(Exception) as ei:
        decode_stripe_rowgroups(blob[: len(blob) // 2])
    assert isinstance(ei.value, (ValueError, IndexError))


def test_rowgroup_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decode_stripe_rowgroups(b"NOPE" + b"\x00" * 64)


def test_num_rows_on_truncated_header():
    blob = _blob()
    assert stripe_num_rows(blob) == 5000
    with pytest.raises(Exception):
        stripe_num_rows(b"OSP1")  # header cut mid-varint


def test_stripe_bytes_deterministic():
    """Resume correctness depends on stripe bytes being a pure function
    of the input rows (BASELINE north_rule: idempotent resume) —
    identical batches must encode to identical blobs across calls."""
    rng = np.random.default_rng(7)
    b = pa.record_batch({
        "k": pa.array(((rng.zipf(1.3, 20_000) - 1) % 50257).astype(np.int32)),
        "s": pa.array([f"doc{i:06d}" for i in range(20_000)]),
        "f": pa.array(rng.standard_normal(20_000)),
    })
    blobs = {encode_stripe(b) for _ in range(3)}
    assert len(blobs) == 1
    grouped = {encode_stripe_rowgroups(b, group_rows=4096) for _ in range(3)}
    assert len(grouped) == 1
