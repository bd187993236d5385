"""Zero-copy blob decode: pa.Buffer memoryviews are SIGNED ('b'), so a
decoder that indexes bytes >= 128 without normalizing reads negative
values in every varint/header parse (caught live: FSST symbol counts).
decode_stripe must produce identical results from a pa.Buffer view and
from materialized bytes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from orc_rust_spark.stripes import decode_stripe, decode_stripe_rowgroups, encode_stripe


def _stripe_batch(n=4000):
    rng = np.random.default_rng(3)
    lens = rng.integers(1, 40, n)
    toks = [rng.integers(0, 1 << 20, ln).astype(np.int32) for ln in lens]
    return pa.RecordBatch.from_arrays([
        pa.array([f"doc{i:05d}" for i in range(n)]),
        pa.array([t for t in toks], pa.list_(pa.int32())),
        pa.array([len(t) for t in toks], pa.int32()),
        pa.array([("web", "book", "code")[i % 3] for i in range(n)]),
    ], names=["doc_id", "tokens", "n_tok", "source"])


def test_decode_stripe_from_pa_buffer_matches_bytes():
    blob = encode_stripe(_stripe_batch())
    assert any(b >= 128 for b in blob[:64])  # headers exercise signedness
    arr = pa.array([blob], pa.binary())
    via_buffer = decode_stripe(arr[0].as_buffer())
    via_bytes = decode_stripe(arr[0].as_py())
    assert via_buffer.equals(via_bytes)
    # sliced array (nonzero value offset) too
    arr2 = pa.array([b"x" * 7, blob], pa.binary()).slice(1)
    assert decode_stripe(arr2[0].as_buffer()).equals(via_bytes)


def test_decode_rowgroups_from_pa_buffer():
    from orc_rust_spark.stripes import encode_stripe_rowgroups
    blob = encode_stripe_rowgroups(_stripe_batch(), group_rows=1000)
    arr = pa.array([blob], pa.binary())
    got = decode_stripe_rowgroups(arr[0].as_buffer())
    want = decode_stripe_rowgroups(arr[0].as_py())
    assert got.equals(want)
