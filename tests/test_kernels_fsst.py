"""FSST kernel tests: roundtrip (hypothesis + corpus), compression-ratio
floor on text, and stripe-level auto-selection."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from orc_rust_spark.kernels.fsst import fsst_compress, fsst_decompress
from orc_rust_spark.stripes import decode_stripe, encode_stripe


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_roundtrip_random(blob):
    assert fsst_decompress(fsst_compress(blob)) == blob


@settings(max_examples=25, deadline=None)
@given(st.lists(st.sampled_from(["the", "table", "scan", "join", "stream",
                                 "spark", "batch", "a", "zz"]),
                min_size=0, max_size=400))
def test_roundtrip_wordlike(words):
    blob = " ".join(words).encode()
    assert fsst_decompress(fsst_compress(blob)) == blob


def test_edges():
    for blob in [b"", b"a", b"ab" * 5000, bytes(range(256)) * 10,
                 b"\xff" * 100, b"\x00" * 1000]:
        assert fsst_decompress(fsst_compress(blob)) == blob


def test_text_ratio():
    rng = np.random.default_rng(0)
    words = np.array(["the", "quick", "brown", "fox", "jumps", "over",
                      "lazy", "dog", "stream", "spark"])
    blob = " ".join(rng.choice(words, 5000)).encode()
    comp = fsst_compress(blob)
    assert len(comp) * 2 < len(blob)  # at least 2x on word-repetitive text


def test_stripe_selects_fsst_for_text():
    rng = np.random.default_rng(1)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon"])
    texts = [" ".join(rng.choice(words, 40)) for _ in range(500)]
    batch = pa.record_batch([pa.array(texts)], names=["text"])
    blob = encode_stripe(batch)
    assert b'"text"' not in blob  # header is binary, just sanity
    rb = decode_stripe(blob)
    assert rb.column("text").to_pylist() == texts
    assert len(blob) * 2 < batch.nbytes
