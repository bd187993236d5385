"""String direct/dictionary + float codec tests."""

import numpy as np
from hypothesis import given, settings, strategies as st

from orc_rust_spark.kernels.float_codec import float_decode, float_encode
from orc_rust_spark.kernels.string_codec import (
    string_dict_decode,
    string_dict_encode,
    string_direct_decode,
    string_direct_encode,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=300))
def test_string_direct_roundtrip(vals):
    data, lens = string_direct_encode(vals)
    assert string_direct_decode(data, lens, len(vals)) == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from([b"abc", b"efgh", b"", b"zz", "é中".encode()]),
                min_size=1, max_size=300))
def test_string_dict_roundtrip(vals):
    idx, dlens, blob = string_dict_encode(vals)
    n_dict = len(set(vals))
    assert string_dict_decode(idx, dlens, blob, len(vals), n_dict) == vals


def test_string_dict_sorted():
    # ORC requires the dictionary blob sorted (string.rs:205-207)
    idx, dlens, blob = string_dict_encode([b"efgh", b"abc"] * 32)
    assert blob == b"abcefgh"


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=64), min_size=1, max_size=200))
def test_float64_roundtrip(vals):
    a = np.array(vals, dtype=np.float64)
    assert (float_decode(float_encode(a), len(a), np.float64) == a).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=False, width=32), min_size=1, max_size=200))
def test_float32_roundtrip(vals):
    a = np.array(vals, dtype=np.float32)
    assert (float_decode(float_encode(a), len(a), np.float32) == a).all()
