"""String/Binary codecs: direct (DATA + LENGTH) and dictionary
(DICTIONARY_DATA + LENGTH + DATA indices).

Direct mirrors the reference writer `src/writer/column.rs:261-391`
(DATA = concatenated UTF-8 bytes, LENGTH = RLEv2-unsigned lengths) and
reader `src/array_decoder/string.rs:90-180`.

Dictionary mirrors the reference *read* contract
(`src/array_decoder/string.rs:51-84,182-221`): DATA = RLEv2-unsigned
indices into a lexicographically sorted dictionary, LENGTH =
RLEv2-unsigned dictionary-entry lengths, DICTIONARY_DATA = concatenated
entries.  The reference has no dictionary encoder (`src/writer/mod.rs:60-93`
only emits Direct); the encode side here is ours, producing streams its
reader contract accepts.
"""

from __future__ import annotations

import numpy as np

from .rle_v2 import rle_v2_decode, rle_v2_encode


def string_direct_encode(values: list[bytes]) -> tuple[bytes, bytes]:
    """-> (data_stream, length_stream)."""
    data = b"".join(values)
    lengths = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    return data, rle_v2_encode(lengths, signed=False)


def string_direct_decode(data, length_stream, n: int) -> list[bytes]:
    lengths = rle_v2_decode(length_stream, n, signed=False)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mv = memoryview(data)
    return [bytes(mv[offsets[i] : offsets[i + 1]]) for i in range(n)]


def string_dict_encode(values: list[bytes]) -> tuple[bytes, bytes, bytes]:
    """-> (index_stream, dict_length_stream, dictionary_data).

    Dictionary entries are sorted (ORC spec; noted at `string.rs:205-207`).
    """
    arr = np.array(values, dtype=object)
    uniq, inverse = np.unique(arr, return_inverse=True)
    index_stream = rle_v2_encode(inverse.astype(np.int64), signed=False)
    dict_blob = b"".join(uniq)
    lengths = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
    return index_stream, rle_v2_encode(lengths, signed=False), dict_blob


def string_dict_decode(index_stream, dict_length_stream, dict_blob, n: int, dict_size: int) -> list[bytes]:
    lengths = rle_v2_decode(dict_length_stream, dict_size, signed=False)
    offsets = np.zeros(dict_size + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mv = memoryview(dict_blob)
    entries = [bytes(mv[offsets[i] : offsets[i + 1]]) for i in range(dict_size)]
    indices = rle_v2_decode(index_stream, n, signed=False)
    return [entries[i] for i in indices]
