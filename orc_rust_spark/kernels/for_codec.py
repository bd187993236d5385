"""Frame-of-reference (FoR), plain bit-packing, and integer dictionary
codecs for int32/int64 token streams.

These are required by the engine's north rule but absent from the
reference: FoR is the degenerate no-patch case of ORC patched-base
(`src/encoding/integer/rle_v2/patched_base.rs:219-276` with an empty
patch list), and integer dictionary reuses the string-dictionary stream
shape (`src/array_decoder/string.rs:182-221`) with an RLEv2 value table.
Formats are ours (documented below); correctness is defined by
round-trip tests.

FoR stream layout:
    varint  n               (value count)
    varint  zigzag(base)    (frame of reference = min value)
    u8      width           (bit width 0..64; 0 => all values equal base)
    packed  n values at `width` bits, MSB-first (bitpack.py)

Integer dictionary layout:
    varint  n, varint dict_size
    RLEv2-signed   dictionary values (sorted ascending)
    RLEv2-unsigned indices
"""

from __future__ import annotations

import numpy as np

from .bitpack import pack_ints, unpack_ints
from .rle_v2 import rle_v2_decode, rle_v2_encode
from .util import (
    I64,
    U64,
    bits_used_scalar,
    read_varint_zigzagged,
    write_varint_zigzagged,
)


def for_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=I64)
    out = bytearray()
    write_varint_zigzagged(out, len(v), False)
    if len(v) == 0:
        return bytes(out)
    base = int(v.min())
    write_varint_zigzagged(out, base, True)
    shifted = (v.astype(U64) - U64(base & 0xFFFFFFFFFFFFFFFF))  # wraps correctly
    width = bits_used_scalar(int(shifted.max()))
    out.append(width)
    if width:
        out.extend(pack_ints(shifted, width))
    return bytes(out)


def for_decode(buf) -> np.ndarray:
    buf = memoryview(buf)
    n, pos = read_varint_zigzagged(buf, 0, False)
    if n == 0:
        return np.empty(0, dtype=I64)
    base, pos = read_varint_zigzagged(buf, pos, True)
    width = buf[pos]
    pos += 1
    if width == 0:
        return np.full(n, base, dtype=I64)
    shifted, pos = unpack_ints(buf, pos, n, width)
    return (shifted + U64(base & 0xFFFFFFFFFFFFFFFF)).view(I64)


def bitpack_encode(values: np.ndarray) -> bytes:
    """Plain bit-packing of non-negative ints: varint n, u8 width, packed."""
    v = np.ascontiguousarray(values, dtype=I64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack codec requires non-negative values")
    out = bytearray()
    write_varint_zigzagged(out, len(v), False)
    if len(v) == 0:
        return bytes(out)
    width = max(bits_used_scalar(int(v.max())), 1)
    out.append(width)
    out.extend(pack_ints(v.astype(U64), width))
    return bytes(out)


def bitpack_decode(buf) -> np.ndarray:
    buf = memoryview(buf)
    n, pos = read_varint_zigzagged(buf, 0, False)
    if n == 0:
        return np.empty(0, dtype=I64)
    width = buf[pos]
    pos += 1
    vals, pos = unpack_ints(buf, pos, n, width)
    return vals.view(I64).copy()


def int_dict_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=I64)
    uniq, inverse = np.unique(v, return_inverse=True)
    out = bytearray()
    write_varint_zigzagged(out, len(v), False)
    write_varint_zigzagged(out, len(uniq), False)
    dict_stream = rle_v2_encode(uniq, signed=True)
    idx_stream = rle_v2_encode(inverse.astype(I64), signed=False)
    write_varint_zigzagged(out, len(dict_stream), False)
    out.extend(dict_stream)
    out.extend(idx_stream)
    return bytes(out)


def int_dict_decode(buf) -> np.ndarray:
    buf = memoryview(buf)
    n, pos = read_varint_zigzagged(buf, 0, False)
    dict_size, pos = read_varint_zigzagged(buf, pos, False)
    dict_len, pos = read_varint_zigzagged(buf, pos, False)
    if n == 0:
        return np.empty(0, dtype=I64)
    uniq = rle_v2_decode(buf[pos : pos + dict_len], dict_size, signed=True)
    indices = rle_v2_decode(buf[pos + dict_len :], n, signed=False)
    return uniq[indices]
