"""Float/Double direct codec — raw IEEE-754 little-endian, no RLE.

Mirrors `src/encoding/float.rs:39-111`.
"""

from __future__ import annotations

import numpy as np


def float_encode(values: np.ndarray) -> bytes:
    """float32/float64 array -> raw little-endian bytes."""
    v = np.asarray(values)
    if v.dtype not in (np.float32, np.float64):
        raise TypeError(f"float codec requires float32/float64, got {v.dtype}")
    return v.astype(v.dtype.newbyteorder("<")).tobytes()


def float_decode(buf, n: int, dtype=np.float64) -> np.ndarray:
    dt = np.dtype(dtype).newbyteorder("<")
    return np.frombuffer(buf, dtype=dt, count=n).astype(dtype)
