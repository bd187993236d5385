"""ORC RLEv1 integer codec.

Decode mirrors `src/encoding/integer/rle_v1.rs:53-147`: header byte >= 0
means a run of (header+3) values from a base varint stepped by an i8
delta; a negative header means |header| literal varints.

Encode is an exact port of the reference state machine
(`rle_v1.rs:278-345`).  The reference's ORC writer never emits RLEv1
(`src/writer/stripe.rs:173-189` always chooses DirectV2), so this codec
is off the hot path — a plain value loop is acceptable here.
"""

from __future__ import annotations

import numpy as np

from .util import (
    read_varint_zigzagged,
    write_varint_zigzagged,
)

MIN_RUN_LENGTH = 3
MAX_RUN_LENGTH = 127 + MIN_RUN_LENGTH
MAX_LITERAL_LENGTH = 128


def _write_run(out: bytearray, value: int, delta: int, length: int, signed: bool) -> None:
    out.append(length - 3)
    out.append(delta & 0xFF)
    write_varint_zigzagged(out, value, signed)


def _write_literals(out: bytearray, lits: list[int], signed: bool) -> None:
    out.append((256 - len(lits)) & 0xFF)
    for lit in lits:
        write_varint_zigzagged(out, lit, signed)


def rle_v1_encode(values: np.ndarray, signed: bool = True) -> bytes:
    out = bytearray()
    state = 0  # 0 empty, 1 literal, 2 run
    buf: list[int] = []
    run_value = 0
    run_delta = 0
    run_length = 0
    for value in np.asarray(values, dtype=np.int64).tolist():
        if state == 0:
            buf = [value]
            state = 1
        elif state == 1:
            buf.append(value)
            length = len(buf)
            delta = value - buf[length - 2]
            if (
                length >= MIN_RUN_LENGTH
                and -128 <= delta <= 127
                and delta == buf[length - 2] - buf[length - 3]
            ):
                if length > MIN_RUN_LENGTH:
                    _write_literals(out, buf[: length - MIN_RUN_LENGTH], signed)
                run_value = buf[length - MIN_RUN_LENGTH]
                run_delta = delta
                run_length = MIN_RUN_LENGTH
                state = 2
            elif length == MAX_LITERAL_LENGTH:
                _write_literals(out, buf, signed)
                state = 0
        else:
            if run_value + run_delta * run_length == value:
                run_length += 1
                if run_length == MAX_RUN_LENGTH:
                    _write_run(out, run_value, run_delta, run_length, signed)
                    state = 0
            else:
                _write_run(out, run_value, run_delta, run_length, signed)
                buf = [value]
                state = 1
    if state == 1:
        _write_literals(out, buf, signed)
    elif state == 2:
        _write_run(out, run_value, run_delta, run_length, signed)
    return bytes(out)


def rle_v1_decode(buf, n: int, signed: bool = True,
                  exact: bool = True) -> np.ndarray:
    buf = memoryview(buf)
    # +130 slack: with exact=False the final run may overshoot n (a
    # row-group slice of an externally written stream ends mid-run)
    out = np.empty(n + 130, dtype=np.int64)
    got = 0
    pos = 0
    while got < n:
        header = buf[pos]
        pos += 1
        if header >= 0x80:
            length = 0x100 - header
            for _ in range(length):
                val, pos = read_varint_zigzagged(buf, pos, signed)
                out[got] = val
                got += 1
        else:
            length = header + 3
            delta = buf[pos]
            pos += 1
            if delta >= 0x80:
                delta -= 0x100
            base, pos = read_varint_zigzagged(buf, pos, signed)
            out[got : got + length] = base + delta * np.arange(length, dtype=np.int64)
            got += length
    if exact and got != n:
        raise ValueError(f"RLEv1 decoded {got}, expected {n}")
    return out[:n]
