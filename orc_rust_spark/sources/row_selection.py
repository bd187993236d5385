"""Row-selection algebra — behavioral mirror of the reference fork's
headline feature (`src/row_selection.rs:31-463`): an alternating
skip/select run-list over a row domain, with the same constructors
(`from_filters`, `from_consecutive_ranges`, `select_all`, `skip_all`,
`from_row_group_filter`) and the same algebra (`split_off` front-split,
`and_then` composition where the second selection indexes the rows
selected by the first).

Applied by `sources.orc_reader.read_orc(row_selection=...)`: whole
stripes and row groups whose slice of the selection selects nothing are
skipped without touching their stream bytes (the mid-run seek state
added in round 4 makes group slicing exact for any writer), and a
partially selected group's decode window is trimmed to [first selected
row, last selected row] — the reference's in-group `skip_rows`
(`src/array_decoder/mod.rs:301-364`).  Trailing rows are never decoded
for any column shape; leading rows ride the decoders' value seek when
every projected column is an RLE value-per-row stream that is
PRESENT-less (or provably null-free in that group), falling back to a
post-decode mask otherwise — results identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class RowSelector:
    """`row_count` rows, skipped when `skip` else selected
    (`src/row_selection.rs:32-56`)."""

    row_count: int
    skip: bool

    @classmethod
    def select(cls, row_count: int) -> "RowSelector":
        return cls(row_count, False)

    @classmethod
    def skip_(cls, row_count: int) -> "RowSelector":
        return cls(row_count, True)


class RowSelection:
    """Invariants (as the reference's): no zero-count selectors, and
    consecutive selectors alternate skip/select."""

    def __init__(self, selectors: list[RowSelector] | None = None):
        self.selectors: list[RowSelector] = []
        for s in selectors or []:
            self._push(s.row_count, s.skip)

    def _push(self, row_count: int, skip: bool) -> None:
        if row_count <= 0:
            return
        if self.selectors and self.selectors[-1].skip == skip:
            last = self.selectors[-1]
            self.selectors[-1] = RowSelector(last.row_count + row_count, skip)
        else:
            self.selectors.append(RowSelector(row_count, skip))

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_filters(cls, filters) -> "RowSelection":
        """One or more boolean arrays (no nulls), concatenated
        (`src/row_selection.rs:105-156`)."""
        if isinstance(filters, np.ndarray):
            filters = [filters]
        out = cls()
        for f in filters:
            f = np.asarray(f, dtype=bool)
            if len(f) == 0:
                continue
            change = np.nonzero(f[1:] != f[:-1])[0] + 1
            bounds = np.concatenate(([0], change, [len(f)]))
            for a, b in zip(bounds[:-1], bounds[1:]):
                out._push(int(b - a), not bool(f[a]))
        return out

    @classmethod
    def from_consecutive_ranges(cls, ranges, total_rows: int) -> "RowSelection":
        """Sorted non-overlapping [start, stop) ranges over `total_rows`
        (`src/row_selection.rs:158-200`)."""
        out = cls()
        pos = 0
        for start, stop in ranges:
            if start > pos:
                out._push(start - pos, True)
            out._push(stop - start, False)
            pos = stop
        if pos < total_rows:
            out._push(total_rows - pos, True)
        return out

    @classmethod
    def select_all(cls, row_count: int) -> "RowSelection":
        return cls([RowSelector.select(row_count)])

    @classmethod
    def skip_all(cls, row_count: int) -> "RowSelection":
        return cls([RowSelector.skip_(row_count)])

    @classmethod
    def from_row_group_filter(cls, row_group_filter, rows_per_group: int,
                              total_rows: int) -> "RowSelection":
        """Per-group keep flags -> group-granular selection
        (`src/row_selection.rs:348-390`)."""
        flags = list(row_group_filter)
        if not flags:
            return cls.skip_all(total_rows)
        out = cls()
        for keep in flags:
            out._push(rows_per_group, not keep)
        covered = len(flags) * rows_per_group
        if covered < total_rows:
            out._push(total_rows - covered, True)
        return out

    # -- properties --------------------------------------------------------
    def row_count(self) -> int:
        return sum(s.row_count for s in self.selectors)

    def selected_row_count(self) -> int:
        return sum(s.row_count for s in self.selectors if not s.skip)

    def skipped_row_count(self) -> int:
        return sum(s.row_count for s in self.selectors if s.skip)

    def selects_any(self) -> bool:
        return any(not s.skip for s in self.selectors)

    def leading_skip(self) -> int:
        """Rows skipped before the first selected row (the whole domain
        when nothing is selected)."""
        out = 0
        for s in self.selectors:
            if not s.skip:
                break
            out += s.row_count
        return out

    def trailing_skip(self) -> int:
        """Rows skipped after the last selected row."""
        out = 0
        for s in reversed(self.selectors):
            if not s.skip:
                break
            out += s.row_count
        return out

    def mask(self, n: int | None = None) -> np.ndarray:
        """Materialize as a boolean array (padded with skip to n)."""
        total = self.row_count()
        n = total if n is None else n
        out = np.zeros(n, dtype=bool)
        pos = 0
        for s in self.selectors:
            if not s.skip:
                out[pos: pos + s.row_count] = True
            pos += s.row_count
        return out

    # -- algebra -----------------------------------------------------------
    def split_off(self, row_count: int) -> "RowSelection":
        """Remove and return the selection over the FIRST `row_count`
        rows; self keeps the rest (`src/row_selection.rs:278-314`)."""
        front: list[RowSelector] = []
        remaining = row_count
        i = 0
        while i < len(self.selectors) and remaining > 0:
            s = self.selectors[i]
            if s.row_count <= remaining:
                front.append(s)
                remaining -= s.row_count
                i += 1
            else:
                front.append(RowSelector(remaining, s.skip))
                self.selectors[i] = RowSelector(s.row_count - remaining,
                                                s.skip)
                remaining = 0
        del self.selectors[:i]
        return RowSelection(front)

    def slice(self, start: int, stop: int) -> "RowSelection":
        """Non-mutating view of rows [start, stop)."""
        tmp = RowSelection(list(self.selectors))
        tmp.split_off(start)
        return tmp.split_off(stop - start)

    def and_then(self, other: "RowSelection") -> "RowSelection":
        """Logical AND where `other` indexes the rows THIS selection
        selects (`src/row_selection.rs:401-463`)."""
        if other.row_count() != self.selected_row_count():
            raise ValueError(
                "and_then: second selection must cover exactly the rows "
                f"selected by the first ({other.row_count()} != "
                f"{self.selected_row_count()})")
        out = RowSelection()
        second = [[s.row_count, s.skip] for s in other.selectors]
        j = 0
        for a in self.selectors:
            if a.skip:
                out._push(a.row_count, True)
                continue
            left = a.row_count
            while left > 0:
                cnt, skip = second[j]
                take = min(cnt, left)
                out._push(take, skip)
                left -= take
                second[j][0] -= take
                if second[j][0] == 0:
                    j += 1
        return out

    def __eq__(self, other) -> bool:
        return isinstance(other, RowSelection) \
            and self.selectors == other.selectors

    def __repr__(self) -> str:
        return "RowSelection([" + ", ".join(
            f"{'skip' if s.skip else 'select'}({s.row_count})"
            for s in self.selectors) + "])"
