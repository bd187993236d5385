"""RowSelection algebra + selection-aware decode — behavioral mirror of
`src/row_selection.rs:31-463` and its e2e matrix
(`tests/row_selection/main.rs`), at row-group decode granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.orc as po
import pytest

from orc_rust_spark.sources.row_selection import RowSelection, RowSelector


class TestAlgebra:
    def test_doc_example(self):
        # the reference's module doc example
        sel = RowSelection([RowSelector.skip_(100), RowSelector.select(50),
                            RowSelector.skip_(200)])
        assert sel.row_count() == 350
        assert sel.selected_row_count() == 50
        assert sel.skipped_row_count() == 300
        assert sel.selects_any()

    def test_invariants_merge_and_drop_zero(self):
        sel = RowSelection([RowSelector.skip_(10), RowSelector.skip_(5),
                            RowSelector.select(0), RowSelector.select(3)])
        assert sel.selectors == [RowSelector.skip_(15), RowSelector.select(3)]

    def test_from_filters_roundtrip(self):
        rng = np.random.default_rng(3)
        f = rng.random(1000) < 0.3
        sel = RowSelection.from_filters(f)
        np.testing.assert_array_equal(sel.mask(), f)
        # multiple chunks concatenate
        sel2 = RowSelection.from_filters([f[:400], f[400:]])
        assert sel2 == sel

    def test_from_consecutive_ranges(self):
        sel = RowSelection.from_consecutive_ranges([(2, 5), (7, 9)], 12)
        assert sel.selectors == [
            RowSelector.skip_(2), RowSelector.select(3), RowSelector.skip_(2),
            RowSelector.select(2), RowSelector.skip_(3)]

    def test_from_row_group_filter(self):
        # the reference's doc example: skip/select/skip 10k each
        sel = RowSelection.from_row_group_filter([False, True, False],
                                                 10_000, 30_000)
        assert sel.row_count() == 30_000
        assert sel.selected_row_count() == 10_000
        # trailing uncovered rows become skip
        sel = RowSelection.from_row_group_filter([True], 10_000, 12_000)
        assert sel.selectors == [RowSelector.select(10_000),
                                 RowSelector.skip_(2_000)]

    def test_split_off(self):
        sel = RowSelection([RowSelector.skip_(10), RowSelector.select(10),
                            RowSelector.skip_(10)])
        front = sel.split_off(15)
        assert front.selectors == [RowSelector.skip_(10),
                                   RowSelector.select(5)]
        assert sel.selectors == [RowSelector.select(5),
                                 RowSelector.skip_(10)]
        # splitting past the end takes everything
        rest = sel.split_off(1000)
        assert rest.row_count() == 15 and sel.row_count() == 0

    def test_slice_non_mutating(self):
        sel = RowSelection.from_filters(
            np.array([0, 1, 1, 0, 1, 0, 0, 1], dtype=bool))
        before = list(sel.selectors)
        part = sel.slice(2, 6)
        np.testing.assert_array_equal(part.mask(),
                                      [True, False, True, False])
        assert sel.selectors == before

    def test_and_then(self):
        # first selects rows 10..20 and 30..35 (15 rows); second keeps
        # the 5th..12th of those
        first = RowSelection.from_consecutive_ranges([(10, 20), (30, 35)], 40)
        second = RowSelection.from_consecutive_ranges([(5, 12)], 15)
        out = first.and_then(second)
        exp = np.zeros(40, dtype=bool)
        sel_idx = np.concatenate((np.arange(10, 20), np.arange(30, 35)))
        exp[sel_idx[5:12]] = True
        np.testing.assert_array_equal(out.mask(), exp)

    def test_and_then_length_mismatch(self):
        first = RowSelection.select_all(10)
        with pytest.raises(ValueError):
            first.and_then(RowSelection.select_all(9))

    def test_and_then_randomized(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            a = rng.random(rng.integers(1, 300)) < 0.5
            first = RowSelection.from_filters(a)
            b = rng.random(int(a.sum())) < 0.5
            second = RowSelection.from_filters(b)
            out = first.and_then(second)
            exp = np.zeros(len(a), dtype=bool)
            exp[np.nonzero(a)[0][b]] = True
            np.testing.assert_array_equal(out.mask(len(a)), exp)


class TestSelectionAwareDecode:
    N = 50_000
    STRIDE = 10_000

    @pytest.fixture(scope="class")
    def orc_file(self, tmp_path_factory):
        rng = np.random.default_rng(7)
        t = pa.table({
            "k": pa.array(np.arange(self.N, dtype=np.int64)),
            "v": pa.array(rng.integers(0, 1000, self.N).astype(np.int32)),
            "s": pa.array([f"r{i % 997}" for i in range(self.N)]),
        })
        path = str(tmp_path_factory.mktemp("rs") / "sel.orc")
        po.write_table(t, path, compression="zlib",
                       row_index_stride=self.STRIDE)
        return path, t

    def test_group_skip_and_exact_rows(self, orc_file):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, t = orc_file
        # select rows 31_000..33_000 and 34_500..34_600: only group 3
        sel = RowSelection.from_consecutive_ranges(
            [(31_000, 33_000), (34_500, 34_600)], self.N)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["groups_decoded"] == 1
        assert got.num_rows == 2_100  # selection is EXACT
        exp = pa.concat_tables([t.slice(31_000, 2_000),
                                t.slice(34_500, 100)])
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                exp.column(c).combine_chunks()), c

    def test_scattered_selection(self, orc_file):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, t = orc_file
        rng = np.random.default_rng(13)
        mask = rng.random(self.N) < 0.001
        mask[: 2 * self.STRIDE] = False  # first two groups empty
        sel = RowSelection.from_filters(mask)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["groups_decoded"] <= 3
        exp = t.filter(pa.array(mask))
        assert got.num_rows == exp.num_rows
        assert got.column("k").combine_chunks().equals(
            exp.column("k").combine_chunks())

    def test_selection_composes_with_predicate(self, orc_file):
        from orc_rust_spark.sources.orc_reader import read_orc
        from orc_rust_spark.sources.predicate import Predicate
        path, t = orc_file
        sel = RowSelection.from_consecutive_ranges([(5_000, 45_000)], self.N)
        pred = Predicate.lt("k", 15_000)
        got = read_orc(path, predicate=pred, row_selection=sel)
        # selection exact; predicate conservative (group granularity)
        got = got.filter(pc.field("k") < 15_000)
        exp = t.slice(5_000, 10_000)
        assert got.column("k").combine_chunks().equals(
            exp.column("k").combine_chunks())

    def test_empty_selection(self, orc_file):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, t = orc_file
        got = read_orc(path, row_selection=RowSelection.skip_all(self.N))
        assert got.num_rows == 0
        assert got.schema.names == t.column_names

    def test_wrong_length_raises(self, orc_file):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, _ = orc_file
        with pytest.raises(ValueError):
            read_orc(path, row_selection=RowSelection.select_all(7))

    def test_our_writer_files(self, tmp_path):
        import pyarrow.parquet as pq

        from orc_rust_spark import write_orc
        from orc_rust_spark.sources.orc_reader import read_orc
        src = pq.read_table("/root/testdata/sf0.001/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
        path = str(tmp_path / "ours.orc")
        write_orc(path, src, compression=1, row_index_stride=500)
        n = src.num_rows
        sel = RowSelection.from_consecutive_ranges([(n // 2, n // 2 + 40)], n)
        got = read_orc(path, row_selection=sel)
        exp = src.slice(n // 2, 40)
        assert got.column("o_orderkey").combine_chunks().equals(
            exp.column("o_orderkey").combine_chunks())


class TestDistributedSelection:
    """`read_orc_spark(row_selection=...)`: the driver splits a
    dataset-level selection per file (selector runs, not rows); each
    (file, stripe-subset) task slices its own file's selection."""

    N_FILE = 6_000

    @pytest.fixture(scope="class")
    def orc_dir(self, tmp_path_factory):
        from orc_rust_spark import write_orc
        d = tmp_path_factory.mktemp("dist_sel")
        tables = []
        for p in range(3):
            base = p * self.N_FILE
            t = pa.table({
                "k": pa.array(np.arange(base, base + self.N_FILE,
                                        dtype=np.int64)),
                "v": pa.array((np.arange(self.N_FILE) % 701)
                              .astype(np.int32)),
            })
            write_orc(str(d / f"part-{p:05d}.orc"), t, compression=1,
                      row_index_stride=1_000)
            tables.append(t)
        return str(d), pa.concat_tables(tables)

    def test_ranges_across_files(self, spark, orc_dir):
        from orc_rust_spark.sources.orc_spark import read_orc_spark
        path, full = orc_dir
        total = full.num_rows
        # ranges inside file 0, straddling the 0/1 boundary, and the tail
        ranges = [(100, 150), (5_900, 6_200), (17_990, total)]
        sel = RowSelection.from_consecutive_ranges(ranges, total)
        got = read_orc_spark(spark, path, row_selection=sel) \
            .orderBy("k").collect()
        exp = sorted(k for a, b in ranges for k in range(a, b))
        assert [r["k"] for r in got] == exp
        assert [r["v"] for r in got] == \
            [(k % self.N_FILE) % 701 for k in exp]

    def test_file_fully_skipped(self, spark, orc_dir):
        from orc_rust_spark.sources.orc_spark import read_orc_spark
        path, full = orc_dir
        total = full.num_rows
        # middle file selects nothing at all
        sel = RowSelection.from_consecutive_ranges(
            [(0, 10), (2 * self.N_FILE, 2 * self.N_FILE + 10)], total)
        got = read_orc_spark(spark, path, row_selection=sel) \
            .orderBy("k").collect()
        assert [r["k"] for r in got] == list(range(10)) + \
            list(range(2 * self.N_FILE, 2 * self.N_FILE + 10))

    def test_wrong_total_raises(self, spark, orc_dir):
        from orc_rust_spark.sources.orc_spark import read_orc_spark
        path, full = orc_dir
        with pytest.raises(ValueError):
            read_orc_spark(spark, path,
                           row_selection=RowSelection.select_all(7))


class TestInGroupSkip:
    """Round-4 refinement: the decode window of a partially selected
    group is trimmed to [first selected row, last selected row] — the
    reference's in-group `skip_rows` (`src/array_decoder/mod.rs:
    301-364`).  Leading rows ride the decoders' value seek when every
    projected column is a PRESENT-less RLE value-per-row stream;
    trailing rows are never decoded for any column shape."""

    N = 40_000
    STRIDE = 10_000

    @pytest.fixture(scope="class")
    def int_orc(self, tmp_path_factory):
        rng = np.random.default_rng(11)
        t = pa.table({
            "k": pa.array(np.arange(self.N, dtype=np.int64)),
            "v": pa.array(rng.integers(-500, 500, self.N).astype(np.int32)),
        })
        path = str(tmp_path_factory.mktemp("igs") / "ints.orc")
        po.write_table(t, path, compression="zlib",
                       row_index_stride=self.STRIDE)
        return path, t

    def test_lead_and_tail_trim_external(self, int_orc):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, t = int_orc
        # rows 23_000..24_000 of group 2: lead 3_000, tail 6_000
        sel = RowSelection.from_consecutive_ranges([(23_000, 24_000)], self.N)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["groups_decoded"] == 1
        # pyarrow's writer does not flush runs at group boundaries, so
        # the trim composes with the mid-run seek state
        assert stats["rows_decoded"] == 1_000
        exp = t.slice(23_000, 1_000)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                exp.column(c).combine_chunks()), c

    def test_scattered_rows_inside_group(self, int_orc):
        from orc_rust_spark.sources.orc_reader import read_orc
        path, t = int_orc
        rng = np.random.default_rng(5)
        mask = np.zeros(self.N, dtype=bool)
        picks = rng.choice(np.arange(12_000, 18_000), 37, replace=False)
        mask[picks] = True
        sel = RowSelection.from_filters(mask)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        lo, hi = picks.min(), picks.max()
        assert stats["rows_decoded"] == hi - lo + 1
        exp = t.filter(pa.array(mask))
        assert got.column("k").combine_chunks().equals(
            exp.column("k").combine_chunks())
        assert got.column("v").combine_chunks().equals(
            exp.column("v").combine_chunks())

    def test_tail_only_trim_with_strings(self, tmp_path):
        from orc_rust_spark.sources.orc_reader import read_orc
        # a unique-valued string column decodes direct (no dictionary):
        # leading seek unsupported -> masked, tail still trimmed
        n = 20_000
        t = pa.table({
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "s": pa.array([f"row-{i:08d}-{i * 37 % 9973}" for i in range(n)]),
        })
        path = str(tmp_path / "str.orc")
        po.write_table(t, path, compression="uncompressed",
                       row_index_stride=5_000)
        sel = RowSelection.from_consecutive_ranges([(6_000, 6_050)], n)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["rows_decoded"] <= 6_050 - 5_000
        exp = t.slice(6_000, 50)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                exp.column(c).combine_chunks()), c

    def test_nulls_fall_back_to_mask(self, tmp_path):
        from orc_rust_spark.sources.orc_reader import read_orc
        rng = np.random.default_rng(23)
        n = 20_000
        vals = rng.integers(0, 10_000, n).astype(np.int64)
        arr = pa.array(vals, mask=rng.random(n) < 0.1)
        t = pa.table({"x": arr})
        path = str(tmp_path / "nulls.orc")
        po.write_table(t, path, compression="zlib", row_index_stride=5_000)
        sel = RowSelection.from_consecutive_ranges([(7_000, 7_200)], n)
        got = read_orc(path, row_selection=sel)
        assert got.column("x").combine_chunks().equals(
            t.slice(7_000, 200).column("x").combine_chunks())

    def test_our_writer_in_group_trim(self, tmp_path):
        from orc_rust_spark import write_orc
        from orc_rust_spark.sources.orc_reader import read_orc
        rng = np.random.default_rng(31)
        n = 8_000
        t = pa.table({
            "a": pa.array(np.cumsum(rng.integers(0, 3, n)).astype(np.int64)),
            "b": pa.array(rng.integers(0, 50, n).astype(np.int32)),
        })
        path = str(tmp_path / "ours.orc")
        write_orc(path, t, compression=1, row_index_stride=1_000)
        sel = RowSelection.from_consecutive_ranges([(2_300, 2_310)], n)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["rows_decoded"] == 10
        exp = t.slice(2_300, 10)
        for c in t.column_names:
            assert got.column(c).combine_chunks().equals(
                exp.column(c).combine_chunks()), c

    def test_per_group_null_gate(self, tmp_path):
        from orc_rust_spark.sources.orc_reader import read_orc
        # nulls only in group 0: a selection inside group 1 still gets
        # the leading seek (per-group has_null gate); one inside group 0
        # falls back to the mask — both exact
        n = 10_000
        vals = np.arange(n, dtype=np.int64)
        mask = np.zeros(n, dtype=bool)
        mask[:100] = True
        t = pa.table({"x": pa.array(vals, mask=mask)})
        path = str(tmp_path / "gnulls.orc")
        po.write_table(t, path, compression="zlib", row_index_stride=5_000)
        for (a, b), trimmed in [((7_000, 7_020), 20),
                                ((2_000, 2_020), None)]:
            sel = RowSelection.from_consecutive_ranges([(a, b)], n)
            stats: dict = {}
            got = read_orc(path, row_selection=sel, _stats=stats)
            if trimmed is not None:
                assert stats["rows_decoded"] == trimmed, (a, b)
            assert got.column("x").combine_chunks().equals(
                t.slice(a, b - a).column("x").combine_chunks()), (a, b)

    def test_timestamp_two_stream_seek(self, tmp_path):
        from orc_rust_spark.sources.orc_reader import read_orc
        rng = np.random.default_rng(41)
        n = 12_000
        secs = rng.integers(1_500_000_000, 1_700_000_000, n)
        nanos = rng.integers(0, 1_000_000_000, n)
        ts = (secs * 10**9 + nanos).astype("datetime64[ns]")
        t = pa.table({"t": pa.array(ts)})
        path = str(tmp_path / "ts.orc")
        po.write_table(t, path, compression="zlib", row_index_stride=4_000)
        sel = RowSelection.from_consecutive_ranges([(5_500, 5_600)], n)
        stats: dict = {}
        got = read_orc(path, row_selection=sel, _stats=stats)
        assert stats["rows_decoded"] == 100
        assert got.column("t").combine_chunks().equals(
            t.slice(5_500, 100).column("t").combine_chunks())
