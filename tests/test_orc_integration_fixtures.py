"""Parity sweep over the reference's INTEGRATION fixture corpus
(`/root/reference/tests/integration/data/*.orc`) — a second,
independent set beyond the 17 basic fixtures of `test_orc_interop.py`:
v0.11 files (RLEv1 timestamps/decimals), legacy unlimited decimals,
Java-written unions with PRESENT, pre-1900/post-2038 dates, row-index
files, and bloom-filter files.  Every fixture both readers can open
must decode value-identical (union columns compared at tag-selected
slots — sparse-union don't-care slots are undefined)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

po = pytest.importorskip("pyarrow.orc")

from orc_rust_spark.sources.orc_reader import read_orc

DATA = "/root/reference/tests/integration/data"

# codecs whose libraries are absent from this image (import-guarded in
# kernels/compression.py) or formats out of scope (ORCv2 preview)
SKIP = {
    "decimal64_v2.orc": "ORCv2 preview format (UNSTABLE-PRE-2.0)",
    "decimal64_v2_cplusplus.orc": "ORCv2 preview format (UNSTABLE-PRE-2.0)",
}

FIXTURES = sorted(os.path.basename(f)
                  for f in glob.glob(os.path.join(DATA, "*.orc")))


@pytest.mark.skipif(not os.path.isdir(DATA), reason="fixtures unavailable")
@pytest.mark.parametrize("name", FIXTURES)
def test_integration_fixture_parity(name):
    if name in SKIP:
        pytest.skip(SKIP[name])
    path = os.path.join(DATA, name)
    try:
        ext = po.ORCFile(path).read()
    except Exception as e:
        pytest.skip(f"pyarrow cannot read it: {type(e).__name__}")
    ours = read_orc(path)
    assert ours.num_rows == ext.num_rows
    for c in ext.column_names:
        a = ours.column(c).combine_chunks()
        b = ext.column(c).combine_chunks()
        if pa.types.is_union(a.type):
            ta = np.asarray(a.type_codes)
            tb = np.asarray(b.type_codes)
            assert ta.tolist() == tb.tolist(), f"{name}:{c} tags"
            for ci in range(a.type.num_fields):
                av = a.field(ci).to_pylist()
                bv = b.field(ci).to_pylist()
                sel = np.nonzero(ta == ci)[0]
                assert [av[i] for i in sel] == [bv[i] for i in sel], \
                    f"{name}:{c} child {ci}"
            continue
        if a.type != b.type:
            a = a.cast(b.type)
        assert a == b, f"{name}:{c} values differ"
