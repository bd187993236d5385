"""orc_rust_spark — a PySpark-native columnar lightweight-compression engine.

From-scratch reimplementation of the encoding surface of the reference
ORC reader/writer (progval/orc-rust, studied at /root/reference) as
vectorized numpy/Arrow kernels driven by Spark DataFrames:

- ``kernels/``   pure-numpy codecs (ORC RLEv1/RLEv2, byte-RLE, boolean
                 bit-RLE, varint/zigzag, bit-packing, dictionary, FoR,
                 FSST, float direct) — no Spark dependency.
- ``operators/`` Spark-side encode/decode passes (applyInPandas /
                 mapInArrow) plus training-data ops (dedup, similarity,
                 text stats).
- ``sources/``   stripe blob store + lineage manifest (read/write,
                 idempotent resume).
- ``functions/`` Spark column helpers (tokenizer, stats sampling).
- ``plans/``     pipeline orchestration: partition → sample → encode →
                 manifest → verify, codec auto-selection routing.
- ``streaming/`` structured-streaming encode path.

Design stance (SURVEY.md §7): this is NOT a port — Spark/Catalyst
supplies scan, pruning, shuffle and aggregation; the custom code is the
codec kernels and the block-level codec decision tree, which must match
the reference bit-for-bit (SURVEY.md §4.3, §4.4).
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy public API (keeps bare `import orc_rust_spark` Spark-free
    for kernel-only use).  Reference-surface mapping:

    orc-rust `ArrowReader`  -> `read_orc` (Arrow) / `read_orc_spark`
    orc-rust `ArrowWriter`  -> `write_orc` / `OrcWriter` / `write_orc_spark`
    `read_metadata`         -> `read_metadata` / `orc_file_stats`
    `Predicate` (fork)      -> `Predicate` (stripe + row-group skip)
    `RowSelection` (fork)   -> `RowSelection` (exact skip/select runs)
    stripe engine           -> `encode_stripe` / `decode_stripe` (+
                               `encode_stripe_rowgroups` row-group index)
    CLI bins                -> python -m orc_rust_spark.sources.orc_tools
    """
    lazy = {
        "Predicate": ("orc_rust_spark.sources.predicate", "Predicate"),
        "ColStats": ("orc_rust_spark.sources.predicate", "ColStats"),
        "RowSelection": ("orc_rust_spark.sources.row_selection",
                         "RowSelection"),
        "RowSelector": ("orc_rust_spark.sources.row_selection",
                        "RowSelector"),
        "read_orc": ("orc_rust_spark.sources.orc_reader", "read_orc"),
        "read_metadata": ("orc_rust_spark.sources.orc_reader", "read_metadata"),
        "write_orc": ("orc_rust_spark.sources.orc_writer", "write_orc"),
        "OrcWriter": ("orc_rust_spark.sources.orc_writer", "OrcWriter"),
        "read_orc_spark": ("orc_rust_spark.sources.orc_spark", "read_orc_spark"),
        "write_orc_spark": ("orc_rust_spark.sources.orc_spark", "write_orc_spark"),
        "orc_file_stats": ("orc_rust_spark.sources.orc_spark", "orc_file_stats"),
        "encode_stripe": ("orc_rust_spark.stripes", "encode_stripe"),
        "decode_stripe": ("orc_rust_spark.stripes", "decode_stripe"),
        "encode_stripe_rowgroups": ("orc_rust_spark.stripes",
                                    "encode_stripe_rowgroups"),
        "decode_stripe_rowgroups": ("orc_rust_spark.stripes",
                                    "decode_stripe_rowgroups"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'orc_rust_spark' has no attribute {name!r}")
