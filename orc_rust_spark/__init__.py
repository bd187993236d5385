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

__version__ = "0.1.0"
