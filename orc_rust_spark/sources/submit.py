"""Packaging for spark-submit --py-files and interactive sessions.

``attach(spark)`` zips the orc_rust_spark package and ships it to every
executor via ``sparkContext.addPyFile`` so UDFs can import the package
regardless of the driver's working directory.  For production use the
same zip is what you pass to ``spark-submit --py-files``:

    python -m orc_rust_spark.sources.submit /tmp/orc_rust_spark.zip
    spark-submit --py-files /tmp/orc_rust_spark.zip your_job.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile

_PACKAGE_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the package (sources only) for --py-files; returns the path."""
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "orc_rust_spark_pyfiles.zip")
    base = os.path.dirname(_PACKAGE_ROOT)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(_PACKAGE_ROOT):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, base))
    return dest


_attached = set()


def attach(spark) -> None:
    """Ship the package to executors (idempotent per session)."""
    key = id(spark.sparkContext)
    if key in _attached:
        return
    zip_path = make_pyfiles_zip()
    spark.sparkContext.addPyFile(zip_path)
    _attached.add(key)


if __name__ == "__main__":
    out = make_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
