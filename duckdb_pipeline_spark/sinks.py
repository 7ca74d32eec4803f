"""Parquet sinks (SURVEY.md §2.2 K1).

The reference exports exactly one parquet file per batch with a
controlled filename (`rel.write_parquet("<...>/clean_YYYYMMDD_HH.parquet")`,
/root/reference/data_lake_transformer.py:49,68,186-192). Spark's commit
protocol writes a directory of part files; for filename parity we write
to a staging dir, then move the single part file to the target name.

``coalesce(1)`` is correct for batch-sized exports (one hour / one day
of one dataset). For genuinely large outputs use ``write_parquet``
without coalesce — partitioned layout is the scalable path; the
single-file mode exists for reference parity.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Standard partitioned parquet write (directory of part files)."""
    df.write.mode(mode).parquet(path)


def write_single_parquet(df: DataFrame, target_file: str) -> str:
    """Write ``df`` as ONE parquet file at exactly ``target_file``.

    Local-FS implementation (staging dir + rename). On object stores the
    same pattern runs via the Hadoop FileSystem API; the rename is a
    copy on S3 — acceptable for batch-sized exports.
    """
    parent = os.path.dirname(target_file) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix="_staging_", dir=parent)
    try:
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        parts = _glob.glob(os.path.join(staging, "part-*.parquet"))
        if len(parts) != 1:
            raise RuntimeError(f"expected 1 part file, found {parts}")
        if os.path.exists(target_file):
            os.remove(target_file)
        shutil.move(parts[0], target_file)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return target_file
