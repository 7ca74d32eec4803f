#!/usr/bin/env python3
"""Round-start driver-contract smoke: verify __spark_entry__ imports
and runs under a BARE SparkSession (the driver does not use
build_spark), that queries()/oracle_sql() are consistent, and that
entry() yields rows with a stable schema. Run this FIRST each round —
round 4 was lost to an un-diagnosed session stall, and an import or
API break in the entry point is the cheapest thing to rule out.

Usage: python scripts/smoke_entry.py   (exit 0 = contract intact)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t0 = time.time()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    extra = [n for n in oracles if n not in qs]
    if extra:
        print(f"FAIL oracle_sql keys without queries(): {extra}")
        return 1
    no_oracle = [n for n in qs if n not in oracles]
    print(f"queries: {len(qs)}, oracles: {len(oracles)}, rows-only: {no_oracle}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema {[f.name for f in df.schema.fields]}")
    spark.stop()
    print(f"SMOKE-OK ({time.time() - t0:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
