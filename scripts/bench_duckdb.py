#!/usr/bin/env python3
"""DuckDB side of the bench comparison (BASELINE.md tables): runs the
oracle SQL of every headline query in bench.py against the same parquet
files, same methodology (full warmup pass, then per-query min of two
timed passes + tiebreak pass when they disagree >50%). Prints the same
one-line JSON shape as bench.py.

Usage: SPARK_GRAFT_SF_DIR=/root/repo/.scratch/sf1 python scripts/bench_duckdb.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    threads = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS FROM '{p}'")

    names = [n for n in HEADLINE if n in oracles]
    missing = [n for n in HEADLINE if n not in oracles]
    if missing:
        print(f"no oracle (skipped): {missing}", file=sys.stderr)

    def run(name: str) -> float:
        t0 = time.time()
        con.execute(oracles[name]).fetchall()
        return time.time() - t0

    for name in names:
        run(name)

    timings: dict[str, float] = {}
    for name in names:
        a, b = run(name), run(name)
        best = min(a, b)
        if abs(a - b) > 0.5 * best:
            best = min(best, run(name))
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "duckdb_oracle_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
