"""Local mirror of the driver's correctness gate: run every declared
query in Spark AND its oracle SQL in DuckDB, then compare row count,
schema width, and order-insensitive values (columns sorted by name,
rows sorted by all columns — same canonicalization BASELINE.md
describes). Stricter than the driver on floats: exact bitwise equality,
so any cross-engine nondeterminism surfaces here first.
"""

from __future__ import annotations

import glob
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS FROM '{p}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """DATE vs TIMESTAMP unified (driver protocol, BASELINE.md): every
    datetime-like value renders as a full ISO timestamp string."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").map(
                lambda v: v.isoformat() if pd.notna(v) else None
            )
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: pd.Timestamp(v).isoformat() if hasattr(v, "isoformat") else v
            )
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"]
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_float = pd.api.types.is_float_dtype(av)
        b_float = pd.api.types.is_float_dtype(bv)
        if a_float != b_float:
            # The driver hashes RENDERED values: int64 123 renders "123"
            # while float64 renders "123.0" — a kind mismatch is a driver
            # hash failure even when the values are numerically equal
            # (round-1 lesson: DuckDB SUM(INT)->HUGEINT->float64 vs Spark
            # LONG). Never coerce across kinds; report it.
            problems.append(
                f"dtype-kind mismatch col {c}: spark={av.dtype} vs duck={bv.dtype} "
                "(renders differently under the driver's value-hash protocol; "
                "CAST the oracle or the Spark side so kinds agree)"
            )
            continue
        if a_float and b_float:
            av = av.astype("float64")
            bv = bv.astype("float64")
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(neq.idxmax())
                d = abs(av[neq] - bv[neq]).max()
                problems.append(
                    f"float col {c}: {int(neq.sum())} diffs, max abs {d:.3e} "
                    f"(e.g. {av[i]!r} vs {bv[i]!r})"
                )
        else:
            av_n = av.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
            bv_n = bv.map(lambda v: None if (isinstance(v, float) and math.isnan(v)) else v)
            neq = ~(av_n.eq(bv_n) | (av_n.isna() & bv_n.isna()))
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs (e.g. {av_n[i]!r} vs {bv_n[i]!r})"
                )
    return problems


def run_all(sf_dir: str = "/root/testdata/sf0.001", names: list[str] | None = None, spark=None):
    import __spark_entry__ as entrymod
    from duckdb_pipeline_spark.session import build_spark

    if spark is None:
        spark = build_spark(
            "oracle-check",
            master=os.environ.get("SPARK_MASTER", "local[8]"),
            shuffle_partitions=8,
            # \r progress frames interleave with the OK/FAIL lines and
            # swallow some under grep — keep the report machine-readable
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    failures = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures[name] = [f"SPARK ERROR: {type(e).__name__}: {str(e)[:300]}"]
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures[name] = [f"DUCK ERROR: {type(e).__name__}: {str(e)[:300]}"]
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures[name] = problems
            print(f"FAIL {name}: {problems}")
        else:
            print(f"OK   {name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failing" if failures else "\nall green")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    bad = run_all(sf, names)
    sys.exit(1 if bad else 0)
