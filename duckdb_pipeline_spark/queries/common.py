"""Cross-engine determinism helpers.

The driver hash-compares Spark results against a DuckDB oracle
(BASELINE.md). Floating-point aggregation is the one place two correct
engines legitimately diverge (summation order). We eliminate the
divergence instead of rounding it away:

**decimal-exact idiom** — cast each double operand to DECIMAL(18,9)
(deterministic: decimal midpoints at scale 4 are not representable in
binary, so round-to-nearest never ties), SUM exactly in decimal, cast
the total back to double. Both engines then produce bitwise-identical
doubles regardless of partitioning / association order. Derived
divisions (averages, ratios) are single IEEE ops on identical inputs —
also bitwise-identical.

Spark side: ``dsum(expr)``; oracle side: ``DSUM('expr')`` emits the
matching SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

DEC = "decimal(18,9)"
DEC_HI = "decimal(30,15)"  # for O(1)-magnitude products (similarity)


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2double(c: Column) -> Column:
    """Deterministic decimal→double: split into integer part + fraction
    so each piece converts exactly-rounded in both engines (a direct
    cast of a wide decimal is off-by-one-ulp between Spark's BigDecimal
    path and DuckDB's int128/10^s float division — measured)."""
    i = F.floor(c)
    return i.cast("double") + (c - i).cast("double")


def dsum(col: str | Column, prec: str = DEC) -> Column:
    """Exact distributed sum of a double expression (see module doc)."""
    return dec2double(F.sum(_c(col).cast(prec)))


def davg(col: str | Column, prec: str = DEC) -> Column:
    """Exact-sum average: exact decimal sum / count, one IEEE divide."""
    return dsum(col, prec) / F.count(F.lit(1))


_B = 10**9


def dsum_fp(col: str | Column) -> Column:
    """Fast path for ``dsum`` on a SOURCE double column: long
    fixed-point sums instead of a BigDecimal accumulator (the decimal
    sum's >18-digit accumulator leaves the Long-backed fast path;
    measured ~4x slower per row).

    Bitwise-equal to ``dsum`` — and to the decimal-idiom oracle SQL —
    when the column has <= 9 decimal digits and |x| <= ~4e6 (all the
    money/quantity columns in this schema; sign is fine — the pmod
    quotient/remainder decomposition is exact for negatives too):

    - per row, round(x*1e9) recovers the exact scale-9 unscaled value:
      x*1e9 is within ~0.03 of the true integer n (|n| <= 4e15 < 2^53),
      so the nearest-int round is exact — the same n the decimal cast
      produces. Derived PRODUCTS (price*(1-disc)) are full-precision
      doubles where true half-way cases occur: keep those on ``dsum``.
    - the hi sum is a long: hi <= 4e6 per row, so it holds exactly up
      to ~2.3e12 rows per group (TPC-H sf ~400k lineitem in ONE group —
      comfortably past the 100 TB envelope). The lo sum CANNOT stay a
      long (lo is up to 1e9-1 per row, wrapping past ~9.2e9 rows/group,
      i.e. sf ~1.5k — inside the envelope), so it accumulates as
      decimal(38,0): exact to ~1e29 rows, and only this one accumulator
      pays the decimal cost. The carry is peeled with an exact decimal
      remainder and an exact division of a multiple of 1e9 (no rounding
      can occur), then merged and rendered by the same floor+fraction
      split as D2D, so every IEEE operation sees identical operands in
      both engines.
    """
    u = F.round(_c(col) * F.lit(1e9)).cast("long")
    lo_part = F.pmod(u, F.lit(_B))
    hi_part = ((u - lo_part) / F.lit(_B)).cast("long")  # exact: multiple/1e9
    sum_hi = F.sum(hi_part)
    sum_lo = F.sum(lo_part.cast("decimal(28,0)"))  # -> decimal(38,0) acc
    carry_rem = F.pmod(sum_lo, F.lit(_B))  # exact decimal remainder, < 1e9
    # (sum_lo - carry_rem) is an exact multiple of 1e9: decimal division
    # terminates with zero remainder, so the scale-extension rounding of
    # Spark's decimal divide never fires. carry <= total/1e9, inside the
    # same long bound as sum_hi.
    carry = ((sum_lo - carry_rem) / F.lit(_B)).cast("long")
    return (sum_hi + carry).cast("double") + carry_rem.cast("long").cast("double") / F.lit(
        1e9
    )


def davg_fp(col: str | Column) -> Column:
    """Fast-path exact average (see dsum_fp preconditions)."""
    return dsum_fp(col) / F.count(F.lit(1))


def D2D(expr: str) -> str:
    """SQL twin of dec2double."""
    return f"(CAST(FLOOR({expr}) AS DOUBLE) + CAST(({expr}) - FLOOR({expr}) AS DOUBLE))"


def DSUM(expr: str, prec: str = "DECIMAL(18,9)") -> str:
    return D2D(f"SUM(CAST({expr} AS {prec}))")


def DAVG(expr: str, prec: str = "DECIMAL(18,9)") -> str:
    return f"({DSUM(expr, prec)} / COUNT(*))"


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Re-split an under-parallel scan. A single-row-group parquet file
    yields ONE input split, serializing scan-side work (partial
    aggregation, join probes) on one core. When the plan has fewer
    partitions than the cluster's parallelism, round-robin repartition;
    when the input is already well-split (any real-scale table), this
    is a no-op — so it never introduces a shuffle at 100 TB."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table. The events table stores TIMESTAMP(NANOS)
    parquet, which Spark reads as long (nanosAsLong) — convert to
    microsecond timestamps, the same truncation DuckDB applies when it
    scans the file, so both engines see identical instants."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
