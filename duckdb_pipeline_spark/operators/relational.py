"""Relational operators Spark lacks as single built-ins.

These are compositions of DataFrame ops (SURVEY.md §2.8 gap map /
custom-operator guidance) — no Python row loops, no collect():

- ``asof_join``: union-and-window formulation — ONE shuffle on
  (keys, time), no join explosion, no per-key skew amplification.
  Equivalent to DuckDB's ``ASOF JOIN`` (largest right ts <= left ts).
- ``range_join``: equi-key join + range predicate; Spark plans the
  equi part as a shuffled hash/sort-merge join and applies the range
  as a post-join filter, so cost is bounded by key co-partitioning.
- ``top_k_per_group``: row_number window, the scalable top-k (no
  global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (per join key). Inner semantics: left rows
    with no prior right row are dropped.

    Implementation: tag both sides, union, single window pass ordered
    by (ts, side) with side=right first on ties (matching ASOF's
    ``<=``), ``last(..., ignorenulls)`` carries the latest right
    payload forward. One shuffle total; at 100 TB this beats a
    key-range join by orders of magnitude on skewed keys.
    """
    right_payload = right_payload or [c for c in right.columns if c not in on + [right_ts]]

    lcols = [c for c in left.columns if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_ts).alias(right_ts + suffix), *right_payload)).schema[0].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.struct(F.col(right_ts).alias(right_ts + suffix), *right_payload).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = matched.where(F.col("__is_left") == 1).where(F.col("__match").isNotNull())
    return out.select(*on, F.col("__l.*"), F.col("__match.*"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    condition,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + range-predicate join. The equi keys keep the plan a
    co-partitioned join (never a cartesian); ``condition`` is applied
    as the extra join predicate."""
    cond = None
    for k in on:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = cond & condition
    return left.join(right, cond, how)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation: salt the hot keys across
    ``salt_buckets`` partial groups, aggregate, then merge partials.

    ``aggs`` maps column -> 'count' | 'sum' | 'min' | 'max' (the
    decomposable aggregates: partial and final functions compose).
    The salt is deterministic (hash of the whole row, mod buckets), so
    results are reproducible and the operator stays a pure plan.

    When one key holds 1% of 100 TB, the plain groupBy sends ~1 TB to
    one reducer; salting bounds every reducer at hot_key_size /
    salt_buckets. AQE skew-join handles joins; this is the analogous
    fix for aggregation."""
    salt = F.pmod(F.abs(F.hash(*[F.col(c) for c in df.columns])), F.lit(salt_buckets))
    partial_aggs, final_aggs = [], []
    for col, fn in aggs.items():
        p = f"__p_{col}_{fn}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def top_k_per_group(
    df: DataFrame, partition_cols: list[str], order_cols: list, k: int, rn_name: str = "rn"
) -> DataFrame:
    """Top-k rows per group via row_number — the scalable top-k: the
    window sorts within partitions only (no global sort/limit)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rn_name, F.row_number().over(w)).where(F.col(rn_name) <= k)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the FACT side's key across
    ``salt_buckets`` sub-keys (deterministic hash of the whole fact
    row) and EXPLODE the dim side over every salt value, so a hot key's
    rows land on ``salt_buckets`` reducers instead of one.

    For ``how`` in {'inner', 'left'} this is semantically identical to
    ``fact.join(dim, fact_key == dim_key, how)`` — the salt is an
    internal column, dropped on output. Other join types are rejected:
    under 'right'/'full' every exploded dim replica that finds no fact
    row would surface as its own null-extended output row (up to
    salt_buckets duplicates per unmatched dim row), and 'left_semi' /
    'left_anti' drop the dim side entirely so the final select would
    fail. Cost: the dim side is replicated x salt_buckets, so use it
    when dim is small relative to the hot key's row count (the usual
    skew shape: huge fact, modest dim, one pathological key). AQE's
    skew-join split is the runtime fix for sort-merge plans; this is
    the PLANNED fix — it also works where AQE can't see the skew
    (e.g. map-side outputs with no stats).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "right/full would emit up to salt_buckets duplicates per "
            "unmatched dim row; semi/anti drop the dim columns"
        )
    fact_cols = [c for c in fact.columns]
    dim_cols = [c for c in dim.columns]
    salt = F.pmod(F.abs(F.hash(*[F.col(c) for c in fact_cols])), F.lit(salt_buckets))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]), how
    )
    return joined.select(*[f[c] for c in fact_cols], *[d[c] for c in dim_cols])
