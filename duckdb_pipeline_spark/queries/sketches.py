"""Approximate-aggregation (sketch) surface + exact quantiles.

- Exact interpolated percentiles are oracle-checked (Spark
  ``percentile`` and DuckDB ``quantile_cont`` share the definition
  lo + (hi-lo)*frac — verified bitwise-identical on this data).
- HyperLogLog NDV and t-digest/KLL quantile sketches are
  implementation-defined: two correct engines legitimately return
  different estimates (verified: Spark 1400 vs DuckDB 1516 vs exact
  1500 on sf0.01 o_custkey). Those queries are declared WITHOUT an
  oracle — the driver records a rows-only check — and their accuracy
  is tested against exact values with error bounds in
  tests/test_sketches.py.

Scale notes: sketches are the 100 TB path for cardinality/quantile
questions — fixed-size state (HLL registers / quantile summaries),
map-side partials, mergeable across partitions; exact distinct or full
sorts shuffle the whole keyspace instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec
from .common import load


def agg_percentiles_exact(spark, sf_dir):
    """Exact interpolated p50/p90 of order totals per priority."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


PCT_SQL = """
SELECT o_orderpriority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       count(*) AS n
FROM orders GROUP BY o_orderpriority
"""


def sketch_approx_ndv(spark, sf_dir):
    """HyperLogLog distinct-count estimates per event type (no oracle:
    HLL estimates are engine-specific; accuracy bound tested in
    tests/test_sketches.py)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count(F.lit(1)).alias("n"),
    )


def sketch_approx_quantiles(spark, sf_dir):
    """Streaming-mergeable approximate quantiles of lineitem prices
    (no oracle: sketch-specific estimates)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.99, 10_000).alias("p99_approx"),
    )


def sketch_hll_merge(spark, sf_dir):
    """The INCREMENTAL sketch pattern: one Datasketches HLL sketch per
    source shard (per event_type here — in production one per ingested
    batch, PERSISTED as a binary column), then union-merged for the
    corpus-wide distinct-user estimate without rescanning any shard.
    The query materializes both paths — per-shard sketches merged vs
    one direct global sketch — and returns their estimates, which are
    EQUAL by the sketch's merge semantics (pinned in
    tests/test_sketches.py along with the error bound vs exact NDV).
    No oracle: sketch estimates are engine-specific (rows-only check).

    Scale shape: fixed-size state (lgK=12 -> 4 KB registers) per shard,
    map-side partials, one tiny merge — the 100 TB cardinality answer
    that exact distinct (full keyspace shuffle) cannot be."""
    events = load(spark, sf_dir, "events")
    shards = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = shards.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"),
        F.sum("n_rows").alias("n_rows"),
    )
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "direct_estimate"
        )
    )
    return merged.crossJoin(direct).select(
        "merged_estimate", "direct_estimate", "n_rows"
    )


QUERIES = {
    "agg_percentiles_exact": QuerySpec(
        agg_percentiles_exact, PCT_SQL, "exact interpolated quantiles"
    ),
    "sketch_hll_merge": QuerySpec(
        sketch_hll_merge, None, "per-shard HLL sketches union-merged (rows-only check)"
    ),
    "sketch_approx_ndv": QuerySpec(
        sketch_approx_ndv, None, "HLL NDV estimate (rows-only check)"
    ),
    "sketch_approx_quantiles": QuerySpec(
        sketch_approx_quantiles, None, "approx quantiles (rows-only check)"
    ),
}
