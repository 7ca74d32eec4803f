"""Accuracy bounds for the sketch queries that have no DuckDB oracle
(their estimates are engine-specific by nature)."""

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.sketches import (
    sketch_approx_ndv,
    sketch_approx_quantiles,
)


def test_approx_ndv_within_hll_error(spark, sf_dir):
    approx = {
        r.event_type: r.approx_users for r in sketch_approx_ndv(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.x
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        # default rsd is 5%; allow 3 sigma
        assert abs(approx[k] - exact[k]) <= max(0.15 * exact[k], 3)


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    approx = {
        r.l_returnflag: (r.p50_approx, r.p99_approx)
        for r in sketch_approx_quantiles(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: (r.p50, r.p99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for k in exact:
        assert abs(approx[k][0] - exact[k][0]) / exact[k][0] < 0.05
        assert abs(approx[k][1] - exact[k][1]) / exact[k][1] < 0.05


def test_hll_merge_equals_direct_and_bounds_exact(spark, sf_dir):
    """Mergeability is the property that makes sketches the 100 TB
    path: union of per-shard sketches must equal the one-pass global
    sketch exactly (same registers), and both must estimate the true
    NDV within HLL's relative error at lgK=12 (~1.6%; assert 5%)."""
    from duckdb_pipeline_spark.queries.common import load
    from duckdb_pipeline_spark.queries.sketches import sketch_hll_merge

    row = sketch_hll_merge(spark, sf_dir).first()
    assert row.merged_estimate == row.direct_estimate
    exact = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert abs(row.merged_estimate - exact) / exact < 0.05


def test_cms_overcount_property_and_bound(spark, sf_dir):
    """CMS point estimates can only OVERcount (min over hashed cells
    that all contain the key's true count plus collisions), and with
    w=1024 cells per row the expected collision mass per cell is N/w —
    assert the loose 4*N/w bound that only breaks if the lane math or
    the min-fold is wrong."""
    from duckdb_pipeline_spark.queries.common import load
    from duckdb_pipeline_spark.queries.sketches import sketch_cms_user_counts

    rows = sketch_cms_user_counts(spark, sf_dir).collect()
    assert len(rows) == 5
    n_events = load(spark, sf_dir, "events").count()
    for r in rows:
        assert r.cms_n >= r.exact_n
        assert r.cms_n - r.exact_n <= 4 * n_events / 1024


def test_cms_cells_merge_across_batches(spark, sf_dir):
    """Mergeability — the property that makes CMS the incremental
    100 TB shape: the sketch of the full stream equals the CELLWISE SUM
    of per-batch sketches (counts add; no rescan of old batches)."""
    from pyspark.sql import functions as F

    from duckdb_pipeline_spark.queries.common import load
    from duckdb_pipeline_spark.queries.dedup import _bloom_lane_sql
    from duckdb_pipeline_spark.queries.sketches import _CMS_W

    ev = load(spark, sf_dir, "events").selectExpr(
        "event_id", "md5(CAST(user_id AS STRING)) AS h"
    )
    lanes = _bloom_lane_sql("h")
    buckets = ", ".join(f"({lane}) % {_CMS_W}" for lane in lanes)

    def cells(df):
        return {
            (r.row, r.bucket): r.c
            for r in df.selectExpr(f"posexplode(array({buckets})) AS (row, bucket)")
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    full = cells(ev)
    b1 = cells(ev.where(F.col("event_id") % 2 == 0))
    b2 = cells(ev.where(F.col("event_id") % 2 == 1))
    merged = dict(b1)
    for k, v in b2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full
