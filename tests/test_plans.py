"""Physical-plan regression tests: the scale properties we designed for
(predicate pushdown, column pruning, broadcast joins, shuffle-free
maps, partial aggregation) asserted from the actual executed plans —
so a refactor that silently loses one fails CI, not the 100 TB run.
"""

import contextlib
import io
import os
import shutil

from pyspark.sql import functions as F

from duckdb_pipeline_spark.operators.dedup import simhash_fingerprints_mapped
from duckdb_pipeline_spark.queries import collect_all


def plan_text(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q6_filters_push_into_parquet_scan(spark, sf_dir):
    df = collect_all()["q6_forecast_revenue"].fn(spark, sf_dir)
    plan = plan_text(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
    # column pruning: the scan must not read the 11-column lineitem
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema


def test_q5_broadcasts_small_dims(spark, sf_dir):
    df = collect_all()["q5_regional_revenue"].fn(spark, sf_dir)
    plan = plan_text(df)
    assert "BroadcastHashJoin" in plan


def test_simhash_mapped_is_shuffle_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    df = simhash_fingerprints_mapped(docs, parallelism=None)
    plan = plan_text(df, "simple")
    assert "Exchange" not in plan  # pure map: scan -> Python -> out


def test_gold_agg_has_partial_aggregation(spark, sf_dir):
    df = collect_all()["pipeline_gold_daily_agg"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    # partial + final HashAggregate around one shuffle
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Bucketing is the 100 TB co-located-join strategy: two tables
    bucketed by the join key sort-merge join with ZERO exchanges."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # the session catalog is in-memory but the warehouse dir persists
    # across sessions: drop the table AND its leftover location
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")

    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = plan_text(joined, "simple")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle either side
    assert joined.count() == li.count()


def test_topk_per_group_avoids_global_sort(spark, sf_dir):
    df = collect_all()["window_topk_per_group"].fn(spark, sf_dir)
    plan = plan_text(df, "simple")
    # window sort is partition-local: no global (rangepartitioned) sort
    assert "rangepartitioning" not in plan.lower().replace(" ", "")
