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
    """Exact interpolated p50/p90 of order totals per priority.

    One ARRAY percentile call, not one call per fraction: each
    `percentile(x, p)` aggregate buffers the group's full value
    multiset independently (ObjectHashAggregate), so k separate calls
    pay k buffers; the array form shares one (measured 2.4x on the
    three-fraction quantiles audit at sf0.1)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, array(0.5, 0.9))").alias("_p"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "o_orderpriority",
            F.col("_p")[0].alias("p50"),
            F.col("_p")[1].alias("p90"),
            "n",
        )
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
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), F.lit(10_000)
            ).alias("_a")
        )
        .select(
            "l_returnflag",
            F.col("_a")[0].alias("p50_approx"),
            F.col("_a")[1].alias("p99_approx"),
        )
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


# ---------------------------------------------------------------- audits
#
# Self-audit queries for the three engine-specific sketches (VERDICT
# r7 #6 — the ann_recall_report precedent): the ESTIMATE is
# implementation-defined and stays rows-only, but "error <= bound" is
# a deterministic boolean, and the exact reference values hash-check
# across engines. The DuckDB oracle emits the same exact values with
# literal TRUE bounds — if a Spark sketch ever drifts outside its
# bound, the Spark side prints FALSE and the driver's value-hash goes
# red. Bounds are the sketches' published guarantees with 3-sigma-plus
# slack (HLL lgK=12 / default rsd 5% -> 15% relative; KLL-style
# percentile_approx accuracy 10000 -> rank error 1e-4, audited against
# a +-0.05-rank exact bracket).


def sketch_ndv_audit(spark, sf_dir):
    """Per event type: exact NDV beside a boolean asserting the HLL
    estimate lands within 15% relative error. Exact values + bound
    verdicts are deterministic, so this row IS hash-checkable."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id").alias("_a"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_a") - F.col("exact_users"))
                <= 0.15 * F.col("exact_users")
            ).alias("within_bound"),
        )
    )


NDV_AUDIT_SQL = """
SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS within_bound
FROM events GROUP BY event_type
"""


def sketch_quantiles_audit(spark, sf_dir):
    """Per return flag: exact interpolated p45/p55 bracket beside
    booleans asserting the approximate p50/p99 fall inside generous
    exact-rank brackets ([p45, p55] and [p97, max]).

    The three exact fractions ride ONE array percentile and the two
    approx fractions ONE array sketch: separate calls each buffer the
    full per-group multiset (3.46 -> 1.41 s at sf0.1, min-of-4)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.45, 0.55, 0.97))").alias(
                "_p"
            ),
            F.max("l_extendedprice").alias("_mx"),
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99)), F.lit(10_000)
            ).alias("_a"),
        )
        .select(
            "l_returnflag",
            F.col("_p")[0].alias("lo50"),
            F.col("_p")[1].alias("hi50"),
            F.col("_a")[0]
            .between(F.col("_p")[0], F.col("_p")[1])
            .alias("p50_in_bracket"),
            F.col("_a")[1]
            .between(F.col("_p")[2], F.col("_mx"))
            .alias("p99_in_bracket"),
        )
    )


QUANTILES_AUDIT_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.45) AS lo50,
       quantile_cont(l_extendedprice, 0.55) AS hi50,
       TRUE AS p50_in_bracket,
       TRUE AS p99_in_bracket
FROM lineitem GROUP BY l_returnflag
"""


def sketch_hll_merge_audit(spark, sf_dir):
    """The merge-semantics contract, hash-checked: per-shard HLL
    sketches union-merged must estimate EXACTLY what one direct global
    sketch estimates (Datasketches merge is lossless at equal lgK),
    and both must land within 15% of the exact NDV. Output: exact NDV
    + the two deterministic verdicts."""
    ev = load(spark, sf_dir, "events")
    shards = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    merged = shards.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_m")
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("_d"),
        F.countDistinct("user_id").alias("exact_ndv"),
    )
    return merged.crossJoin(direct).select(
        "exact_ndv",
        (F.col("_m") == F.col("_d")).alias("merge_equals_direct"),
        (
            F.abs(F.col("_m") - F.col("exact_ndv"))
            <= 0.15 * F.col("exact_ndv")
        ).alias("within_bound"),
    )


HLL_MERGE_AUDIT_SQL = """
SELECT count(DISTINCT user_id) AS exact_ndv,
       TRUE AS merge_equals_direct,
       TRUE AS within_bound
FROM events
"""


_CMS_W = 1024  # buckets per row
_CMS_D = 4  # rows (independent md5 lanes)


def sketch_cms_user_counts(spark, sf_dir):
    """Count-Min sketch as a RELATIONAL, oracle-checkable operator
    (unlike the opaque binary of Spark's count_min_sketch aggregate):
    d=4 independent buckets per event from the md5 lanes of the user id
    (the engine-portable instr-nibble derivation shared with
    dedup_bloom_probe, mod w=1024), one partial-aggregated groupBy
    builds the 4x1024-cell sketch, and the point estimate for a probe
    user is the min over its 4 cells. Output: the 5 heaviest users'
    exact counts beside their CMS estimates — the overcount property
    (cms_n >= exact_n, within eps*N w.h.p.) is visible in the result
    and pinned by pytest.

    Scale shape: the sketch is bounded at d*w cells no matter how many
    events stream through (map-side combine compresses per partition),
    and broadcast-joins against any probe set — the mergeable
    fixed-size state that exact per-key counting cannot be."""
    from .dedup import _bloom_lane_sql

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.expr("md5(CAST(user_id AS STRING))").alias("h"),
    )
    lanes = _bloom_lane_sql("h")
    buckets = ", ".join(f"({lane}) % {_CMS_W}" for lane in lanes)
    cms = (
        ev.selectExpr(f"posexplode(array({buckets})) AS (row, bucket)")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = ev.groupBy("user_id", "h").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.col("exact_n").desc(), F.col("user_id").asc()).limit(5)
    pb = probes.selectExpr(
        "user_id", "exact_n", f"posexplode(array({buckets})) AS (row, bucket)"
    )
    est = (
        pb.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select("user_id", "exact_n", "cms_n")


def _cms_sql() -> str:
    from .dedup import _bloom_lane_sql

    lanes = _bloom_lane_sql("h")
    buckets = ", ".join(f"({lane}) % {_CMS_W}" for lane in lanes)
    return f"""
WITH ev AS (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM events),
cells AS (
  SELECT row, bucket, count(*) AS c FROM (
    SELECT unnest(range(0, {_CMS_D})) AS row, unnest([{buckets}]) AS bucket FROM ev
  ) GROUP BY row, bucket
),
exact AS (SELECT user_id, h, count(*) AS exact_n FROM ev GROUP BY user_id, h),
probes AS (SELECT * FROM exact ORDER BY exact_n DESC, user_id ASC LIMIT 5),
pb AS (
  SELECT user_id, exact_n, unnest(range(0, {_CMS_D})) AS row,
         unnest([{buckets}]) AS bucket
  FROM probes
)
SELECT pb.user_id, pb.exact_n, CAST(min(cells.c) AS BIGINT) AS cms_n
FROM pb JOIN cells USING (row, bucket)
GROUP BY pb.user_id, pb.exact_n
"""


_MG_K = 256  # Misra-Gries counter budget


def sketch_mg_heavyhitters_audit(spark, sf_dir):
    """Misra-Gries heavy-hitters sketch + error-bound AUDIT (the
    missing member of the sketch family beside HLL/CMS/quantiles —
    frequent-items is the fourth classic bounded-state streaming
    summary; Misra & Gries 1982, mergeability per Agarwal et al.
    "Mergeable Summaries", PODS'12): k=256 counters per partition over
    the corpus token stream, per-partition summaries merged by
    counter-sum (a valid MG merge; the theorem gives the merged
    estimate est in [exact - n/(k+1), exact] for EVERY token, retained
    or not). Output: the 5 exact-heaviest tokens with their exact
    counts and the two deterministic verdicts (never_overcounts,
    within_bound) — the estimates themselves are order/partitioning-
    dependent (any MG implementation is), so the hash-checked surface
    is the exact values plus the guarantee booleans, the
    sketch_ndv_audit pattern.

    Scale shape: input is the materialized (doc, token, tf) projection
    (tokcache — weighted MG updates, so the stream is tf rows, not
    token instances); the per-partition summary is Arrow-batched
    (pandas groupby-sum per batch = a zero-error MG summary, merged
    into the running k-counter dict with one vectorized numpy
    truncation per batch — no per-token Python loop); summaries are
    <= k rows per partition regardless of volume, and the global merge
    is a groupBy over <= k * n_partitions rows. The exact side exists
    only because this is an audit; production keeps the sketch."""
    import numpy as np
    import pandas as pd

    from .tokcache import doc_tf

    tf = doc_tf(spark, sf_dir).where(F.col("token") != "").select("token", "tf")

    def mg_partition(batches):
        # running summary as an index-aligned Series: the per-batch
        # merge (groupby-sum + add) and the truncation are all
        # vectorized — no per-token Python loop anywhere
        summary = pd.Series(dtype=np.int64)
        for pdf in batches:
            batch = pdf.groupby("token")["tf"].sum()
            summary = summary.add(batch, fill_value=0).astype(np.int64)
            if len(summary) > _MG_K:
                cnts = summary.to_numpy()
                # subtract the (k+1)-th largest count from everything,
                # drop the non-positive — one vectorized truncation
                t = np.partition(cnts, -(_MG_K + 1))[-(_MG_K + 1)]
                summary = (summary - t)[cnts - t > 0]
        if len(summary):
            yield pd.DataFrame(
                {"token": summary.index.to_numpy(dtype=object),
                 "est": summary.to_numpy()}
            )

    summaries = tf.mapInPandas(mg_partition, "token string, est long")
    merged = summaries.groupBy("token").agg(F.sum("est").alias("est"))

    vocab = tf.groupBy("token").agg(F.sum("tf").alias("exact_n"))
    n_total = vocab.agg(F.sum("exact_n").alias("n"))
    top5 = vocab.orderBy(F.desc("exact_n"), "token").limit(5)
    est0 = F.coalesce(F.col("est"), F.lit(0))
    return (
        top5.join(merged, "token", "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            "token",
            "exact_n",
            (est0 <= F.col("exact_n")).alias("never_overcounts"),
            # exact integer arithmetic: exact - est <= n/(k+1)
            (
                (F.col("exact_n") - est0) * F.lit(_MG_K + 1) <= F.col("n")
            ).alias("within_bound"),
        )
    )


MG_HEAVYHITTERS_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_n
  FROM toks WHERE token <> '' GROUP BY token
),
top5 AS (SELECT * FROM vocab ORDER BY exact_n DESC, token LIMIT 5)
SELECT token, exact_n, TRUE AS never_overcounts, TRUE AS within_bound
FROM top5
"""


QUERIES = {
    "agg_percentiles_exact": QuerySpec(
        agg_percentiles_exact, PCT_SQL, "exact interpolated quantiles"
    ),
    "sketch_mg_heavyhitters_audit": QuerySpec(
        sketch_mg_heavyhitters_audit,
        MG_HEAVYHITTERS_SQL,
        "Misra-Gries frequent-items sketch + exact top-5 with bound verdicts",
    ),
    "sketch_cms_user_counts": QuerySpec(
        sketch_cms_user_counts,
        _cms_sql(),
        "relational Count-Min sketch with md5-lane buckets (oracle-checked)",
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
    "sketch_ndv_audit": QuerySpec(
        sketch_ndv_audit,
        NDV_AUDIT_SQL,
        "exact NDV + HLL error-bound verdict (hash-checked audit)",
    ),
    "sketch_quantiles_audit": QuerySpec(
        sketch_quantiles_audit,
        QUANTILES_AUDIT_SQL,
        "exact quantile brackets + approx-quantile verdicts (hash-checked audit)",
    ),
    "sketch_hll_merge_audit": QuerySpec(
        sketch_hll_merge_audit,
        HLL_MERGE_AUDIT_SQL,
        "HLL merge==direct + error-bound verdicts (hash-checked audit)",
    ),
}
