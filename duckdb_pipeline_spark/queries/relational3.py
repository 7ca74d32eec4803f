"""Round-3 relational additions: interval RANGE window frames,
deterministic stratified sampling, int8 embedding quantization, and map
scalar functions. Each query has a full DuckDB oracle; every expression
stays JVM-side (no Python UDFs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from . import QuerySpec
from .common import D2D, DEC, DSUM, dec2double, dsum_fp, load

# ---------------------------------------------------------------------------
# RANGE window frame over an interval: 7-day moving revenue per customer.
# The frame is VALUE-bounded (any row within 6 days before the current
# row's date), not ROW-bounded — ties and gaps behave identically in
# both engines, and the result is order-deterministic even for same-day
# orders. Spark's rangeBetween needs a numeric ordering key, so the
# timestamp is cast to epoch seconds; DuckDB states the same frame as
# RANGE BETWEEN INTERVAL ... PRECEDING natively.
# ---------------------------------------------------------------------------

_6D = 6 * 86400


def window_moving_7d(spark, sf_dir):
    """Per-customer 7-day moving order revenue (RANGE frame, exact
    decimal sum rendered via the deterministic dec→double split)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))  # NTZ→epoch s (session tz pinned UTC)
        .rangeBetween(-_6D, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        dec2double(F.sum(F.col("o_totalprice").cast(DEC)).over(w)).alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


_W7 = "(PARTITION BY o_custkey ORDER BY o_orderdate RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)"

WINDOW_7D_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderdate,
       {D2D(f'SUM(CAST(o_totalprice AS DECIMAL(18,9))) OVER {_W7}')} AS rev_7d,
       COUNT(*) OVER {_W7} AS n_orders_7d
FROM orders
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling: per-stratum rates out of 256 via a
# lexicographic threshold on the first 2 hex chars of md5(key) — stable
# across engines, partitionings, and reruns (rand()/TABLESAMPLE are
# not). The per-row predicate is a pure map: no shuffle beyond the
# verifying aggregation.
# ---------------------------------------------------------------------------

_STRATA = {"view": "19", "click": "33", "purchase": "ff"}  # /256: ~10%, ~20%, 100%
_DEFAULT_T = "0c"  # ~5% for every other stratum


def sample_stratified(spark, sf_dir):
    """Per-event-type deterministic sample rates; output = per-stratum
    sampled counts (the verification aggregate)."""
    events = load(spark, sf_dir, "events")
    h = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    t = F.lit(_DEFAULT_T)
    for k, v in _STRATA.items():
        t = F.when(F.col("event_type") == k, F.lit(v)).otherwise(t)
    return (
        events.where(h <= t)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


_CASE_T = (
    "CASE "
    + " ".join(f"WHEN event_type = '{k}' THEN '{v}'" for k, v in _STRATA.items())
    + f" ELSE '{_DEFAULT_T}' END"
)

SAMPLE_STRAT_SQL = f"""
SELECT event_type, count(*) AS n_sampled
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <= {_CASE_T}
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# int8 embedding quantization: per-vector symmetric scale 127/max|x|,
# q_i = floor(x_i*scale + 0.5) — floor(+0.5) instead of round() because
# the two engines' round() tie-breaking is not contractually identical,
# while floor is exact on every IEEE input. All array math is built-in
# HOFs over 64 elements (bounded per-row work; the hot path at corpus
# scale is the scan, not the transform).
# ---------------------------------------------------------------------------


def embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding column —
    the storage-shrink step before a 100 TB ANN index build (4x smaller,
    SIMD-friendly integer dot products downstream)."""
    emb = load(spark, sf_dir, "embeddings")
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    e = emb.select("vec_id", "embedding", scale.alias("scale"))
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)).cast("tinyint"),
    )
    # the int8 vector leaves the query as a comma-joined string: the
    # hash protocol compares RENDERED values, and raw array rendering
    # is engine-specific (the quantized array itself stays columnar in
    # the pipeline form — this projection is the checkable surface)
    return e.select(
        "vec_id",
        "scale",
        F.array_join(F.transform(q, lambda v: v.cast("string")), ",").alias("q_csv"),
    )


QUANT_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
              THEN 127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
              ELSE 0.0 END AS scale
  FROM embeddings
)
SELECT vec_id, scale,
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS TINYINT) AS VARCHAR)), ',') AS q_csv
FROM s
"""


# ---------------------------------------------------------------------------
# Map scalar functions: construct, probe, and enumerate a MAP column.
# The map itself never leaves the query (map RENDERING differs between
# engines); the outputs are its scalar/array projections, which render
# identically.
# ---------------------------------------------------------------------------


def scalar_map_funcs(spark, sf_dir):
    """MAP construction + lookup + enumeration over part attributes."""
    part = load(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    d = part.select("p_partkey", m.alias("m"))
    return d.select(
        "p_partkey",
        F.element_at("m", "brand").alias("brand_val"),
        F.element_at("m", "missing").alias("missing_val"),
        F.array_join(F.map_keys("m"), ",").alias("ks"),
        F.size("m").alias("n_entries"),
    )


MAP_SQL = """
WITH d AS (
  SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) AS m FROM part
)
SELECT p_partkey,
       map_extract(m, 'brand')[1] AS brand_val,
       CASE WHEN len(map_extract(m, 'missing')) > 0 THEN map_extract(m, 'missing')[1] END AS missing_val,
       array_to_string(map_keys(m), ',') AS ks,
       CAST(cardinality(m) AS INTEGER) AS n_entries
FROM d
"""


# ---------------------------------------------------------------------------
# The two TPC-H shapes still expressible on the driver schema (q2/q11/
# q20 need the absent partsupp table — documented gap, not an omission):
# Q8 national market share (7-table join, conditional-volume ratio) and
# Q13 customer order-count distribution (outer join + double grouping).
# ---------------------------------------------------------------------------


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_1's share of ASIA's PROMO-part order
    volume per order year. Two exact decimal sums (conditional and
    total volume) and ONE final IEEE divide on identical operands in
    both engines. Small dims broadcast; the fact-side join tree is the
    q5/q7 shape."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        dsum_fp(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0)).alias(
            "nation_vol"
        ),
        dsum_fp(vol).alias("total_vol"),
    )
    return agg.select(
        "o_year", (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share")
    )


Q8_SQL = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS vol,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
)
SELECT o_year,
       {DSUM("CASE WHEN supp_nation = 'NATION_1' THEN vol ELSE 0.0 END")}
       / {DSUM('vol')} AS mkt_share
FROM j GROUP BY o_year
"""


def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: how many customers placed exactly k orders
    (urgent orders excluded) — LEFT join so zero-order customers land
    in the k=0 bucket, then a second aggregation over the counts."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# pandas UDF shapes: the two Arrow-vectorized UDF forms the rest of the
# engine doesn't exercise (mapInPandas / applyInPandas / withState /
# UDTF are covered elsewhere). Both use integer-exact arithmetic so the
# Python-side numpy result is bitwise-reproducible in the SQL oracle —
# the UDFs are declared capability, not the hot path (built-ins express
# both bodies; see each docstring).
# ---------------------------------------------------------------------------


def scalar_pandas_udf_buckets(spark, sf_dir):
    """SCALAR pandas UDF (Arrow-batched, numpy interior): deterministic
    price-hash bucketing, floor(p*100+0.5) %% 97 — integer math, so the
    vectorized Python result is exactly the oracle's SQL expression.
    (A built-in expression computes the same thing JVM-side; the query
    declares the UDF shape itself — signature, Arrow transfer, null
    passthrough — as tested capability.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def price_bucket(p: pd.Series) -> pd.Series:
        return pd.Series(
            (np.floor(p.to_numpy() * 100.0 + 0.5).astype("int64")) % 97
        )

    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(price_bucket("o_totalprice").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SCALAR_UDF_SQL = """
SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 97 AS bucket, count(*) AS n
FROM orders GROUP BY 1
"""


def agg_pandas_udaf(spark, sf_dir):
    """GROUPED_AGG pandas UDF (a user-defined aggregate over Arrow
    batches): exact fixed-point event-value totals per event type —
    the sum runs over int64 scale-9 units, so Python-side summation
    order cannot perturb the result and the oracle reproduces it
    bit-for-bit. Note the scale contract: a grouped-agg pandas UDF is
    NOT algebraic to Spark (no partial aggregation — all group rows
    ship to one worker), so it is for bounded groups or must be
    pre-combined; the built-in dsum_fp formulation keeps map-side
    partials and is what the hot queries use."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def exact_units(v: pd.Series) -> int:
        # nulls are skipped, matching SQL SUM semantics
        return int(np.floor(v.dropna().to_numpy() * 1e9 + 0.5).astype("int64").sum())

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas and non-pandas aggregates in one
        # agg(), so the count is a pandas aggregate too
        return len(v)

    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        exact_units("value").alias("value_units"),
        n_rows("value").alias("n"),
    )


UDAF_SQL = """
SELECT event_type,
       CAST(SUM(CAST(floor(value * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS value_units,
       count(*) AS n
FROM events GROUP BY event_type
"""


def sample_topk_per_group(spark, sf_dir):
    """Deterministic k-per-stratum subset (eval-split construction):
    the 25 documents per source with the smallest md5(doc_id) -- a
    uniform pseudo-random but engine-portable and rerun-stable choice
    (rand()/TABLESAMPLE are neither). Exact shape here is a rank
    window per stratum; at 100 TB compose it with the md5-threshold
    pre-filter (sample_hash_deterministic's trick) so the window sorts
    ~k-sized survivor sets per stratum instead of the full corpus."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 25)
        .select("source", "doc_id", "rk")
    )


SAMPLE_TOPK_SQL = """
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT source, doc_id, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= 25
"""


QUERIES = {
    "window_moving_7d": QuerySpec(
        window_moving_7d, WINDOW_7D_SQL, "interval RANGE window frame"
    ),
    "sample_topk_per_group": QuerySpec(
        sample_topk_per_group, SAMPLE_TOPK_SQL, "deterministic k-per-stratum sample"
    ),
    "sample_stratified": QuerySpec(
        sample_stratified, SAMPLE_STRAT_SQL, "deterministic stratified sample"
    ),
    "embedding_quantize_int8": QuerySpec(
        embedding_quantize_int8, QUANT_SQL, "int8 embedding quantization"
    ),
    "scalar_map_funcs": QuerySpec(scalar_map_funcs, MAP_SQL, "map scalar functions"),
    "q8_market_share": QuerySpec(q8_market_share, Q8_SQL, "TPC-H Q8 market share"),
    "q13_order_counts": QuerySpec(
        q13_order_count_distribution, Q13_SQL, "TPC-H Q13 order-count distribution"
    ),
    "scalar_pandas_udf": QuerySpec(
        scalar_pandas_udf_buckets, SCALAR_UDF_SQL, "Arrow scalar pandas UDF"
    ),
    "agg_pandas_udaf": QuerySpec(agg_pandas_udaf, UDAF_SQL, "grouped-agg pandas UDF"),
}
