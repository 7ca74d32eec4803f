"""Round-9 session additions: distributed model/statistics audits and
layout diagnostics — the per-group OLS regression, Welch's t-test,
exact tie-aware AUC, market-basket lift, and the z-order pruning
audit. All follow the exact-sufficient-statistics discipline of
``agg_corr_exact`` (queries/timeseries.py): every aggregation is an
exact integer/decimal sum with map-side partials (one shuffle on the
group key), and the final statistic is a fixed tree of IEEE float64
ops applied to those exact inputs — bitwise-identical across engines
and across partitionings, so the oracle mirrors the formula rather
than tolerating drift.

Reference parity note: the reference (pracdata/duckdb-pipeline)
delegates analytics SQL to embedded DuckDB (data_lake_transformer.py);
these queries are the analytics surface a training-data pipeline
actually runs on top of that engine — model-fit diagnostics before
trusting a quality score (AUC, regression), experiment readouts
(Welch), association mining (lift), and the file-skipping audit that
justifies the z-order writer (sinks.py write_zorder).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import QuerySpec
from .common import DSUM, dsum, load

_DEC = "decimal(38,0)"
_M20 = (1 << 20) - 1


def _limb_aggs(u, tag: str):
    """Exact sum of a nonnegative integer-valued long expression u <
    2^53 WITHOUT a decimal accumulator: three base-2^20 limb sums stay
    on Spark's long-backed aggregation fast path (the dsum_fp lesson —
    a per-row decimal(38,0) cast measured 2.51 s vs 0.83 s for these
    three squared-term sums at sf10). Envelope: the top limb is
    u >> 40 < 2^13, so each limb sum holds ~1.1e15 rows per group."""
    return [
        F.sum(F.shiftright(u, 40)).alias(f"{tag}a"),
        F.sum(F.shiftright(u, 20).bitwiseAND(F.lit(_M20))).alias(f"{tag}b"),
        F.sum(u.bitwiseAND(F.lit(_M20))).alias(f"{tag}c"),
    ]


def _limb_total(tag: str):
    """Per-GROUP exact recombination of the three limb sums into the
    decimal(38,0) total (identical to the oracle's HUGEINT sum);
    decimal arithmetic now runs once per group, not once per row."""
    return (
        F.col(f"{tag}a").cast(_DEC) * F.lit(1 << 40).cast(_DEC)
        + F.col(f"{tag}b").cast(_DEC) * F.lit(1 << 20).cast(_DEC)
        + F.col(f"{tag}c").cast(_DEC)
    )


# ---------------------------------------------------------------------------
# stats_regression_by_group: per-group OLS fit from exact sufficient stats
# ---------------------------------------------------------------------------


def stats_regression_by_group(spark, sf_dir):
    """Groupwise OLS (y = extendedprice on x = quantity, per
    returnflag): slope / intercept / r2 from EXACT integer sufficient
    statistics — the engines' streaming regr_* kernels are not
    bit-identical, but n, Sx, Sy, Sxx, Syy, Sxy built from scale-2
    fixed-point values are exact bigints/decimals with map-side
    partials, and the closed-form solution is one shared IEEE tree.

    This is the distributed model-fitting shape that scales: ONE
    shuffle on the group key moving a dozen longs per group, never
    the rows; the same sufficient-statistics pattern fits millions of
    per-entity micro-models (one group each) at 100 TB. The squared
    terms accumulate as base-2^20 limb sums (_limb_aggs — all-long
    map-side partials, sf10 A/B 2.51 -> 0.83 s) and recombine into
    exact decimal(38,0) per group."""
    li = load(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        *_limb_aggs(x * x, "xx"),
        *_limb_aggs(y * y, "yy"),
        *_limb_aggs(x * y, "xy"),
    ).select(
        "l_returnflag", "n", "sx", "sy",
        _limb_total("xx").alias("sxx"),
        _limb_total("yy").alias("syy"),
        _limb_total("xy").alias("sxy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast(_DEC), F.col("sy").cast(_DEC)
    numxy = (n * F.col("sxy") - sx * sy).cast("double")
    denx = (n * F.col("sxx") - sx * sx).cast("double")
    deny = (n * F.col("syy") - sy * sy).cast("double")
    slope = numxy / denx
    # x,y are scale-2 fixed point; slope is scale-free, intercept is in
    # fixed-point units -> one exact /100 rescale at the end
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / n
    return g.select(
        "l_returnflag",
        "n",
        slope.alias("slope"),
        (intercept / 100).alias("intercept"),
        ((numxy * numxy) / (denx * deny)).alias("r2"),
    )


REGRESSION_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sx,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
         SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS sxx,
         SUM(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS syy,
         SUM(CAST(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
                  * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       ((CAST(sy AS DOUBLE)
         - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
           * CAST(sx AS DOUBLE)) / n) / 100 AS intercept,
       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
         / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
FROM s
"""


# ---------------------------------------------------------------------------
# stats_welch_ttest: two-sample experiment readout from exact sums
# ---------------------------------------------------------------------------


def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test (purchase vs click event
    values): the A/B experiment readout, from exact scale-9
    fixed-point sums. Each arm contributes (n, Sx, Sxx) — three
    numbers, map-side partial-aggregated; t and the Welch–
    Satterthwaite df are one shared IEEE tree on those exact inputs
    (sqrt is IEEE-754 correctly-rounded, so it is cross-engine
    deterministic like + - * /).

    Scale shape: one partial-aggregated scan, a 2-row conditional
    pivot, zero joins. Fixed point is scale-2 (the event values carry
    two decimal digits, the agg_corr_exact precedent): xi <= ~3.3e4,
    so xi*xi stays a long per row; squared sums ride the all-long
    limb path (_limb_aggs) and recombine exactly per arm."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    xi = F.floor(F.col("value") * 100 + F.lit(0.5))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        *_limb_aggs(xi * xi, "xx"),
    ).select("event_type", "n", "sx", _limb_total("xx").alias("sxx"))
    p = g.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("sxx"))).alias("sxx1"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "click", F.col("sx"))).alias("sx2"),
        F.max(F.when(F.col("event_type") == "click", F.col("sxx"))).alias("sxx2"),
    )

    def arm(i: str):
        n = F.col(f"n{i}")
        nd = n.cast("double")
        mean = F.col(f"sx{i}").cast("double") / F.lit(100.0) / nd
        # var = (Sxx - Sx^2/n) / (n-1), all factors exact before the tree
        var = (
            (
                F.col(f"sxx{i}").cast("double")
                - F.col(f"sx{i}").cast("double") * F.col(f"sx{i}").cast("double") / nd
            )
            / F.lit(1e4)
            / (nd - F.lit(1.0))
        )
        return nd, mean, var

    n1, m1, v1 = arm("1")
    n2, m2, v2 = arm("2")
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / F.sqrt(se1 + se2)
    df = ((se1 + se2) * (se1 + se2)) / (
        se1 * se1 / (n1 - F.lit(1.0)) + se2 * se2 / (n2 - F.lit(1.0))
    )
    return p.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        m1.alias("mean_purchase"),
        m2.alias("mean_click"),
        t.alias("t_stat"),
        df.alias("welch_df"),
    )


_ARM_SQL = """
  SELECT event_type, count(*) AS n,
         SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sx,
         SUM(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                  * CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)) AS sxx
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY event_type
"""

WELCH_SQL = f"""
WITH g AS ({_ARM_SQL}),
p AS (
  SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
         max(CASE WHEN event_type = 'purchase' THEN sx END) AS sx1,
         max(CASE WHEN event_type = 'purchase' THEN sxx END) AS sxx1,
         max(CASE WHEN event_type = 'click' THEN n END) AS n2,
         max(CASE WHEN event_type = 'click' THEN sx END) AS sx2,
         max(CASE WHEN event_type = 'click' THEN sxx END) AS sxx2
  FROM g
),
d AS (
  SELECT n1, n2,
         CAST(sx1 AS DOUBLE) / 100.0 / CAST(n1 AS DOUBLE) AS m1,
         CAST(sx2 AS DOUBLE) / 100.0 / CAST(n2 AS DOUBLE) AS m2,
         (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
            / CAST(n1 AS DOUBLE)) / 1e4 / (CAST(n1 AS DOUBLE) - 1.0)
           / CAST(n1 AS DOUBLE) AS se1,
         (CAST(sxx2 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
            / CAST(n2 AS DOUBLE)) / 1e4 / (CAST(n2 AS DOUBLE) - 1.0)
           / CAST(n2 AS DOUBLE) AS se2
  FROM p
)
SELECT n1 AS n_purchase, n2 AS n_click, m1 AS mean_purchase, m2 AS mean_click,
       (m1 - m2) / sqrt(se1 + se2) AS t_stat,
       ((se1 + se2) * (se1 + se2))
         / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
            + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
FROM d
"""


# ---------------------------------------------------------------------------
# quality_auc_audit: exact tie-aware AUC of a quality signal
# ---------------------------------------------------------------------------


def quality_auc_audit(spark, sf_dir):
    """EXACT tie-aware ROC AUC of a quality signal (does document
    length predict lang = 'en'?) — the classifier-quality audit run
    before trusting any score threshold at 100 TB. AUC is computed by
    the rank-sum (Mann–Whitney) identity with average ranks, kept in
    INTEGER arithmetic throughout: per distinct score, rank2 =
    2*(count below) + (ties) + 1 is twice the average rank, so
    AUC = (sum(rank2 over positives) - n_pos*(n_pos+1)) /
    (2*n_pos*n_neg) — exact longs and ONE final IEEE divide.

    Scale shape: one groupBy on the score (map-side partials collapse
    the corpus to |distinct scores| rows) + one cumulative window over
    the DISTINCT score spine only (bounded: a quality score is
    low-cardinality by design; n_chars here has a few hundred distinct
    values, and a binned score keeps it so at any corpus size)."""
    docs = load(spark, sf_dir, "documents")
    by_score = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    ranked = by_score.select(
        "cnt",
        "pos",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("below"),
    )
    tot = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("pos") * (2 * F.col("below") + F.col("cnt") + 1)).alias("sum_r2"),
    )
    n_pos = F.col("n_pos")
    n_neg = F.col("n") - n_pos
    num = F.col("sum_r2") - n_pos * (n_pos + 1)
    den = 2 * n_pos * n_neg
    return tot.select(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        (num.cast("double") / den.cast("double")).alias("auc"),
    )


AUC_SQL = """
WITH by_score AS (
  SELECT n_chars AS score, count(*) AS cnt,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
  FROM documents GROUP BY n_chars
),
ranked AS (
  SELECT cnt, pos,
         SUM(cnt) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt AS below
  FROM by_score
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
         CAST(SUM(pos * (2 * below + cnt + 1)) AS BIGINT) AS sum_r2
  FROM ranked
)
SELECT n_pos, n - n_pos AS n_neg,
       CAST(sum_r2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * (n - n_pos) AS DOUBLE) AS auc
FROM tot
"""


# ---------------------------------------------------------------------------
# market_basket_lift: association mining over order baskets
# ---------------------------------------------------------------------------


def market_basket_lift(spark, sf_dir):
    """Brand-pair co-occurrence and lift over order baskets —
    association mining (the FP-growth 2-itemset readout) as ONE
    bounded pipeline: the (order, brand) distinct pairs collapse each
    order to its brand set (baskets are small — tens of items), pairs
    are emitted MAP-SIDE from the sorted basket array (a < b upper
    triangle, so never all-pairs across orders), and lift joins two
    broadcast-size dimension aggregates (25 brands, 300 pairs). The
    corpus shuffles twice on bounded keys (order, then pair) and the
    quadratic term is bounded by max basket size, not corpus size.
    Output: pairs seen in >= 5 orders with exact counts and
    lift = P(ab) / (P(a)P(b)) as one IEEE tree on exact longs.

    Plan shape (the overlap_matrix bit_or trick; sf1 A/B: 2.57 s
    collect_set(string) vs 2.83 s collect_set(int) vs 1.73 s this):
    each order's basket folds into ONE int64 BITMASK — bit_or is
    whole-stage-codegen'd with map-side partials, so the only
    fact-sized Exchange moves (orderkey, long) — then baskets
    DEDUPLICATE BY MASK VALUE before any pair expansion: pairs, brand
    totals and the order count all expand from the distinct-mask
    histogram (a few thousand rows however large the corpus).
    Envelope: brand vocabulary <= 64 bits (here 25); wider vocabs
    take the collect_set path this replaced."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    brands = sorted(
        r["p_brand"] for r in part.select("p_brand").distinct().collect()
    )
    n_b = len(brands)
    bmap = F.create_map(
        *[F.lit(x) for b, i in zip(brands, range(n_b)) for x in (b, i)]
    )
    masks = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == part.p_partkey)
        .select(
            F.col("l_orderkey").alias("o"),
            bmap[F.col("p_brand")].cast("int").alias("bid"),
        )
        .withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), bid)"))
        .groupBy("o")
        .agg(F.bit_or("bit").alias("mask"))
    )
    bym = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt")).persist()
    set_bits = f"filter(sequence(0, {n_b - 1}), a -> ((mask >> a) & 1) = 1)"
    pc = (
        bym.select(
            "cnt",
            F.explode(
                F.expr(
                    f"flatten(transform({set_bits}, a ->"
                    f" transform(filter({set_bits}, b2 -> b2 > a),"
                    " b2 -> struct(a AS ai, b2 AS bi))))"
                )
            ).alias("p"),
        )
        .groupBy("p.ai", "p.bi")
        .agg(F.sum("cnt").alias("pair_orders"))
    )
    bc = (
        bym.select("cnt", F.explode(F.expr(set_bits)).alias("bi"))
        .groupBy("bi")
        .agg(F.sum("cnt").alias("nb"))
    )
    n_orders = bym.agg(F.sum("cnt").alias("n_orders"))
    barr = F.array(*[F.lit(b) for b in brands])
    out = (
        pc.join(F.broadcast(bc.withColumnRenamed("bi", "ai")
                            .withColumnRenamed("nb", "na")), "ai")
        .join(F.broadcast(bc), "bi")
        .crossJoin(F.broadcast(n_orders))
        .where(F.col("pair_orders") >= 5)
    )
    lift = (
        F.col("pair_orders").cast("double") * F.col("n_orders").cast("double")
    ) / (F.col("na").cast("double") * F.col("nb").cast("double"))
    return out.select(
        F.element_at(barr, F.col("ai") + 1).alias("ba"),
        F.element_at(barr, F.col("bi") + 1).alias("bb"),
        "pair_orders",
        F.col("na").alias("orders_a"),
        F.col("nb").alias("orders_b"),
        lift.alias("lift"),
    )


BASKET_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pc AS (
  SELECT x.b AS ba, y.b AS bb, count(*) AS pair_orders
  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
  GROUP BY 1, 2
),
bc AS (SELECT b, count(*) AS nb FROM ob GROUP BY b),
n AS (SELECT count(DISTINCT o) AS n_orders FROM ob)
SELECT ba, bb, pair_orders, ca.nb AS orders_a, cb.nb AS orders_b,
       (CAST(pair_orders AS DOUBLE) * CAST(n_orders AS DOUBLE))
         / (CAST(ca.nb AS DOUBLE) * CAST(cb.nb AS DOUBLE)) AS lift
FROM pc JOIN bc ca ON pc.ba = ca.b JOIN bc cb ON pc.bb = cb.b CROSS JOIN n
WHERE pair_orders >= 5
"""


# ---------------------------------------------------------------------------
# layout_pruning_audit: data-skipping effectiveness of z-order vs insert order
# ---------------------------------------------------------------------------

# 27 bits covers the full key width at every scale this repo
# benchmarks INCLUDING the gen_scale replicas, whose key-offsetting
# inflates l_partkey to ~99M at the sf10 replica (2^27 = 134M; the
# original 16 bits aliased partkey from sf1 up, collapsing the audit's
# pruning signal, and a first fix at 21 bits covered canonical TPC-H
# sf10 but tripped the envelope guard on the replica's offset keys —
# the guard did its job). Past ~134M keys the in-plan assert fails
# fast rather than alias silently; z stays 54 bits, well inside long.
_ZBITS = 27
_N_CHUNKS = 32
_PK_LO, _PK_HI = 9000, 10999  # ~10% band of l_partkey


def _z_expr_sql(pk: str, sk: str) -> str:
    """Bit-interleave expression (Morton z-value) shared verbatim by
    both engines: bit b of each key lands at position 2b+1 / 2b."""
    terms = []
    for b in range(_ZBITS):
        terms.append(f"((({pk} >> {b}) & 1) * {1 << (2 * b + 1)})")
        terms.append(f"((({sk} >> {b}) & 1) * {1 << (2 * b)})")
    return " + ".join(terms)


def layout_pruning_audit(spark, sf_dir):
    """Data-skipping effectiveness audit: would the z-order layout
    (sinks.write_zorder) let a min/max-stats reader prune more chunks
    than insert order for a point-ish predicate on ONE of the two
    interleaved keys? The audit models each layout as equal-WIDTH
    chunks of its clustering value — z-chunks are the top 5 bits of
    the Morton value of (l_partkey, l_suppkey); insert-order chunks
    are orderkey ranges — computes per-chunk min/max of l_partkey
    (exact integer aggregation, map-side partials: chunk assignment is
    a bit-twiddle PROJECTION, no global sort and no window), and
    counts chunks whose [min,max] misses the band predicate
    l_partkey IN [9000, 11000). This is the planning report that
    justifies paying the z-order write: at 100 TB the same audit runs
    on parquet footer stats, but the data-derived version is
    layout-independent and oracle-checkable.

    Expected shape: z-chunks partition partkey-space (high pruning);
    insert-order chunks each span the full partkey range (zero
    pruning)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    z = F.expr(_z_expr_sql("l_partkey", "l_suppkey"))
    maxk = li.agg(
        F.max("l_orderkey").alias("maxk"),
        F.max(F.greatest("l_partkey", "l_suppkey")).alias("maxpk"),
    )
    # _ZBITS envelope: interleaving truncates each key to _ZBITS bits;
    # a key past 2^_ZBITS would alias z-chunks silently and fake the
    # audit's pruning conclusion — fail fast instead (value-preserving
    # assert fold, the CUSUM-guard idiom; one check per scan, not row).
    zguard = F.coalesce(
        F.assert_true(
            F.col("maxpk") < F.lit(1 << _ZBITS),
            F.lit(f"layout_pruning_audit: key exceeds {_ZBITS}-bit Morton envelope"),
        ).cast("long"),
        F.lit(0),
    )
    # Two column-pruned branch scans, one per layout. The single-scan
    # alternative (explode of a 2-struct array carrying both chunk
    # ids) was A/B'd and REJECTED at sf1: 0.56 -> 0.85 s — the explode
    # allocates per-row structs and evaluates BOTH chunk expressions
    # on every row, costing more than the second column-pruned pass
    # here; on an IO-bound cluster the one-pass variant is the swap.
    zchunk = li.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(z, 2 * _ZBITS - 5).alias("chunk"),
        "l_partkey",
    )
    ochunk = li.crossJoin(F.broadcast(maxk)).select(
        F.lit("insert_order").alias("layout"),
        (F.expr(f"(l_orderkey * {_N_CHUNKS}) div (maxk + 1)") + zguard).alias("chunk"),
        "l_partkey",
    )
    per_chunk = (
        zchunk.unionAll(ochunk)
        .groupBy("layout", "chunk")
        .agg(F.min("l_partkey").alias("mn"), F.max("l_partkey").alias("mx"))
    )
    pruned = F.when(
        (F.col("mx") < _PK_LO) | (F.col("mn") > _PK_HI), 1
    ).otherwise(0)
    out = per_chunk.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(pruned).alias("chunks_pruned"),
    )
    return out.select(
        "layout",
        "n_chunks",
        "chunks_pruned",
        (
            F.col("chunks_pruned").cast("double") / F.col("n_chunks").cast("double")
        ).alias("frac_pruned"),
    )


PRUNING_SQL = f"""
WITH z AS (
  SELECT 'zorder' AS layout,
         ({_z_expr_sql('l_partkey', 'l_suppkey')}) // {1 << (2 * _ZBITS - 5)}
           AS chunk,
         l_partkey
  FROM lineitem
),
o AS (
  SELECT 'insert_order' AS layout,
         (l_orderkey * {_N_CHUNKS})
           // ((SELECT max(l_orderkey) FROM lineitem) + 1) AS chunk,
         l_partkey
  FROM lineitem
),
per_chunk AS (
  SELECT layout, chunk, min(l_partkey) AS mn, max(l_partkey) AS mx
  FROM (SELECT * FROM z UNION ALL SELECT * FROM o) GROUP BY layout, chunk
)
SELECT layout, count(*) AS n_chunks,
       CAST(SUM(CASE WHEN mx < {_PK_LO} OR mn > {_PK_HI} THEN 1 ELSE 0 END)
            AS BIGINT) AS chunks_pruned,
       CAST(SUM(CASE WHEN mx < {_PK_LO} OR mn > {_PK_HI} THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pruned
FROM per_chunk GROUP BY layout
"""


QUERIES = {
    "stats_regression_by_group": QuerySpec(
        stats_regression_by_group,
        REGRESSION_SQL,
        "per-group OLS slope/intercept/r2 from exact sufficient statistics",
    ),
    "stats_welch_ttest": QuerySpec(
        stats_welch_ttest,
        WELCH_SQL,
        "Welch unequal-variance t-test (A/B readout) from exact fixed-point sums",
    ),
    "quality_auc_audit": QuerySpec(
        quality_auc_audit,
        AUC_SQL,
        "exact tie-aware ROC AUC of a quality signal via integer rank sums",
    ),
    "market_basket_lift": QuerySpec(
        market_basket_lift,
        BASKET_SQL,
        "brand-pair co-occurrence + lift over order baskets (bounded pair explode)",
    ),
    "layout_pruning_audit": QuerySpec(
        layout_pruning_audit,
        PRUNING_SQL,
        "z-order vs insert-order chunk min/max data-skipping effectiveness",
    ),
}


# ---------------------------------------------------------------------------
# stats_chi2_independence: contingency-table independence test
# ---------------------------------------------------------------------------

_CHI2_TERM = (
    "(CAST(o AS DOUBLE)"
    " - (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(n AS DOUBLE))"
    " * (CAST(o AS DOUBLE)"
    " - (CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(n AS DOUBLE))"
    " / ((CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)) / CAST(n AS DOUBLE))"
)


def stats_chi2_independence(spark, sf_dir):
    """Chi-square test of independence between event type and
    hour-of-day — the drift/seasonality readout for an event stream.
    The contingency table is ONE exact integer aggregation (type x
    hour, bounded cells with map-side partials); marginals re-derive
    from the cells (two tiny broadcast aggregates, no second scan);
    chi2 = sum (o - e)^2 / e with e = row*col/total — every factor an
    exact long cast to double, the per-cell terms summed with the
    decimal-exact idiom so association order cannot reorder ulps.
    Output: one row (n, dof, chi2)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    # hour via epoch arithmetic, not hour(): the session is pinned UTC,
    # so floor-div on micros is the same value without the per-row
    # ZoneId path (A/B'd at sf10: ~10% off the fold; equality verified
    # over the full sf10 events table)
    hh = ((F.unix_micros("ts") / 3_600_000_000).cast("long") % 24).cast("int")
    cells = ev.groupBy(
        "event_type", hh.alias("hh")
    ).agg(F.count(F.lit(1)).alias("o"))
    # Marginals as WINDOWS over the bounded cell table (|types| x 24
    # rows), not join-backs: the r9 shape re-consumed the cells subtree
    # through three aggregate branches + two broadcast joins, and the
    # whole query measured 1.18 s at sf10 against a 0.53 s contingency
    # fold — the marginal plumbing cost MORE than the 100M-row fold it
    # decorated. Three windows over 120 rows are free and the events
    # scan happens exactly once (sf10: 1.18 -> ~0.55 s, exp r10).
    j = cells.select(
        "event_type",
        "hh",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rn"),
        F.sum("o").over(Window.partitionBy("hh")).alias("cn"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = (
        F.col("rn").cast("double") * F.col("cn").cast("double")
    ) / F.col("n").cast("double")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    out = j.agg(
        F.max("n").alias("n"),
        (
            (F.countDistinct("event_type") - F.lit(1))
            * (F.countDistinct("hh") - F.lit(1))
        ).alias("dof"),
        dsum(term).alias("chi2"),
    )
    return out.select("n", "dof", "chi2")


CHI2_SQL = f"""
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hh, count(*) AS o
  FROM events GROUP BY 1, 2
),
rows_m AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rn FROM cells GROUP BY 1),
cols_m AS (SELECT hh, CAST(SUM(o) AS BIGINT) AS cn FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
j AS (
  SELECT c.o, r.rn, cm.cn, t.n, c.event_type, c.hh
  FROM cells c JOIN rows_m r USING (event_type)
  JOIN cols_m cm USING (hh) CROSS JOIN tot t
)
SELECT max(n) AS n,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT hh) - 1)
            AS BIGINT) AS dof,
       {DSUM(_CHI2_TERM)} AS chi2
FROM j
"""


# ---------------------------------------------------------------------------
# quality_ks_test: two-sample Kolmogorov-Smirnov distance, exact
# ---------------------------------------------------------------------------


def quality_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic between the length
    distributions of two sources (src0 vs src1) — the
    distribution-shift audit run before mixing a new crawl slice into
    training data. Kept EXACT end to end: the CDF gap at each distinct
    length is |cum0*n1 - cum1*n0| (cross-multiplied integers — no
    float CDFs), the max is an integer max, and the statistic is ONE
    final IEEE division. Output: (n0, n1, d_num, ks_d).

    Scale shape: one groupBy collapses the corpus to the distinct
    length spine (map-side partials), one cumulative window over that
    bounded spine (the quality_auc_audit precedent), one global max."""
    docs = load(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1")
    )
    by_len = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = by_len.select(
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
    )
    # cross-multiplied gap needs n0/n1 per row: broadcast the totals
    totals = by_len.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    gaps = cum.crossJoin(F.broadcast(totals)).select(
        "n0",
        "n1",
        F.abs(
            F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0")
        ).alias("g"),
    )
    out = gaps.groupBy("n0", "n1").agg(F.max("g").alias("d_num"))
    return out.select(
        "n0",
        "n1",
        "d_num",
        (
            F.col("d_num").cast("double")
            / (F.col("n0").cast("double") * F.col("n1").cast("double"))
        ).alias("ks_d"),
    )


KS_SQL = """
WITH by_len AS (
  SELECT n_chars AS v,
         CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM documents WHERE source IN ('src0', 'src1') GROUP BY n_chars
),
cum AS (
  SELECT SUM(c0) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
         SUM(c1) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
  FROM by_len
),
totals AS (SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1 FROM by_len)
SELECT t.n0, t.n1,
       CAST(max(abs(c.cum0 * t.n1 - c.cum1 * t.n0)) AS BIGINT) AS d_num,
       CAST(max(abs(c.cum0 * t.n1 - c.cum1 * t.n0)) AS DOUBLE)
         / (CAST(t.n0 AS DOUBLE) * CAST(t.n1 AS DOUBLE)) AS ks_d
FROM cum c CROSS JOIN totals t
GROUP BY t.n0, t.n1
"""


QUERIES.update(
    {
        "stats_chi2_independence": QuerySpec(
            stats_chi2_independence,
            CHI2_SQL,
            "chi-square independence test (event type x hour) from exact counts",
        ),
        "quality_ks_test": QuerySpec(
            quality_ks_test,
            KS_SQL,
            "exact two-sample Kolmogorov-Smirnov distance between source length CDFs",
        ),
    }
)
