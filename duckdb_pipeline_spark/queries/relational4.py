"""Round-3 session additions: the last three TPC-H shapes (Q2/Q11/Q20),
previously recorded as a schema gap because the driver schema has no
partsupp table. The gap closes by DERIVING the part-supplier relation
from lineitem — ``ps(partkey, suppkey, supply_cost=min price seen,
qty=total shipped)`` — which preserves each query's defining SHAPE:

- Q2: correlated scalar MIN subquery (min-cost supplier per part
  within a region) + multi-dim join + deterministic top-N;
- Q11: grouped value share vs a scalar-subquery global total
  (HAVING > fraction-of-total);
- Q20: nested IN subqueries (suppliers shipping enough of the
  selected parts).

All aggregation uses MIN/exact fixed-point sums, so both engines
produce bitwise-identical doubles (see queries.common). Derivation
cost note (100 TB): ``ps`` is one groupBy over lineitem on
(l_partkey, l_suppkey) — the same key the downstream joins use, so
AQE reuses the shuffle layout; no extra pass vs a materialized
partsupp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import QuerySpec
from .common import DSUM, dsum_fp, load


def _ps(spark, sf_dir, li_filter=None):
    """Derived partsupp: one row per (part, supplier) pair seen in
    lineitem, with min observed unit price as the supply cost and total
    shipped quantity (exact sum).

    ``li_filter(li) -> li`` pre-filters lineitem BEFORE the pair
    groupBy. Each caller's query restricts ps to a filtered part or
    supplier subset, so deriving only that slice is semantics-
    preserving and turns the near-key-cardinality pair aggregation
    (517k groups from 600k rows at sf0.1 — a full-table shuffle) into a
    small one; at 100 TB this is the difference between shuffling the
    fact table and shuffling the qualifying slice."""
    li = load(spark, sf_dir, "lineitem")
    if li_filter is not None:
        li = li_filter(li)
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        dsum_fp("l_quantity").alias("ps_qty"),
    )


_PS_SQL = f"""
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice) AS ps_supplycost,
         {DSUM('l_quantity')} AS ps_qty
  FROM lineitem GROUP BY 1, 2
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for ECONOMY parts of size <= 5, the EUROPE
    supplier(s) offering the minimum supply cost — the correlated
    scalar-MIN subquery expressed as a per-part min over the regional
    ps relation joined back on equality (MIN is arithmetic-free, so the
    double equality is engine-stable). Dims broadcast; the ps groupBy
    and the min-per-part reuse the same partkey shuffle."""
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 5)
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # ps restricted to the filtered parts up front (the query — outer
    # block AND correlated min — only ever reads those partkeys)
    wanted = part.select("p_partkey")
    regional = (
        _ps(
            spark,
            sf_dir,
            li_filter=lambda li: li.join(
                F.broadcast(wanted), li.l_partkey == wanted.p_partkey, "left_semi"
            ),
        )
        .join(supp, F.col("ps_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    best = regional.groupBy(F.col("ps_partkey").alias("b_partkey")).agg(
        F.min("ps_supplycost").alias("b_cost")
    )
    return (
        regional.join(
            best,
            (F.col("ps_partkey") == F.col("b_partkey"))
            & (F.col("ps_supplycost") == F.col("b_cost")),
        )
        .join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH ps AS ({_PS_SQL})
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       ps_supplycost AS supply_cost
FROM part
JOIN ps ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND p_size <= 5 AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT min(ps2.ps_supplycost)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q11_important_value(spark, sf_dir):
    """TPC-H Q11 shape: per-part supply value (cost x shipped qty,
    exact integer fixed point at scale 4 — both factors have <= 2
    decimal digits, so scale-2 units are exact and their product is an
    exact scale-4 long; sums accumulate as decimal(38,0) = DuckDB
    HUGEINT) restricted to NATION_1 suppliers, keeping parts whose
    value exceeds 0.1% of the nation total (scalar-subquery HAVING).
    The fraction threshold is one IEEE multiply on identical operands."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    dec = "decimal(38,0)"
    units = (
        F.round(F.col("ps_supplycost") * 100).cast("long")
        * F.round(F.col("ps_qty") * 100).cast("long")
    ).cast(dec)
    # ps restricted to the nation's suppliers up front (both the
    # per-part values and the total read only this slice)
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    ).select("s_suppkey")
    national = (
        _ps(
            spark,
            sf_dir,
            li_filter=lambda li: li.join(
                F.broadcast(nat_supp), li.l_suppkey == nat_supp.s_suppkey, "left_semi"
            ),
        )
        .join(supp, F.col("ps_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(F.col("ps_partkey"), units.alias("u"))
    )
    per_part = national.groupBy("ps_partkey").agg(
        (F.sum("u").cast("double") / F.lit(1e4)).alias("part_value")
    )
    total = national.groupBy().agg(
        (F.sum("u").cast("double") / F.lit(1e4)).alias("total_value")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select("ps_partkey", "part_value")
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


Q11_SQL = f"""
WITH ps AS ({_PS_SQL}),
national AS (
  SELECT ps_partkey,
         CAST(CAST(round(ps_supplycost * 100) AS BIGINT)
              * CAST(round(ps_qty * 100) AS BIGINT) AS HUGEINT) AS u
  FROM ps
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_1'
)
SELECT ps_partkey, CAST(SUM(u) AS DOUBLE) / 1e4 AS part_value
FROM national
GROUP BY ps_partkey
HAVING CAST(SUM(u) AS DOUBLE) / 1e4
       > 0.001 * (SELECT CAST(SUM(u) AS DOUBLE) / 1e4 FROM national)
ORDER BY part_value DESC, ps_partkey
"""


def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than 100 units of
    small/red-ish parts during 1996 — the nested-IN pattern (parts IN
    name-filter, suppliers IN qty-threshold set) as two left-semi
    joins; the threshold aggregate is an exact fixed-point sum."""
    part = load(spark, sf_dir, "part").where(
        F.col("p_name").startswith("red")
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum_fp("l_quantity").alias("qty_1996"))
        .where(F.col("qty_1996") > 100)
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING {DSUM('l_quantity')} > 100)
ORDER BY s_name
"""


def stats_trimmed_mean(spark, sf_dir):
    """Robust corpus statistics: 5%-trimmed mean of document length per
    source — the winsorize/trim pass a corpus-quality report runs to
    keep outlier pages from skewing per-source length profiles. Exact
    cross-engine: lengths are integers, the kept-range sum is an exact
    long, and the mean is ONE IEEE divide of identical operands. Rows
    at the cut are dropped by (value, doc_id) rank; ties straddling the
    cut have equal values, so the kept SUM is rank-choice-invariant.
    Scale shape: one hash Exchange on source for the window rank, then
    partial-agg'd sums — no global sort."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("cnt"),
    ).withColumn("k", F.expr("cast(cnt * 5 / 100 as bigint)"))
    kept = ranked.where((F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("cnt") - F.col("k")))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_len"),
        (F.sum("n_chars") / F.count(F.lit(1))).cast("double").alias("trimmed_mean_len"),
    )


TRIMMED_MEAN_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM documents
),
kept AS (
  SELECT source, n_chars FROM ranked
  WHERE rn > cnt * 5 // 100 AND rn <= cnt - cnt * 5 // 100
)
SELECT source, count(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_len,
       CAST(CAST(SUM(n_chars) AS DOUBLE) / count(*) AS DOUBLE) AS trimmed_mean_len
FROM kept GROUP BY source
"""


def fuzzy_match_names(spark, sf_dir):
    """Entity resolution with planted ground truth: every customer name
    is deterministically corrupted (5th character dropped), then each
    corrupted record is matched back against the clean table — BLOCKED
    on the stable name suffix (right 3 chars, which the corruption
    preserves), verified with integer Levenshtein distance (bitwise
    cross-engine), resolved by per-probe argmin (min struct(dist, id)).
    Output: (probe_id, matched_id, dist) — the planted pairs resolve at
    dist=1 with matched_id == probe_id.

    Scale shape: blocking bounds the pair space (suffix blocks, never
    all-pairs — the same discipline as the LSH/IVF/shingle families);
    the match is one shuffle join on the block key plus a per-probe
    partial-aggregated argmin."""
    # Round-10 rework (found by the sf10 hazard sweep): the direct
    # probe⋈base block join is quadratic in NAME MULTIPLICITY — the
    # scale replica carries each name 100x, so 1000 suffix blocks of
    # 1500 rows meant 2.25e9 Levenshtein calls (the sweep's one >15 min
    # query). Both sides now collapse to DISTINCT names first; this is
    # argmin-IDENTICAL by construction: dist depends only on the name
    # text, and among equal-dist duplicates min(struct(dist, custkey))
    # always elects the minimum custkey — exactly what min-per-name
    # pre-aggregation keeps. Matches compute once per distinct
    # corrupted string and broadcast back onto the probe ids. Pair
    # space drops multiplicity^2 (replica: 2.25e9 -> ~225k pairs); on
    # a unique-name corpus the dedup is a partial-agged no-op pass.
    base = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.expr("right(c_name, 3)").alias("blk")
    )
    base_d = base.groupBy("c_name", "blk").agg(
        F.min("c_custkey").alias("c_custkey")
    )
    probe = base.select(
        F.col("c_custkey").alias("probe_id"),
        F.expr("substr(c_name, 1, 4) || substr(c_name, 6)").alias("corrupted"),
    )
    probe_d = probe.select(
        "corrupted", F.expr("right(corrupted, 3)").alias("blk")
    ).distinct()
    cand = probe_d.join(base_d, "blk").select(
        "corrupted",
        "c_custkey",
        F.levenshtein("corrupted", "c_name").alias("dist"),
    )
    best = (
        cand.groupBy("corrupted")
        .agg(F.min(F.struct("dist", "c_custkey")).alias("b"))
        .select(
            "corrupted",
            F.col("b.c_custkey").alias("matched_id"),
            F.col("b.dist").alias("dist"),
        )
    )
    return probe.join(F.broadcast(best), "corrupted").select(
        "probe_id", "matched_id", "dist"
    )


FUZZY_MATCH_SQL = """
WITH base_d AS (
  SELECT c_name, right(c_name, 3) AS blk, min(c_custkey) AS c_custkey
  FROM customer GROUP BY 1, 2
),
probe AS (
  SELECT c_custkey AS probe_id,
         substr(c_name, 1, 4) || substr(c_name, 6) AS corrupted
  FROM customer
),
probe_d AS (
  SELECT DISTINCT corrupted, right(corrupted, 3) AS blk FROM probe
),
cand AS (
  SELECT p.corrupted, b.c_custkey, levenshtein(p.corrupted, b.c_name) AS dist
  FROM probe_d p JOIN base_d b USING (blk)
),
rk AS (
  SELECT corrupted, c_custkey, dist,
         row_number() OVER (PARTITION BY corrupted ORDER BY dist, c_custkey) AS rn
  FROM cand
)
SELECT probe_id, c_custkey AS matched_id, dist
FROM probe JOIN rk USING (corrupted) WHERE rn = 1
"""


def events_robust_outliers(spark, sf_dir):
    """Robust outlier gate per event type: median/MAD z-score (the
    data-cleaning pass that survives heavy tails where mean/stddev
    break — |x - med| > 3.5 * 1.4826 * MAD, the standard consistency
    constant). Exact cross-engine: Spark ``percentile`` and DuckDB
    ``quantile_cont`` share the interpolated definition (verified
    bitwise on this data, see queries/sketches.py), both medians
    derive from identical doubles, and the threshold comparison is
    single IEEE ops on identical operands.

    Scale shape: two partial-aggregated corpus passes (median of
    value, then median of |value - med| against the broadcast
    per-type medians) and one counting pass — the per-type stats
    tables are bounded by the event-type dimension, so every join is
    a broadcast and nothing corpus-sized shuffles beyond the
    three groupBy partials."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        F.max("med").alias("med"),
    )
    flagged = ev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(3.5) * F.lit(1.4826) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
        )
    )


ROBUST_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad,
         max(m.med) AS med
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type, count(*) AS n,
       CAST(SUM(CASE WHEN abs(e.value - d.med) > 3.5 * 1.4826 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(d.med), 6) AS med,
       round(max(d.mad), 6) AS mad
FROM events e JOIN mad d USING (event_type)
GROUP BY e.event_type
"""


def profile_table_summary(spark, sf_dir):
    """SUMMARIZE-style one-row-per-column data profile of `documents`:
    (col_name, n_rows, n_nulls, n_distinct, min_str, max_str, avg_len)
    — the table-profiling surface an engine exposes for planning and
    data-quality gates (DuckDB's SUMMARIZE; Spark's
    `df.summary()` covers only numeric moments, so this is built as
    declared aggregation).

    Shape: one branch per column, unioned — each branch is a
    column-pruned scan + partial-aggregated (count / countDistinct /
    min / max / sum-of-length) fold, so total I/O equals reading each
    profiled column once (the same bytes ONE multi-countDistinct pass
    costs, without that plan's row Expand: Spark rewrites N
    countDistincts in one aggregate as an N-way Expand of every input
    row — at 100 TB that is N x corpus rows through the first
    shuffle, strictly worse than N independent skinny folds that run
    concurrently). min/max render through a string cast so one output
    schema serves every column type; numeric columns min/max
    numerically BEFORE the cast."""
    docs = load(spark, sf_dir, "documents")
    branches = []
    for c in ["doc_id", "text", "lang", "source", "n_chars"]:
        col = F.col(c)
        branches.append(
            docs.select(col).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
                F.countDistinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_str"),
                F.max(col).cast("string").alias("max_str"),
                F.avg(F.length(col.cast("string"))).alias("avg_len"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str,
       avg(length(CAST({c} AS VARCHAR))) AS avg_len
FROM documents"""
    for c in _PROFILE_COLS
)


def profile_key_skew(spark, sf_dir):
    """Join-key skew diagnostic: for each key family a pipeline
    shuffles on (events.user_id, lineitem.l_suppkey, orders.o_custkey),
    one row of distribution stats — row/key counts, the hottest key's
    count, exact interpolated p50/p99 of the per-key counts, and
    hot_key_factor = max_cnt / mean_cnt (how many times the average
    partition the hottest key's rows are). This is the report that
    decides whether a join needs salting (`join_salted_skew`,
    `agg_salted_hot_keys`) or AQE skew splitting suffices — run it
    BEFORE the 100 TB shuffle, not after it straggles.

    Scale shape: per family ONE groupBy(key) count plus a singleton
    aggregation of the (skinny) count column; the three families run
    as one union, concurrently."""
    branches = []
    for family, table, key in [
        ("events.user_id", "events", "user_id"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ]:
        counts = (
            load(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        branches.append(
            counts.agg(
                F.lit(family).alias("key_family"),
                F.sum("c").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("c").alias("max_cnt"),
                F.expr("percentile(c, array(0.5, 0.99))").alias("_p"),
            ).select(
                "key_family",
                "n_rows",
                "n_keys",
                "max_cnt",
                F.col("_p")[0].alias("p50_cnt"),
                F.col("_p")[1].alias("p99_cnt"),
                F.expr(
                    "CAST(max_cnt AS DOUBLE) * n_keys / n_rows"
                ).alias("hot_key_factor"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


KEY_SKEW_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{family}' AS key_family, n_rows, n_keys, max_cnt, p50_cnt, p99_cnt,
       CAST(max_cnt AS DOUBLE) * n_keys / n_rows AS hot_key_factor
FROM (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_cnt,
         quantile_cont(c, 0.5) AS p50_cnt, quantile_cont(c, 0.99) AS p99_cnt
  FROM (SELECT {key}, count(*) AS c FROM {table} GROUP BY {key}) t
) s"""
    for family, table, key in [
        ("events.user_id", "events", "user_id"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ]
)


def quality_expectations_gate(spark, sf_dir):
    """Expectations-style DATA QUALITY GATE (the Great-Expectations /
    dbt-test shape): a fixed suite of declarative checks evaluated in
    ONE pass per table, each emitting (table, check, observed, passed)
    — the admission gate a pipeline runs before promoting a batch to
    silver. Checks: primary-key uniqueness, null counts, enum-domain
    containment, value ranges, referential orphans. All observations
    are exact integer counts; `passed` is an integer comparison — the
    whole report is hash-checked.

    Scale shape: EXACTLY one aggregation pass per table — the
    referential check no longer runs its own anti-join scan of orders
    (round 11, VERDICT r10 #8): customer's key set folds to per-word
    64-bit BITMAPS (1.5M keys -> ~23k (word, bits) rows at sf10, a
    ~65x smaller broadcast than the anti-join's key hash relation),
    the orders fold left-joins that broadcast on the key's word and
    the orphan test is one AND+compare expression riding the same
    shuffle as every other orders check (A/B at sf10: 0.99 s fused vs
    1.22 s with the separate anti-join branch; identical counts). At
    extreme dimension cardinality (1B+ keys) the bitmap broadcast is
    ~n/64*16B — fall back to the plain anti-join branch there. No
    row-level materialization of violations (a debugging variant
    would sample them; the gate only counts)."""
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")

    def word_fold(df, pk: str, extra: dict):
        """ONE fused fold per table (round 10; was three branches whose
        countDistinct Expand made the gate 5.98x at sf10): rows group
        by the pk's 64-bit BITMAP WORD (shiftright 6), each word
        aggregates bit_or(1 << pk%64) — an exact distinct-count as
        popcount, no Expand, no id-level shuffle (10M ids -> ~156k
        word rows) — and every scalar check (``extra``: name -> count
        expression) rides the SAME shuffle as a map-side partial.
        dup_pk = n - sum(bit_count) equals count(*) - countDistinct
        exactly: NULL pks contribute to n, never to a bitmap (their
        word group's bit_or is NULL -> popcount 0), matching
        countDistinct's null-exclusion."""
        per_word = df.groupBy(F.shiftright(F.col(pk), 6).alias("w")).agg(
            F.bit_or(
                F.when(
                    F.col(pk).isNotNull(),
                    F.expr(f"shiftleft(1L, cast(pmod({pk}, 64) as int))"),
                )
            ).alias("bits"),
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(cond, 1).otherwise(0)).alias(name)
                for name, cond in extra.items()
            ],
        )
        return per_word.agg(
            F.sum("n").alias("n"),
            (
                F.sum("n")
                - F.sum(F.bit_count(F.coalesce(F.col("bits"), F.lit(0))))
            ).alias("dup_pk"),
            *[F.sum(name).alias(name) for name in extra],
        )

    ev_checks = word_fold(
        ev,
        "event_id",
        {
            "null_user": F.col("user_id").isNull(),
            "bad_enum": ~F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "neg_value": F.col("value") < 0,
        },
    )
    # Referential orphans ride the orders fold as a word-bitmap probe.
    # (History: an id-level broadcast LEFT join in-fold was A/B'd and
    # rejected in round 10 — the 1.5M-key hash build+probe added ~1 s;
    # the per-word bitmap build side is ~23k rows and beats BOTH that
    # and the standalone anti-join branch it replaces.) NULL o_custkey:
    # no word row matches -> cbits IS NULL -> counted as an orphan,
    # matching the previous left_anti semantics (a NULL key references
    # no customer).
    cust_words = cust.groupBy(
        F.shiftright("c_custkey", 6).alias("cw")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(1L, cast(pmod(c_custkey, 64) as int))")
        ).alias("cbits")
    )
    orders_probed = orders.join(
        F.broadcast(cust_words),
        F.shiftright(F.col("o_custkey"), 6) == F.col("cw"),
        "left",
    )
    is_orphan = F.col("cbits").isNull() | (
        F.expr("cbits & shiftleft(1L, cast(pmod(o_custkey, 64) as int))") == 0
    )
    ord_checks = word_fold(
        orders_probed,
        "o_orderkey",
        {"bad_price": F.col("o_totalprice") <= 0, "n_orphans": is_orphan},
    )

    def rows(df, table, checks):
        r = df.select(
            F.lit(table).alias("tbl"),
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check"),
                        F.col(col).cast("long").alias("observed"),
                    )
                    for name, col in checks
                ]
            ).alias("cs"),
        ).select("tbl", F.explode("cs").alias("c"))
        return r.select(
            "tbl",
            F.col("c.check").alias("check"),
            F.col("c.observed").alias("observed"),
            (F.col("c.observed") == 0).alias("passed"),
        )

    out = rows(
        ev_checks,
        "events",
        [("pk_unique", "dup_pk"), ("user_not_null", "null_user"),
         ("event_type_domain", "bad_enum"), ("value_nonnegative", "neg_value")],
    ).unionByName(
        rows(
            ord_checks,
            "orders",
            [("pk_unique", "dup_pk"), ("price_positive", "bad_price"),
             ("custkey_references_customer", "n_orphans")],
        )
    )
    return out


EXPECTATIONS_SQL = """
WITH ev AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT event_id) AS dup_pk,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
         SUM(CASE WHEN event_type NOT IN
               ('view', 'click', 'purchase', 'signup', 'error')
             THEN 1 ELSE 0 END) AS bad_enum,
         SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS neg_value
  FROM events
),
o AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT o_orderkey) AS dup_pk,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price
  FROM orders
),
orph AS (
  SELECT count(*) AS n_orphans FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT 'events' AS tbl, 'pk_unique' AS "check",
       CAST(dup_pk AS BIGINT) AS observed, dup_pk = 0 AS passed FROM ev
UNION ALL SELECT 'events', 'user_not_null', CAST(null_user AS BIGINT), null_user = 0 FROM ev
UNION ALL SELECT 'events', 'event_type_domain', CAST(bad_enum AS BIGINT), bad_enum = 0 FROM ev
UNION ALL SELECT 'events', 'value_nonnegative', CAST(neg_value AS BIGINT), neg_value = 0 FROM ev
UNION ALL SELECT 'orders', 'pk_unique', CAST(dup_pk AS BIGINT), dup_pk = 0 FROM o
UNION ALL SELECT 'orders', 'price_positive', CAST(bad_price AS BIGINT), bad_price = 0 FROM o
UNION ALL SELECT 'orders', 'custkey_references_customer',
       CAST(n_orphans AS BIGINT), n_orphans = 0 FROM orph
"""


QUERIES = {
    "quality_expectations_gate": QuerySpec(
        quality_expectations_gate,
        EXPECTATIONS_SQL,
        "expectations-style data-quality gate (pk/nulls/domain/range/referential) in one pass per table",
    ),
    "profile_key_skew": QuerySpec(
        profile_key_skew,
        KEY_SKEW_SQL,
        "join-key skew diagnostic (hot-key factor, count percentiles) per key family",
    ),
    "profile_table_summary": QuerySpec(
        profile_table_summary,
        PROFILE_SQL,
        "SUMMARIZE-style per-column table profile (count/nulls/ndv/min/max/avg-len)",
    ),
    "events_robust_outliers": QuerySpec(
        events_robust_outliers,
        ROBUST_OUTLIERS_SQL,
        "median/MAD robust z-score outlier gate per event type",
    ),
    "fuzzy_match_names": QuerySpec(
        fuzzy_match_names,
        FUZZY_MATCH_SQL,
        "blocked Levenshtein entity resolution with planted corruption",
    ),
    "q2_min_cost_supplier": QuerySpec(
        q2_min_cost_supplier, Q2_SQL, "TPC-H Q2 correlated-min supplier"
    ),
    "stats_trimmed_mean": QuerySpec(
        stats_trimmed_mean, TRIMMED_MEAN_SQL, "5%-trimmed per-source length mean"
    ),
    "q11_important_value": QuerySpec(
        q11_important_value, Q11_SQL, "TPC-H Q11 fraction-of-total HAVING"
    ),
    "q20_potential_promotion": QuerySpec(
        q20_potential_promotion, Q20_SQL, "TPC-H Q20 nested-IN suppliers"
    ),
}
