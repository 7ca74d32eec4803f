"""Model-based quality filtering over `documents` — the two signals
public LLM-corpus pipelines (CCNet / GPT-3-style curation; Wenzek et
al. 2020) run beyond rule thresholds:

- **unigram-LM cross-entropy** (`text_unigram_xent`): score each doc by
  the corpus's own unigram language model; verbose boilerplate and
  gibberish sit at the tails. The distributed perplexity-filter proxy.
- **logistic quality classifier** (`quality_logreg_score`): a fixed
  linear model over the engine's quality features, squashed through a
  sigmoid — the plumbing of a trained classifier-in-the-loop with
  illustrative public coefficients (swap the literals for trained ones;
  the plan is identical).

Cross-engine determinism: `ln`/`exp` may differ by 1 ulp between the
JVM and libm, so every transcendental RESULT is rounded to 6 decimals
before any further arithmetic (per-term for the LM: a 1-ulp input
wiggle flips a 6-decimal rounding with probability ~4e-10 per distinct
token — negligible across the whole vocabulary); sums of the rounded
terms use the decimal-exact idiom (`common.dsum`), so association
order cannot reorder ulps. Everything else is single IEEE ops on
identical operands (see queries/common.py module doc).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import STOPWORDS
from . import QuerySpec
from .common import DSUM, dsum, load
from .llmtext import STOPWORD_SQL_LIST


def text_unigram_xent(spark, sf_dir):
    """Per-document cross-entropy under the corpus unigram LM:
    H(d) = -(1/n_d) * sum_t tf_dt * ln(cnt_t / T).

    Scale shape: tf comes from the SHARED materialized (doc, token, tf)
    projection (queries/tokcache.py — written once per corpus version,
    VERDICT r10 #4; this query previously derived and session-persisted
    its own). tf feeds both the vocabulary groupBy and the scoring
    join; the bucketed table replaces the per-session derive+persist
    with a plain parquet read. Per-token log-probs are map-side; one
    final per-doc groupBy folds the exact fixed-point sum. The
    vocabulary join is pinned shuffled-hash (see below). No windows,
    no collect."""
    from .tokcache import doc_tf

    tf = doc_tf(spark, sf_dir).where(F.col("token") != "")
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    # T folds over the tf rows DIRECTLY (optimization r15, VERDICT r14
    # #4): sum(tf) == sum over vocab of cnt exactly (both long sums of
    # the same values), but the vocab form re-derived the token groupBy
    # — Spark does not CSE across branches, so vocab's scan + token-
    # scale Exchange ran TWICE (tot + q). The direct fold is one
    # column-pruned scan with a map-side partial agg and no keyed
    # Exchange, leaving vocab single-consumer; tf scans 3 -> 3 but the
    # second vocab shuffle is gone at every scale.
    tot = tf.agg(F.sum("tf").cast("double").alias("t"))
    q = vocab.crossJoin(F.broadcast(tot)).select(
        "token", F.round(F.log(F.col("cnt") / F.col("t")), 6).alias("lp")
    )
    # dsum_fp, not dsum (the dsir_importance precedent, same shape):
    # lp = round(x, 6) satisfies the fast path's precondition exactly
    # and tf * lp scales lp's exact scale-9 integer by an exact long
    # (|tf * lp| <= ~2e5 << the 4e6 envelope), so the long fixed-point
    # sum is bitwise-equal to the decimal-idiom oracle while staying on
    # Spark's long-backed aggregation path — the decimal accumulator
    # was the dominant cost of the 100M-row scoring fold at sf10
    # (41.1 s -> see BASELINE round-10 late rows)
    from .common import dsum_fp

    # SHUFFLE_HASH on the vocab side: the static planner's estimate for
    # the persisted tf relation was small enough that it BROADCAST the
    # 16M-row tf table as the build side (BuildLeft, found by the sf10
    # plan audit — the same OOM class as the jaccard-prefix sweep
    # failure). The hint pins build = q; a forced broadcast of q would
    # be faster on THIS corpus (3.1k tokens) but the vocab of a web
    # corpus is unbounded (urls/hashes), so the scale-safe shuffled
    # hash join is the declared shape.
    agg = (
        tf.join(q.hint("shuffle_hash"), "token")
        .groupBy("doc_id")
        .agg(
            dsum_fp(F.col("tf") * F.col("lp")).alias("s"),
            F.sum("tf").alias("n"),
        )
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.round(-F.col("s") / F.col("n"), 6).alias("xent"),
    )


UNIGRAM_XENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM toks WHERE token <> '' GROUP BY doc_id, token
),
vocab AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY token),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS t FROM vocab),
q AS (SELECT token, round(ln(cnt / t), 6) AS lp FROM vocab, tot),
agg AS (
  SELECT f.doc_id, {DSUM('f.tf * q.lp')} AS s, CAST(SUM(f.tf) AS BIGINT) AS n
  FROM tf f JOIN q USING (token) GROUP BY f.doc_id
)
SELECT doc_id, n AS n_tokens, round(-(s) / n, 6) AS xent FROM agg
"""


def text_bigram_xent(
    spark, sf_dir, tokenizer="space", docs=None, carry=(), ref_docs=None
):
    """Per-document cross-entropy under a BIGRAM LM with Stupid
    Backoff (Brants et al. 2007), trained on the reference slice
    (source = 'src0' — the CCNet pattern: score the whole crawl
    against a clean-corpus LM; Wenzek et al. 2020 use Wikipedia):

        p(w2 | w1) = cnt2(w1,w2) / cnt1(w1)        if the bigram is in
                                                   the reference LM
                   = 0.4 * margin(w2) / T          else if w2 seen as a
                                                   continuation
                   = 0.4 / T                       full OOV floor

    where margin(w2) = reference count of w2 as a bigram continuation
    and T = total reference bigrams. Docs with fewer than 2 tokens
    have no bigram and drop out (both engines).

    Scale shape: everything stays in whole-stage codegen — scoring is
    INSTANCE-level over the exploded bigram stream (a per-doc tf
    compression was measured and rejected: both the relational
    groupBy(doc, w1, w2) and an Arrow Counter kernel cost MORE than
    the instance rows they save — 5.8 s / 4.3 s vs 1.9 s for the bare
    explode at sf1 — because per-doc tf is nearly 1 anyway on natural
    text). The reference LM's three tables (bigram counts, context
    counts, continuation margins) roll up a SEPARATE src0-only
    explode whose source filter pushes into the scan (5% of the
    corpus); scoring is three joins against them (AQE broadcasts when
    they fit) plus one per-doc aggregation that partial-aggregates
    map-side. Transcendental results are rounded to 6 decimals before
    the decimal-exact per-doc sum (module doc).

    ``tokenizer`` selects the token stream the bigrams ride on
    (round 14, VERDICT r13 #3): "space" is the original
    whitespace-split tier; "unicode" is the tokcache tier — casefold +
    maximal [\\p{L}\\p{N}]+ runs (`tokcache.UNICODE_TOKEN_RE`, the
    single Spark-side definition; RE2/Java dialect parity is
    fuzz-pinned in tests). ``docs`` overrides the corpus (doc_id,
    source, text) — planted-twin consumers pass their augmented
    corpus. The DECLARED query stays the space tier on raw documents;
    `quality_perplexity_buckets` consumes the unicode tier.

    ``carry`` (optimization r14): per-doc columns (functionally
    dependent on doc_id, e.g. lang) threaded through the instance
    stream and the per-doc fold, so consumers that need them avoid a
    corpus-cardinality join back against the source (guide §2.4 —
    the join re-derived the 3-branch planted corpus and added an
    Exchange + broadcast). Widens the map-side partial-agg key by the
    carried columns only; default () keeps the declared query's plan
    and output identical.

    ``ref_docs`` (optimization r15): the reference slice the LM trains
    on, as its own (doc_id, source, text) relation. Default None keeps
    the declared shape — bgc = the scoring stream filtered to
    source = 'src0' (Catalyst pushes that filter to the scan). Planted-
    twin consumers whose ``docs`` is a generator over the base corpus
    pass the pre-filtered base slice here instead: a filter cannot
    prune THROUGH a generator, so without this every below-floor bgc
    re-derivation would pay the full twin explode + discard
    (guide §2.4/§6 — with it the LM branches read a plain predicate-
    pushed scan). Rows are identical either way: source is
    per-document, so filtering before or after bigram construction
    commutes."""
    from .tokcache import UNICODE_TOKEN_RE

    carry = list(carry)
    if docs is None:
        docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    if tokenizer == "space":
        t_expr = F.expr("filter(split(text, ' '), x -> x <> '')")
    elif tokenizer == "unicode":
        t_expr = F.regexp_extract_all(F.lower("text"), F.lit(UNICODE_TOKEN_RE), 0)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    # bigrams via arrays_zip of two shifted slices — all codegen'd
    # built-ins; the transform-lambda struct formulation evaluates
    # interpreted per element (the ADC HOF lesson) and measured 2x
    # slower at sf1 (2.03 vs 1.07 s for the bare explode)
    def _bigrams(src, cols):
        t = src.select(*cols, t_expr.alias("t"))
        return (
            t.where(F.size("t") >= 2)
            .select(
                *cols,
                F.expr("slice(t, 1, size(t) - 1)").alias("w1s"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2s"),
            )
            .select(*cols, F.explode(F.arrays_zip("w1s", "w2s")).alias("b"))
            .select(
                *cols,
                F.col("b.w1s").alias("w1"),
                F.col("b.w2s").alias("w2"),
            )
        )

    bg = _bigrams(docs, ["doc_id", "source", *carry])
    ref_bg = (
        bg.where(F.col("source") == "src0")
        if ref_docs is None
        else _bigrams(ref_docs, [])
    )
    # bgc feeds THREE plan branches (lm2, marg, tot) and
    # Spark does not CSE across branches: unpersisted, the reference
    # explode + groupBy(w1, w2) runs four times (8 Exchanges / 4 src0
    # scans in the r14 before-plan). Persistence is SCALE-ADAPTIVE
    # (common.maybe_persist): below the floor the four derivations run
    # as concurrent stages and an unconditional persist measured +0.9 s
    # at sf0.1 (it serializes the DAG at the materialization barrier);
    # above it, one pass over the reference slice instead of four is
    # the win that matters (guide §2.4/§5). bgc is vocab-bounded
    # (distinct reference bigrams), so caching is safe at any corpus
    # size; DISK_ONLY per the dsir sizing note.
    from .common import maybe_persist

    bgc = maybe_persist(
        ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    )
    marg = bgc.groupBy("w2").agg(F.sum("cnt2").alias("cntu"))
    tot = bgc.agg(F.sum("cnt2").cast("double").alias("t_ref"))
    # fold the LM into PRECOMPUTED log-prob lookup tables so the
    # corpus-sized instance stream pays TWO joins and zero
    # transcendentals (ln runs once per distinct bigram/continuation
    # at vocab scale, not once per instance; the context-count join
    # happens vocab x vocab, never against the stream). Log-probs are
    # carried as MICRO-LOG integers — the 6-dp rounded lp times 1e6 is
    # integral, so the per-doc sum is a plain long sum instead of the
    # decimal accumulator (4.05 -> 2.45 s at sf1, values identical;
    # the oracle mirrors the same integer sum).
    def _micro(lp_col):
        return F.round(F.round(lp_col, 6) * 1e6).cast("long")

    # context totals as a WINDOW SUM over bgc rather than bgc ⋈ c1
    # (optimization r14): the join form derived bgc twice more (itself
    # + c1's groupBy) and broadcast a vocab-sized c1 — the window form
    # reads bgc once, exchanges on w1 and folds the same long cnt1 per
    # row (identical operands -> bitwise-identical lp2; A/B'd equal,
    # faster in 7/7 paired passes at sf0.1, 0.961 -> 0.893 min). Group
    # size per w1 is the context's continuation count — vocab-bounded,
    # never corpus-bounded.
    from pyspark.sql import Window as _W

    _cnt1 = F.sum("cnt2").over(_W.partitionBy("w1"))
    lm2 = bgc.select(
        "w1",
        "w2",
        _micro(
            F.log(F.col("cnt2").cast("double") / _cnt1.cast("double"))
        ).alias("lp2"),
    )
    lmu = marg.crossJoin(F.broadcast(tot)).select(
        "w2",
        _micro(
            F.log(F.lit(0.4) * F.col("cntu").cast("double") / F.col("t_ref"))
        ).alias("lpu"),
    )
    zero = tot.select(
        _micro(F.log(F.lit(0.4) / F.col("t_ref"))).alias("lp0")
    )
    scored = (
        bg.join(lm2, ["w1", "w2"], "left")
        .join(lmu, "w2", "left")
        .crossJoin(F.broadcast(zero))
        .select("doc_id", *carry, F.coalesce("lp2", "lpu", "lp0").alias("lpm"))
    )
    agg = scored.groupBy("doc_id", *carry).agg(
        F.sum("lpm").alias("sm"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "doc_id",
        *carry,
        F.col("n").alias("n_bigrams"),
        F.round(-(F.col("sm").cast("double") / 1e6) / F.col("n"), 6).alias("xent"),
    )


_SPACE_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"
# RE2 twin of tokcache.UNICODE_TOKEN_RE over casefolded text (the
# vocab_top_tokens_unicode oracle recipe)
_UNICODE_TOKS_SQL = "regexp_extract_all(lower(text), '[\\p{L}\\p{N}]+')"


def _bigram_xent_sql(src: str = "documents", toks: str = _SPACE_TOKS_SQL) -> str:
    """The bigram-xent oracle CTE chain over corpus ``src`` with token
    expression ``toks`` — shared by the declared space-tier query and
    the unicode-tier perplexity buckets."""
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         {toks} AS t
  FROM {src}
),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
),
bgc AS (
  SELECT w1, w2, count(*) AS cnt2
  FROM bg WHERE source = 'src0' GROUP BY w1, w2
),
c1 AS (SELECT w1, CAST(SUM(cnt2) AS BIGINT) AS cnt1 FROM bgc GROUP BY w1),
marg AS (SELECT w2, CAST(SUM(cnt2) AS BIGINT) AS cntu FROM bgc GROUP BY w2),
tot AS (SELECT CAST(SUM(cnt2) AS DOUBLE) AS t_ref FROM bgc),
scored AS (
  SELECT f.doc_id,
         CAST(round(round(ln(CASE
           WHEN b.cnt2 IS NOT NULL
             THEN CAST(b.cnt2 AS DOUBLE) / CAST(c.cnt1 AS DOUBLE)
           WHEN m.cntu IS NOT NULL
             THEN 0.4 * CAST(m.cntu AS DOUBLE) / tot.t_ref
           ELSE 0.4 / tot.t_ref END), 6) * 1e6) AS BIGINT) AS lpm
  FROM bg f
  LEFT JOIN bgc b ON f.w1 = b.w1 AND f.w2 = b.w2
  LEFT JOIN c1 c ON f.w1 = c.w1
  LEFT JOIN marg m ON f.w2 = m.w2
  CROSS JOIN tot
),
agg AS (
  SELECT doc_id, CAST(SUM(lpm) AS BIGINT) AS sm, count(*) AS n
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n AS n_bigrams,
       round(-(CAST(sm AS DOUBLE) / 1e6) / n, 6) AS xent
FROM agg
"""


TEXT_BIGRAM_XENT_SQL = _bigram_xent_sql()


def quality_logreg_score(spark, sf_dir):
    """Logistic quality classifier: sigmoid(w . features) over the
    engine's quality features (length score, stopword ratio,
    type-token ratio). Keep decision at P >= 0.5 on the ROUNDED
    probability (deterministic cross-engine). One scan, map-only —
    zero shuffles: classifier-based filtering costs nothing beyond the
    feature pass at any corpus size."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_r = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast(
        "double"
    ) / n_tok
    uniq_r = F.size(F.array_distinct(toks)).cast("double") / n_tok
    len_s = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    z = (
        F.lit(-1.5)
        + F.lit(2.0) * len_s
        + F.lit(3.0) * stop_r
        + F.lit(1.5) * uniq_r
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return docs.select(
        "doc_id",
        prob.alias("quality_prob"),
        (prob >= F.lit(0.5)).alias("keep"),
    )


QUALITY_LOGREG_SQL = f"""
WITH f AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
z AS (
  SELECT doc_id,
         -1.5
           + 2.0 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
           + 3.0 * (CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE) / len(toks))
           + 1.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS z
  FROM f
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-(z))), 6) AS quality_prob,
       round(1.0 / (1.0 + exp(-(z))), 6) >= 0.5 AS keep
FROM z
"""


def quality_gopher_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public): per document, (a) the fraction of word-2-gram OCCURRENCES
    that are repeats of an earlier occurrence, (b) the fraction
    claimed by the single most frequent 2-gram, (c) the fraction
    claimed by the most frequent word — the three cheap intra-doc
    repetition detectors a corpus filter runs before any model-based
    scoring — plus the keep verdict at the published-style thresholds
    (top-2-gram <= 0.20, dup-2-gram <= 0.30, top-word <= 0.20).

    Scale shape: the word branch reads the SHARED materialized
    (doc, token, tf) projection (queries/tokcache.py, VERDICT r10 #4) —
    its per-doc rollup is Exchange-free off the doc_id bucket spec; the
    2-gram branch is the one remaining corpus scan, a two-level
    partial-aggregated groupBy ((doc, gram) counts collapse map-side,
    then per-doc rollup), joined on doc_id; no window over the corpus,
    no driver state. Fractions are small-integer ratios rounded to 6
    decimals (identical across engines)."""
    from ..operators.dedup import word_shingles
    from .tokcache import doc_tf

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # tf keeps empty tokens, matching the plain explode(split()) count
    wstats = (
        doc_tf(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_words"), F.max("tf").alias("top_word_n"))
    )
    g = word_shingles(docs, n=2, distinct=False)
    gstats = (
        g.groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_2grams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_2gram_n"),
        )
    )
    out = wstats.join(gstats, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.round(F.col("top_word_n").cast("double") / F.col("n_words"), 6).alias(
            "top_word_frac"
        ),
        F.coalesce(
            F.round(
                (F.col("n_2grams") - F.col("n_distinct")).cast("double")
                / F.col("n_2grams"),
                6,
            ),
            F.lit(0.0),
        ).alias("dup_2gram_frac"),
        F.coalesce(
            F.round(F.col("top_2gram_n").cast("double") / F.col("n_2grams"), 6),
            F.lit(0.0),
        ).alias("top_2gram_frac"),
    )
    return out.withColumn(
        "gopher_keep",
        (
            (F.col("top_2gram_frac") <= 0.20)
            & (F.col("dup_2gram_frac") <= 0.30)
            & (F.col("top_word_frac") <= 0.20)
        ).cast("int"),
    )


GOPHER_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
ws AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top_word_n
  FROM wc GROUP BY doc_id
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
  FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
  WHERE len(t) >= 2
),
gc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
gs AS (
  SELECT doc_id, SUM(c) AS n_2grams, count(*) AS n_distinct,
         MAX(c) AS top_2gram_n
  FROM gc GROUP BY doc_id
),
j AS (
  SELECT ws.doc_id, ws.n_words,
         round(CAST(ws.top_word_n AS DOUBLE) / ws.n_words, 6) AS top_word_frac,
         COALESCE(round(CAST(gs.n_2grams - gs.n_distinct AS DOUBLE) / gs.n_2grams, 6), 0.0) AS dup_2gram_frac,
         COALESCE(round(CAST(gs.top_2gram_n AS DOUBLE) / gs.n_2grams, 6), 0.0) AS top_2gram_frac
  FROM ws LEFT JOIN gs ON ws.doc_id = gs.doc_id
)
SELECT doc_id, n_words, top_word_frac, dup_2gram_frac, top_2gram_frac,
       CAST(top_2gram_frac <= 0.20 AND dup_2gram_frac <= 0.30
            AND top_word_frac <= 0.20 AS INT) AS gopher_keep
FROM j
"""



_PPLX_SHIFT = 40_000_000  # planted-twin id offset (floor for twin_shift)


def quality_perplexity_buckets(spark, sf_dir):
    r"""CCNet-style perplexity tiering (Wenzek et al. 2020): per
    language, rank every document by its bigram-LM cross-entropy
    (`text_bigram_xent` — already bitwise cross-engine) and cut the
    ranking into head/middle/tail thirds; report each (lang, bucket)
    cell's size and exact xent min/max/mean. This is the query that
    decides which slice of a crawl becomes training data.

    Round 14 (VERDICT r13 #3 — the unicode tokenizer tier under a
    heavy serving plan): scoring runs on the UNICODE tier (casefold +
    maximal [\p{L}\p{N}]+ runs) over a corpus with planted decorated
    twins the space tier would mis-tokenize: an UPPERCASED
    comma-joined slice (doc_id % 7 == 2) and an em-dash-joined slice
    (doc_id % 7 == 5), both with source='twin' so the reference LM
    (src0) stays exactly the original slice. Under the unicode tier a
    twin's token stream equals its original's, so its xent is
    BITWISE the original's; a space-tier tokenization would glue
    punctuation into tokens and push every twin to the OOV floor —
    the oracle hash therefore pins the tier, not just the rollup.

    Determinism: the rank order is (xent, doc_id) — xent values are
    hash-checked identical cross-engine, doc_id breaks ties — and
    ntile's equal-split semantics match on both engines. The bucket
    mean uses the decimal-exact sum (xent carries 6 decimals by
    construction).

    Scale shape: scoring is the bigram-xent pipeline (one corpus
    explode, broadcast LM tables; the unicode tier swaps the split
    for one RE2-compatible regexp pass, still codegen'd scan-side);
    bucketing adds one Exchange on lang plus a per-lang window. A
    total per-lang sort is the honest cost of EXACT tertiles —
    CCNet's production shortcut (approximate percentile thresholds,
    then a map-side bucket assignment) drops the sort at the price of
    boundary error, and this exact query is the audit that validates
    those thresholds."""
    from pyspark.sql import Window

    from .common import twin_shift

    base = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", "lang"
    )
    sh = twin_shift(spark, sf_dir, floor=_PPLX_SHIFT)
    # ONE corpus scan derives base + both planted twins (optimization
    # r15, VERDICT r14 #5): the former 3-branch union re-read
    # documents.parquet once per branch — 3 corpus passes at any scale
    # (guide §6 scan-once). Each row explodes into a 3-variant struct
    # array and a `keep` flag filters the twins to their mod-7 slices;
    # kept rows carry expressions IDENTICAL to the union form, so xent
    # values are bitwise unchanged. The twin text transforms are GATED
    # on the slice condition: the union branches filtered doc_id % 7
    # BEFORE transforming, so an unconditional transform here would
    # run upper/replace over EVERY row for both variants — measured
    # +25% at sf10 (15.5 vs 12.6 s isolated min) before the gate;
    # discarded variants carry '' instead.
    s_base = F.struct(
        F.lit(True).alias("keep"),
        F.col("doc_id").alias("doc_id"),
        F.col("source").alias("source"),
        F.col("text").alias("text"),
        F.col("lang").alias("lang"),
    )
    punct_cond = F.col("doc_id") % 7 == 2
    s_punct = F.struct(
        punct_cond.alias("keep"),
        (F.col("doc_id") + sh).alias("doc_id"),
        F.lit("twin").alias("source"),
        F.when(
            punct_cond,
            F.upper(F.replace(F.col("text"), F.lit(" "), F.lit(", "))),
        ).otherwise(F.lit("")).alias("text"),
        F.col("lang").alias("lang"),
    )
    dash_cond = F.col("doc_id") % 7 == 5
    s_dash = F.struct(
        dash_cond.alias("keep"),
        (F.col("doc_id") + 2 * sh).alias("doc_id"),
        F.lit("twin").alias("source"),
        F.when(
            dash_cond, F.replace(F.col("text"), F.lit(" "), F.lit("—"))
        ).otherwise(F.lit("")).alias("text"),
        F.col("lang").alias("lang"),
    )
    corpus = (
        base.select(F.explode(F.array(s_base, s_punct, s_dash)).alias("v"))
        .where(F.col("v.keep"))
        .select("v.doc_id", "v.source", "v.text", "v.lang")
    )
    # lang rides THROUGH the xent fold (carry — functionally dependent
    # on doc_id), replacing the former xent ⋈ corpus(doc_id, lang)
    # re-join: that join re-derived the 3-branch planted corpus a
    # second time (3 scans + union + BroadcastExchange in the r14
    # before-plan) only to recover lang. Same rows: the join was inner
    # on doc_id and every xent doc_id exists in corpus exactly once.
    # The reference LM trains on the pre-filtered src0 slice
    # (ref_docs): a source filter cannot prune through the twin
    # generator, so passing the base slice keeps every below-floor bgc
    # derivation a plain predicate-pushed scan instead of a full twin
    # explode + discard (rows identical — twins are source='twin').
    xent = text_bigram_xent(
        spark,
        sf_dir,
        tokenizer="unicode",
        docs=corpus,
        carry=("lang",),
        ref_docs=base.where(F.col("source") == "src0").select(
            "doc_id", "source", "text"
        ),
    )
    w = Window.partitionBy("lang").orderBy("xent", "doc_id")
    b = xent.select("lang", "xent", F.ntile(3).over(w).alias("bucket"))
    return (
        b.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("xent").alias("xent_min"),
            F.max("xent").alias("xent_max"),
            (dsum("xent") / F.count(F.lit(1))).alias("xent_mean"),
        )
    )


PERPLEXITY_BUCKETS_SQL = f"""
WITH pcorpus AS (
  SELECT doc_id, source, text, lang FROM documents
  UNION ALL
  SELECT doc_id + {_PPLX_SHIFT} AS doc_id, 'twin' AS source,
         upper(replace(text, ' ', ', ')) AS text, lang
  FROM documents WHERE doc_id % 7 = 2
  UNION ALL
  SELECT doc_id + {2 * _PPLX_SHIFT} AS doc_id, 'twin' AS source,
         replace(text, ' ', '—') AS text, lang
  FROM documents WHERE doc_id % 7 = 5
),
xent AS ({_bigram_xent_sql('pcorpus', _UNICODE_TOKS_SQL)}),
j AS (
  SELECT d.lang, x.xent, x.doc_id
  FROM xent x JOIN pcorpus d USING (doc_id)
),
b AS (
  SELECT lang, xent,
         CAST(ntile(3) OVER (PARTITION BY lang ORDER BY xent, doc_id)
              AS INTEGER) AS bucket
  FROM j
)
SELECT lang, bucket, count(*) AS n_docs,
       min(xent) AS xent_min, max(xent) AS xent_max,
       ({DSUM('xent')} / COUNT(*)) AS xent_mean
FROM b GROUP BY lang, bucket
"""


def quality_zipf_audit(spark, sf_dir):
    """Zipf's-law corpus-health audit: OLS slope of log-frequency on
    log-rank over the top 1000 tokens — natural text sits near
    slope -1; synthetic/templated corpora drift flat or steep, so
    this one-row readout is a cheap authenticity signal. Determinism:
    ln is rounded to 6 decimals on both engines (the bigram-xent
    precedent) and converted to integer MICRO-units, so the OLS
    sufficient statistics are exact longs and slope / intercept / r2
    are one shared IEEE tree (slope and r2 are scale-invariant; the
    intercept rescales by 1e-6 at the end).

    Scale shape (round 11): the vocab spine folds sum(tf) off the
    SHARED materialized (doc, token, tf) projection — no token explode
    at query time (the explode-then-WHERE vs filter(lambda) A/B that
    shaped the previous form is preserved in git history); ranking is
    one TakeOrdered over the bounded vocab (cnt desc, token); the
    regression folds 1000 rows."""
    from pyspark.sql import Window

    from .tokcache import doc_tf

    counts = (
        doc_tf(spark, sf_dir)
        .where(F.col("token") != "")
        .select(F.col("token").alias("tok"), "tf")
        .groupBy("tok")
        .agg(F.sum("tf").alias("cnt"))
    )
    # top-1000 via orderBy+limit (TakeOrderedAndProject: per-partition
    # top-k merged on the driver), NOT a global row_number window — the
    # window form sorts the ENTIRE vocab on one partition (the classic
    # single-partition WindowExec), which was the query's 2.77x sf10
    # register entry. The residual window ranks only the 1000 kept rows.
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(1000)
    ranked = top.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("tok")))
        .alias("rank"),
    )
    xi = F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("long")
    yi = F.round(F.log(F.col("cnt").cast("double")) * 1e6).cast("long")
    g = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
        F.sum(xi * yi).alias("sxy"),
    )
    n = F.col("n").cast("double")
    numxy = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    denx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    deny = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    slope = numxy / denx
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / n
    ) / F.lit(1e6)
    return g.select(
        F.col("n").alias("n_tokens"),
        slope.alias("zipf_slope"),
        intercept.alias("intercept"),
        ((numxy * numxy) / (denx * deny)).alias("r2"),
    )


ZIPF_SQL = """
WITH counts AS (
  SELECT u.tok, count(*) AS cnt
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        FROM documents) u
  GROUP BY u.tok
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank FROM counts
  QUALIFY rank <= 1000
),
m AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS xi,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e6) AS BIGINT) AS yi
  FROM ranked
),
s AS (
  SELECT count(*) AS n, CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(yi) AS BIGINT) AS sy,
         CAST(SUM(xi * xi) AS BIGINT) AS sxx, CAST(SUM(yi * yi) AS BIGINT) AS syy,
         CAST(SUM(xi * yi) AS BIGINT) AS sxy
  FROM m
)
SELECT n AS n_tokens,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS zipf_slope,
       ((CAST(sy AS DOUBLE)
         - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
           * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) / 1e6 AS intercept,
       ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
FROM s
"""


_LR_LR = 0.0078125  # 2^-7: exact binary literal on both engines
_LR_ROUNDS = 2


def quality_logreg_train(spark, sf_dir):
    """Logistic-regression TRAINING (the fourth iterative trainer,
    beside BPE / k-means / PQ), fully SQL-replayable: gradient descent
    on P(lang = 'en' | length, token-count features) where every
    per-row sigmoid is rounded to 6 decimals and converted to integer
    micro-units (the bigram-xent determinism idiom), so each round's
    gradient is an EXACT integer aggregation and the weight update is
    one shared IEEE tree — the oracle unrolls both rounds in SQL and
    the FINAL WEIGHTS themselves are hash-checked, not just audited.

    Scale shape: each round is ONE map-side-partial aggregation
    producing 3 longs; the driver applies the update and broadcasts
    the next weights inside the next plan (the k-means loop shape).
    Output: (n, n_pos, w0, w1, w2, n_correct) — n_correct counts
    final-round predictions (z > 0) against labels, exact ints."""
    docs = load(spark, sf_dir, "documents").select("text", "lang", "n_chars")
    feats = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.expr("n_chars div 100").cast("long").alias("f1"),
        F.expr("size(split(text, ' ')) div 10").cast("long").alias("f2"),
    )
    n_row = feats.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    ).first()
    n, n_pos = int(n_row["n"]), int(n_row["n_pos"])
    w = [0.0, 0.0, 0.0]
    for _ in range(_LR_ROUNDS):
        z = F.lit(w[0]) + F.lit(w[1]) * F.col("f1") + F.lit(w[2]) * F.col("f2")
        sm = F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * 1e6 + F.lit(0.5))
        resid = sm - F.col("y") * F.lit(1_000_000)
        g = feats.agg(
            F.sum(resid).alias("g0"),
            F.sum(resid * F.col("f1")).alias("g1"),
            F.sum(resid * F.col("f2")).alias("g2"),
        ).first()
        w = [
            w[i] - _LR_LR * (float(int(g[f"g{i}"])) / 1e6 / n)
            for i in range(3)
        ]
    zf = F.lit(w[0]) + F.lit(w[1]) * F.col("f1") + F.lit(w[2]) * F.col("f2")
    pred = (zf > 0).cast("int")
    acc = feats.agg(
        F.sum((pred == F.col("y")).cast("long")).alias("n_correct")
    )
    return acc.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(n_pos).cast("long").alias("n_pos"),
        F.lit(w[0]).alias("w0"),
        F.lit(w[1]).alias("w1"),
        F.lit(w[2]).alias("w2"),
        "n_correct",
    )


def _lr_sql() -> str:
    sig = (
        "CAST(floor(1.0 / (1.0 + exp(-({z}))) * 1e6 + 0.5) AS BIGINT)"
    )
    parts = [
        """feats AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(n_chars // 100 AS BIGINT) AS f1,
         CAST(len(string_split(text, ' ')) // 10 AS BIGINT) AS f2
  FROM documents
)""",
        "tot AS (SELECT count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos FROM feats)",
        f"""g1 AS (
  SELECT SUM({sig.format(z='0.0')} - y * 1000000) AS g0,
         SUM(({sig.format(z='0.0')} - y * 1000000) * f1) AS g1,
         SUM(({sig.format(z='0.0')} - y * 1000000) * f2) AS g2
  FROM feats
)""",
        f"""w1 AS (
  SELECT 0.0 - {_LR_LR!r} * (CAST(g0 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w0,
         0.0 - {_LR_LR!r} * (CAST(g1 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w1,
         0.0 - {_LR_LR!r} * (CAST(g2 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w2
  FROM g1
)""",
    ]
    z2 = "w1.w0 + w1.w1 * f.f1 + w1.w2 * f.f2"
    parts.append(f"""g2r AS (
  SELECT SUM({sig.format(z=z2)} - f.y * 1000000) AS g0,
         SUM(({sig.format(z=z2)} - f.y * 1000000) * f.f1) AS g1,
         SUM(({sig.format(z=z2)} - f.y * 1000000) * f.f2) AS g2
  FROM feats f, w1
)""")
    parts.append(f"""w2t AS (
  SELECT w1.w0 - {_LR_LR!r} * (CAST(g2r.g0 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w0,
         w1.w1 - {_LR_LR!r} * (CAST(g2r.g1 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w1,
         w1.w2 - {_LR_LR!r} * (CAST(g2r.g2 AS DOUBLE) / 1e6 / (SELECT n FROM tot)) AS w2
  FROM w1, g2r
)""")
    zf = "w2t.w0 + w2t.w1 * f.f1 + w2t.w2 * f.f2"
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT (SELECT n FROM tot) AS n, (SELECT n_pos FROM tot) AS n_pos,
       w2t.w0 AS w0, w2t.w1 AS w1, w2t.w2 AS w2,
       (SELECT CAST(SUM(CASE WHEN (CASE WHEN {zf} > 0 THEN 1 ELSE 0 END) = f.y
                     THEN 1 ELSE 0 END) AS BIGINT)
        FROM feats f, w2t) AS n_correct
FROM w2t
"""
    )


LOGREG_TRAIN_SQL = _lr_sql()


QUERIES = {
    "quality_gopher_repetition": QuerySpec(
        quality_gopher_repetition,
        GOPHER_REPETITION_SQL,
        "Gopher repetition signals (dup/top 2-gram, top-word fractions) + keep verdict",
    ),
    "text_unigram_xent": QuerySpec(
        text_unigram_xent,
        UNIGRAM_XENT_SQL,
        "per-doc cross-entropy under the corpus unigram LM (perplexity-filter proxy)",
    ),
    "quality_logreg_train": QuerySpec(
        quality_logreg_train,
        LOGREG_TRAIN_SQL,
        "logreg gradient-descent trainer (4th iterative trainer); final weights hash-checked via SQL replay",
    ),
    "quality_zipf_audit": QuerySpec(
        quality_zipf_audit,
        ZIPF_SQL,
        "Zipf-slope OLS over the top-1000 token frequencies (corpus authenticity)",
    ),
    "quality_perplexity_buckets": QuerySpec(
        quality_perplexity_buckets,
        PERPLEXITY_BUCKETS_SQL,
        "CCNet perplexity head/middle/tail tiers per language (exact tertiles)",
    ),
    "text_bigram_xent": QuerySpec(
        text_bigram_xent,
        TEXT_BIGRAM_XENT_SQL,
        "bigram Stupid-Backoff cross-entropy vs the src0 reference LM (CCNet shape)",
    ),
    "quality_logreg_score": QuerySpec(
        quality_logreg_score,
        QUALITY_LOGREG_SQL,
        "logistic quality classifier (fixed weights, sigmoid keep-probability)",
    ),
}
