"""Curation operators (queries/curation.py): Python-reference
equivalence for the BPE trainer and DSIR scorer, planted-truth checks
for the overlap matrix. The SQL-oracle equivalence is covered by
tests/oracle_check.py / the driver; these tests check the SEMANTICS
against independent imperative implementations."""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.curation import (
    _DSIR_BUCKETS,
    _DSIR_TARGET_LANG,
    bpe_merges_from,
    dsir_importance_from,
    overlap_matrix_from,
)

# --------------------------------------------------------------- BPE


def _py_bpe(texts, rounds):
    """Reference BPE trainer: greedy leftmost merge application,
    candidate pairs restricted to lhs != rhs, ties (n DESC, lhs, rhs).
    """
    seqs = [t.split(" ") for t in texts]
    merges = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                if a != b:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (x, y), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, x, y, n))
        out = []
        for s in seqs:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    ns.append(f"{x} {y}")
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            out.append(ns)
        seqs = out
    return merges


PLANTED = [
    "the quick fox jumps over the quick fox again",
    "the quick fox sleeps",
    "a quick fox is a quick fox",
    "the quick brown fox",
    "over the quick fox jumps the hound",
    "hound hound hound",  # self-pairs: must never become a merge
]


def test_bpe_matches_python_reference(spark):
    docs = spark.createDataFrame([(t,) for t in PLANTED], "text string")
    got = bpe_merges_from(docs, 3)
    want = _py_bpe(PLANTED, 3)
    assert got == want
    # round 1 must be the planted dominant pair
    assert got[0][1:3] == ("quick", "fox")


def test_bpe_merged_symbol_participates_in_later_rounds(spark):
    # after ('b','c') merges, the dominant pair is ('a', 'b c') —
    # proves round r+1 counts pairs INVOLVING round-r merge output
    texts = ["a b c x a b c y a b c", "b c b c", "a b c"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_merges_from(docs, 2)
    assert got == _py_bpe(texts, 2)
    assert got[0][1:3] == ("b", "c")
    assert got[1][1:3] == ("a", "b c")


def test_bpe_deep_depth_matches_python_reference(spark, sf_dir):
    """Full-depth (R=20, the bpe_train_merges_deep config) equivalence
    against the Python reference trainer over real driver documents —
    the fallback verification pattern for depths where the unrolled
    SQL oracle would be the bottleneck (VERDICT r6 #7). 100 docs keeps
    the 20 rounds x (count + rewrite) loop fast under local[4]."""
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("text")
        .collect()
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_merges_from(docs, 20)
    want = _py_bpe(texts, 20)
    assert got == want
    assert len(got) == 20  # corpus is rich enough to sustain full depth
    # (merged-symbol chaining itself is pinned by
    # test_bpe_merged_symbol_participates_in_later_rounds)


def test_bpe_on_repetition_only_corpus_is_empty(spark):
    docs = spark.createDataFrame([("x x x x",), ("y y",)], "text string")
    assert bpe_merges_from(docs, 3) == []


def test_bpe_apply_counts_match_python_reference(spark):
    from duckdb_pipeline_spark.queries.curation import _apply_merge

    rows = [(i, t) for i, t in enumerate(PLANTED)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_merges_from(docs, 3)

    # python reference: rewrite each doc through the same merge list
    def rewrite(s, x, y):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                out.append(f"{x} {y}")
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    want = {}
    for doc_id, text in rows:
        s = text.split(" ")
        n0 = len(s)
        for _r, x, y, _n in merges:
            s = rewrite(s, x, y)
        want[doc_id] = (n0, len(s))

    from pyspark.sql import functions as F2

    df = docs.select("doc_id", F2.split("text", " ").alias("s")).withColumn(
        "n0", F2.size("s")
    )
    for _r, x, y, _n in merges:
        df = _apply_merge(df, x, y)
    got = {
        r["doc_id"]: (r["n0"], r["n1"])
        for r in df.select("doc_id", "n0", F2.size("s").alias("n1")).collect()
    }
    assert got == want
    # the planted dominant pair occurs, so something actually merged
    assert any(n1 < n0 for n0, n1 in got.values())


# --------------------------------------------------------------- DSIR


def _py_dsir(rows):
    """Reference DSIR scorer over (doc_id, lang, text) tuples; mirrors
    the md5-bucket hashing and the round-then-exact-sum convention."""
    import hashlib

    def buckets(text):
        toks = text.split(" ")
        return [
            hashlib.md5(f"{a} {b}".encode()).hexdigest()[:3]
            for a, b in zip(toks, toks[1:])
        ]

    raw, tgt = {}, {}
    per_doc = {}
    for doc_id, lang, text in rows:
        bs = buckets(text)
        if not bs:
            continue
        per_doc[doc_id] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if lang == _DSIR_TARGET_LANG:
                tgt[b] = tgt.get(b, 0) + 1
    tr, tt = float(sum(raw.values())), float(sum(tgt.values()))
    out = {}
    for doc_id, bs in per_doc.items():
        s = 0.0
        for b in bs:
            lw = round(
                math.log((tgt.get(b, 0) + 1) / (tt + _DSIR_BUCKETS)), 6
            ) - round(math.log((raw[b] + 1) / (tr + _DSIR_BUCKETS)), 6)
            s += lw  # tf folded by iterating occurrences
        out[doc_id] = (len(bs), round(s, 6))
    return out


def test_dsir_matches_python_reference(spark):
    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat on the log"),
        (3, "de", "der hund sitzt auf dem baum"),
        (4, "de", "the cat sat on the mat"),  # en-like text, de label
        (5, "zh", "one"),  # single token -> no bigrams -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["log_importance"])
        for r in dsir_importance_from(docs).collect()
    }
    want = _py_dsir(rows)
    # float equality is intentional: both sides sum identical 6-decimal
    # rounded terms (the Python sum over <=6 terms stays exact enough
    # to survive the final 6-decimal round)
    assert got == want
    assert 5 not in got
    # the en-like de-labeled doc shares its distribution with target
    # docs, so it must outscore the genuinely-German doc
    assert got[4][1] > got[3][1]


# ------------------------------------------------------- overlap matrix


def test_overlap_matrix_planted(spark):
    # srcA and srcB share exactly one 5-gram window; srcC is disjoint
    rows = [
        ("srcA", "v w x y z p q r s t"),
        ("srcB", "v w x y z"),
        ("srcC", "completely different words here now friend"),
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in overlap_matrix_from(docs).collect()
    }
    assert set(got) == {("srcA", "srcB")}
    r = got[("srcA", "srcB")]
    # srcA has 6 distinct 5-grams, srcB has 1, intersection is 1
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 6, 1)
    assert r["jaccard"] == round(1 / 6, 6)


def test_overlap_matrix_symmetric_pair_order(spark):
    # sources are emitted once, lexicographically ordered a < b
    rows = [
        ("zz", "a b c d e f"),
        ("aa", "a b c d e f"),
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    out = overlap_matrix_from(docs).collect()
    assert len(out) == 1
    assert (out[0]["source_a"], out[0]["source_b"]) == ("aa", "zz")
    assert out[0]["jaccard"] == 1.0


# ------------------------------------------------ dedup recall audit


def test_dedup_recall_is_total_on_identical_twins(spark, sf_dir):
    """Identical planted twins share every shingle, so every band
    signature collides and exact-Jaccard verification passes at 1.0:
    recall below 100% means the banding or the verify gate broke."""
    from duckdb_pipeline_spark.queries import collect_all

    r = collect_all()["dedup_recall_report"].fn(spark, sf_dir).collect()[0]
    assert r.n_planted > 0
    assert r.n_planted_found == r.n_planted
    assert r.recall_pct == 100.0
    assert r.n_found_total >= r.n_planted


def test_overlap_bitmask_and_set_paths_agree(spark, sf_dir):
    """The 64-bit-mask fast path and the unbounded collect_set
    fallback must produce the identical matrix (round-7 rewrite)."""
    from duckdb_pipeline_spark.queries.curation import overlap_matrix_from_sets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, overlap_matrix_from(docs).collect()))
    b = sorted(map(tuple, overlap_matrix_from_sets(docs).collect()))
    assert a == b and len(a) > 0


def test_overlap_falls_back_beyond_64_sources(spark):
    """> 64 sources must route to the set path and still be exact."""
    from duckdb_pipeline_spark.queries.curation import overlap_matrix_from_sets

    rows = []
    for i in range(70):
        # chain overlap: source i shares the 5-gram "w{i} a b c d"
        # with source i+1
        rows.append((f"s{i:03d}", f"w{i} a b c d w{i + 1} a b c d"))
    docs = spark.createDataFrame(rows, "source string, text string")
    got = sorted(map(tuple, overlap_matrix_from(docs).collect()))
    want = sorted(map(tuple, overlap_matrix_from_sets(docs).collect()))
    assert got == want and len(got) > 0


def test_dsir_selection_is_deterministic_and_weight_biased(spark, sf_dir):
    """Gumbel-top-k selection: two builds produce the identical ranked
    list (seeded md5 noise), and selection is biased toward high
    weights — the selected docs' mean log-importance must exceed the
    corpus mean (with weights spanning several units, Gumbel noise
    cannot wash that out)."""
    from duckdb_pipeline_spark.queries.curation import (
        dsir_importance,
        dsir_select_topk,
    )

    a = dsir_select_topk(spark, sf_dir).collect()
    b = dsir_select_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["rank"] for r in a] == list(range(1, len(a) + 1))
    sel_mean = sum(r["log_importance"] for r in a) / len(a)
    w = dsir_importance(spark, sf_dir).collect()
    corpus_mean = sum(r["log_importance"] for r in w) / len(w)
    assert sel_mean > corpus_mean


def test_pack_sequences_invariants(spark, sf_dir):
    """Within a shard the packing is gapless and contiguous; bin math
    is consistent with the budget."""
    from duckdb_pipeline_spark.queries.curation import (
        _PACK_BUDGET,
        corpus_pack_sequences,
    )

    rows = (
        corpus_pack_sequences(spark, sf_dir)
        .orderBy("shard", "doc_id")
        .collect()
    )
    assert rows
    prev = {}
    for r in rows:
        # contiguity: each doc starts where the previous one ended
        assert r.start_off == prev.get(r.shard, 0)
        prev[r.shard] = r.start_off + r.n_tokens
        assert 0 <= r.offset_in_bin < _PACK_BUDGET
        assert r.bin_first == r.start_off // _PACK_BUDGET
        assert r.bin_last == (r.start_off + r.n_tokens - 1) // _PACK_BUDGET
        assert r.bin_first <= r.bin_last


def test_pack_sequences_single_exchange(spark, sf_dir):
    """Packing is one hash Exchange (the shard distribution) — the
    window cumsum rides it; no second shuffle appears."""
    from duckdb_pipeline_spark.queries.curation import corpus_pack_sequences

    plan = corpus_pack_sequences(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    n_ex = sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln
        and "SinglePartition" not in ln
        and "BroadcastExchange" not in ln
        and "ReusedExchange" not in ln
    )
    assert n_ex == 1, plan
