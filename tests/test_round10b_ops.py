"""Late round-10 additions: incremental MV maintenance from CDC,
hybrid RRF retrieval, per-source KL drift audit. Cross-engine oracle
parity is covered by the driver protocol (tests/oracle_check.py); these
pin SEMANTIC invariants an oracle match alone wouldn't (maintenance
algebra under randomized churn incl. group moves and emptied groups,
rank-fusion dominance, KL axioms).
"""

import random

import pytest
from pyspark.sql import functions as F


def _agg(df):
    return {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }


def _maintain(spark, root, keys=("id",)):
    """The mv_incremental_maintain delta algebra, generically over a
    (id, k, v) table — mirrors queries/pipeline.py so the randomized
    churn test exercises the same retract-old/apply-new identity."""
    from duckdb_pipeline_spark.sinks import read_version, read_version_diff

    base = (
        read_version(spark, root, 1)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(F.col("k").alias("bk"), "n", "s")
    )
    diff = read_version_diff(spark, root, 1, 2, keys=list(keys), keep_old=True)
    apply_half = F.when(
        F.col("_change") != "delete",
        F.struct(
            F.col("k").alias("g"),
            F.lit(1).cast("long").alias("dn"),
            F.col("v").cast("long").alias("ds"),
        ),
    )
    retract_half = F.when(
        F.col("_change") != "insert",
        F.struct(
            F.col("_old_k").alias("g"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("_old_v")).cast("long").alias("ds"),
        ),
    )
    deltas = (
        diff.select(
            F.explode(
                F.filter(F.array(apply_half, retract_half), lambda x: x.isNotNull())
            ).alias("d")
        )
        .groupBy(F.col("d.g").alias("dk"))
        .agg(F.sum("d.dn").alias("dn"), F.sum("d.ds").alias("ds"))
    )
    out = (
        base.join(deltas, F.col("bk").eqNullSafe(F.col("dk")), "full_outer")
        .select(
            F.coalesce("bk", "dk").alias("k"),
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("s"),
        )
        .where(F.col("n") > 0)
    )
    return {r["k"]: (r["n"], r["s"]) for r in out.collect()}


def test_mv_maintenance_equals_recompute_under_random_churn(spark, tmp_path):
    """Randomized v1 -> v2 churn (deletes, inserts, value updates, and
    GROUP-MOVING key updates, including groups emptied entirely): the
    incrementally maintained aggregate must equal the full recompute
    over v2 — the delta identity insert=+new, delete=-old,
    update=-old+new."""
    from duckdb_pipeline_spark.sinks import write_version

    rng = random.Random(7)
    for trial in range(3):
        root = str(tmp_path / f"vt{trial}")
        groups = ["a", "b", "c", "d"]
        v1_rows = [
            (i, rng.choice(groups), rng.randint(-50, 50)) for i in range(60)
        ]
        # group "d" gets emptied: every d-row is deleted or moved
        v2_rows = []
        for (i, k, v) in v1_rows:
            r = rng.random()
            if k == "d" or r < 0.2:
                if rng.random() < 0.5 and k != "d":
                    v2_rows.append((i, k, v))  # unchanged
                elif rng.random() < 0.5:
                    continue  # delete
                else:
                    v2_rows.append((i, rng.choice("abc"), v))  # group move
            elif r < 0.5:
                v2_rows.append((i, k, rng.randint(-50, 50)))  # value update
            else:
                v2_rows.append((i, k, v))  # unchanged
        v2_rows += [
            (100 + j, rng.choice(groups), rng.randint(-50, 50))
            for j in range(10)
        ]
        d1 = spark.createDataFrame(v1_rows, "id long, k string, v long")
        d2 = spark.createDataFrame(v2_rows, "id long, k string, v long")
        assert write_version(d1, root) == 1
        assert write_version(d2, root) == 2
        assert _maintain(spark, root) == _agg(d2)


def test_read_version_diff_keep_old_columns(spark, tmp_path):
    """keep_old=True rides the old-side values along as _old_<col>:
    NULL for inserts, populated for updates and deletes."""
    from duckdb_pipeline_spark.sinks import read_version_diff, write_version

    root = str(tmp_path / "vt")
    d1 = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    d2 = spark.createDataFrame([(1, 11), (3, 30)], "id int, v int")
    write_version(d1, root)
    write_version(d2, root)
    rows = {
        r["_change"]: r
        for r in read_version_diff(
            spark, root, 1, 2, keys=["id"], keep_old=True
        ).collect()
    }
    assert rows["insert"]["_old_v"] is None and rows["insert"]["v"] == 30
    assert rows["update"]["_old_v"] == 10 and rows["update"]["v"] == 11
    assert rows["delete"]["_old_v"] == 20 and rows["delete"]["v"] == 20


def test_hybrid_rrf_fusion_semantics(spark, sf_dir):
    """A doc ranked by BOTH branches must outscore a doc holding the
    same rank in only one branch, and the fused score must equal the
    sum of its branch contributions."""
    from duckdb_pipeline_spark.queries.retrieval import search_hybrid_rrf

    out = search_hybrid_rrf(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    by_doc = {r["doc_id"]: r for r in out}
    for r in out:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (r["lex_rank"] + 60.0)
        if r["vec_rank"] is not None:
            expect += 1.0 / (r["vec_rank"] + 60.0)
        assert r["rrf"] == pytest.approx(expect, abs=0)
        assert r["doc_id"] != 0  # the query doc is excluded
    # fused ordering is by rrf desc with doc_id tiebreak
    scores = [(r["rrf"], -r["doc_id"]) for r in out]
    assert scores == sorted(scores, reverse=True)
    # if any doc appears in both branches, it beats a single-branch doc
    # whose best rank is no better
    both = [r for r in out if r["lex_rank"] and r["vec_rank"]]
    single = [r for r in out if (r["lex_rank"] is None) ^ (r["vec_rank"] is None)]
    for b in both:
        for s in single:
            s_rank = s["lex_rank"] or s["vec_rank"]
            if s_rank >= min(b["lex_rank"], b["vec_rank"]):
                assert b["rrf"] > s["rrf"]
    assert by_doc  # sanity: non-empty fusion


def test_source_kl_axioms(spark, sf_dir, tmp_path):
    """KL(p_s || corpus) is ~non-negative (exact up to the 6-dp term
    rounding) and zero when every source IS the corpus distribution."""
    from duckdb_pipeline_spark.queries.curation import corpus_source_kl

    rows = corpus_source_kl(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        # term-level 6-dp rounding can push an exact-0 KL epsilon-negative
        assert r["kl_vs_corpus"] >= -1e-3
        assert r["n_tokens"] >= r["n_types"] > 0

    # planted: two sources with IDENTICAL token distributions -> KL 0
    # (landed as real parquet: the query now reads the tf projection,
    # which stamps the source path — monkeypatching load no longer
    # covers it)
    import os

    from duckdb_pipeline_spark.queries.curation import corpus_source_kl as kl

    d = str(tmp_path / "sfkl")
    os.makedirs(d)
    spark.createDataFrame(
        [
            (0, "x y z", "en", "s0", 5),
            (1, "x y", "en", "s0", 3),
            (2, "x y z", "en", "s1", 5),
            (3, "x y", "en", "s1", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["source"]: r["kl_vs_corpus"] for r in kl(spark, d).collect()}
    assert out == {"s0": 0.0, "s1": 0.0}


def test_label_propagation_semantics(spark, monkeypatch):
    """Planted graph: identical texts form LSH cliques. Seeds (id%7==0,
    label id%3) stay clamped; an unlabeled node adjacent to two seeds
    with different labels takes the tie toward the SMALLER label;
    neighbors of a single seed adopt its label in round 1; nodes not in
    the pair graph are absent."""
    import duckdb_pipeline_spark.queries.dedup as dd

    rows = [
        (0, "a b c d e f g h"),    # seed, label 0   (clique A)
        (35, "a b c d e f g h"),   # seed, label 2   (clique A)
        (2, "a b c d e f g h"),    # unlabeled       (clique A)
        (7, "p q r s t u v w"),    # seed, label 1   (clique B)
        (9, "p q r s t u v w"),    # unlabeled       (clique B)
        (11, "z1 z2 z3 z4 z5 z6"), # isolated: no twin, not in graph
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(dd, "_dup_corpus", lambda s, d: docs)
    got = {
        r["doc_id"]: (r["label"], r["labeled_round"])
        for r in dd.graph_label_propagation(spark, "ignored").collect()
    }
    assert got == {
        0: (0, 0),
        35: (2, 0),   # clamped despite label-0 neighbors
        7: (1, 0),
        2: (0, 1),    # tie between labels {0, 2} -> min label 0
        9: (1, 1),
    }


def test_component_label_cache_stamp(spark, tmp_path):
    """_ensure_component_labels is a once-per-corpus-version build: a
    second call with an unchanged source is a cache hit (no rewrite);
    regenerating the source parquet (new size/mtime) invalidates the
    stamp and rebuilds the labels."""
    import os

    import duckdb_pipeline_spark.queries.dedup as dd

    sfd = str(tmp_path / "sf")
    os.makedirs(sfd)

    def land(rows):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in rows)
            + ") AS t(doc_id, text)) TO '"
            + os.path.join(sfd, "documents.parquet")
            + "' (FORMAT PARQUET)"
        )

    land([(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")])
    p1 = dd._ensure_component_labels(spark, sfd)
    sig1 = {
        f: os.stat(os.path.join(p1, f)).st_mtime_ns
        for f in os.listdir(p1)
        if f.endswith(".parquet")
    }
    assert dd._ensure_component_labels(spark, sfd) == p1
    sig2 = {
        f: os.stat(os.path.join(p1, f)).st_mtime_ns
        for f in os.listdir(p1)
        if f.endswith(".parquet")
    }
    assert sig2 == sig1  # cache hit: nothing rewritten
    labels1 = {
        (r.doc_id, r.component) for r in spark.read.parquet(p1).collect()
    }
    assert labels1 == {(1, 1), (2, 1)}  # 3 has no twin; 1-2 one component

    land([(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d e"), (44, "q r s t u")])
    # the rebuild must not reuse the FIRST corpus's cached bands: the
    # builder persists a plan that Spark's CacheManager matches by
    # logical plan (same path). The builder itself clears session
    # caches on a stamp miss (ADVICE r10) — no caller workaround here.
    p2 = dd._ensure_component_labels(spark, sfd)
    assert p2 == p1
    labels2 = {
        (r.doc_id, r.component) for r in spark.read.parquet(p2).collect()
    }
    assert labels2 == {(1, 1), (2, 1), (3, 1)}  # rebuilt from new source


def test_mmr_diversifies_planted_near_duplicates(spark, monkeypatch):
    """Planted embeddings: the two most-relevant candidates are
    near-identical to each other; plain top-k would return both
    adjacent, MMR must push the redundant twin DOWN and promote the
    diverse third vector to rank 2. Also: rank 1 is the relevance
    argmax and every mmr equals 0.7*rel - 0.3*maxsim."""
    import duckdb_pipeline_spark.queries.retrieval as rt
    from duckdb_pipeline_spark.queries import common as cm

    # query vec 0 = e1; vecs 1,2 ~ e1 (near-dup pair, most relevant);
    # vec 3 = diverse mix; vecs 4.. = orthogonal-ish filler
    dim = 8

    def v(*pairs):
        x = [0.0] * dim
        for i, val in pairs:
            x[i] = val
        return x

    # constructed margins (verified numerically): rel1=.990, rel2=.955,
    # rel3=.900; twin sim(1,2)=.987 -> mmr2=.3725; diverse (opposite
    # side of the query) sim(1,3)=.830 -> mmr3=.3812 > mmr2
    rows = [
        (0, v((0, 1.0)), 0),
        (1, v((0, 0.99), (1, 0.1411)), 0),        # rel .990
        (2, v((0, 0.9553), (1, 0.2956)), 0),      # rel .955, twin of 1
        (3, v((0, 0.9), (1, -0.4359)), 1),        # rel .900, diverse
        (4, v((0, 0.5), (3, 0.86)), 1),
        (5, v((0, 0.4), (4, 0.9)), 2),
        (6, v((0, 0.3), (5, 0.95)), 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    orig = cm.load
    try:
        cm.load = lambda s, d, n: emb
        rt.load = lambda s, d, n: emb
        out = sorted(
            rt.search_mmr_topk(spark, "ignored").collect(),
            key=lambda r: r["rank"],
        )
    finally:
        cm.load = orig
        rt.load = orig
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["vec_id"] == 1          # relevance argmax
    assert out[1]["vec_id"] == 3          # diverse vec beats the twin
    assert out[0]["mmr"] == 0.7 * out[0]["rel"]
    ids = [r["vec_id"] for r in out]
    assert 2 in ids  # the twin still eventually enters (only 6 cands)
