"""Shared per-document term-frequency cache (VERDICT r10 #4).

Four declared queries — `text_unigram_xent`, `corpus_budget_select`,
`quality_gopher_repetition`, `text_repetition_stats` — each paid their
own corpus-token explode + (doc, token) shuffle: the same ~16M-row tf
relation derived four times at sf10 (6-8 s per derivation). This module
materializes it ONCE per corpus version as a bucketed(doc_id) table —
the deployment shape a 100 TB corpus store uses anyway (the tokenized
projection is written when the corpus lands, exactly like the bucketed
silver fact tables and the MinHash band index), so every per-document
fold downstream (n_tokens, type counts, top-token) consumes it with NO
Exchange: Spark proves the groupBy(doc_id) distribution from the bucket
spec.

Semantics: tf = count per (doc_id, token) of `split(text, ' ')` with
EMPTY TOKENS KEPT — so `sum(tf)` per doc equals `size(split(...))`
exactly (what text_repetition_stats needs); consumers that exclude
empties (`text_unigram_xent`, `corpus_budget_select`) filter
`token != ''` on the read, which is a data-reducing map-side predicate,
not a second derivation.

Staleness follows the band-index/bucketed-layout contract: (size,
mtime) fast path, sha256 slow path, absolute-dir-hashed cache location;
a stamp miss clears session caches before rebuilding (same-session
source rewrites must not reuse CacheManager-matched plans — ADVICE
r10). Reference parity note: the reference has no materialized token
store; this is an at-rest layout choice on the Spark side, and every
consumer's DuckDB oracle still derives tf inline from raw text, so the
correctness gate covers the full derivation.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from .common import load

_N_BUCKETS = 32  # parallelism ceiling of the bucketed scan; see
# queries/bucketed.py:_N_BUCKETS for the measured rationale


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ddl(schema) -> str:
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def _ensure_doc_tf(spark, sf_dir: str) -> str:
    """Materialize (once per corpus version) the (doc_id, token, tf)
    projection of `documents` as a bucketed(doc_id) catalog table;
    returns the table name."""
    absd = os.path.abspath(sf_dir)
    label = hashlib.sha256(absd.encode()).hexdigest()[:12]
    tname = f"toktf_{label}"
    path = os.path.join(_repo_root(), ".scratch", "toktf", label)
    src = os.path.join(sf_dir, "documents.parquet")

    # `documents.parquet` is a single file in the driver's testdata but
    # a parquet DIRECTORY when written by Spark (tests, downstream
    # lakes) — stamp over the sorted data-file list either way
    def _parts(p: str) -> list[str]:
        if os.path.isdir(p):
            return sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(p)
                for f in fs
                if not f.startswith(("_", "."))
            )
        return [p]

    parts = _parts(src)
    sizes = [os.stat(f) for f in parts]
    size = sum(s.st_size for s in sizes)
    mtime_ns = max((s.st_mtime_ns for s in sizes), default=0)
    spec = {"n_buckets": _N_BUCKETS, "key": "doc_id", "scheme": "split-space-v2"}
    marker = os.path.join(path, "_SRC.json")
    old = None
    try:
        with open(marker) as fh:
            old = json.load(fh)
    except (OSError, ValueError):
        pass

    def _content_hash() -> str:
        h = hashlib.sha256()
        for f in parts:
            h.update(os.path.basename(f).encode())
            with open(f, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
        return h.hexdigest()

    fresh = False
    digest = None
    if old is not None and {k: old.get(k) for k in spec} == spec:
        if old.get("size") == size and old.get("mtime_ns") == mtime_ns:
            fresh = True
        elif old.get("size") == size:
            digest = _content_hash()
            if old.get("sha256") == digest:
                fresh = True  # same bytes, touched file: refresh marker
                with open(marker, "w") as fh:
                    json.dump({**old, "mtime_ns": mtime_ns}, fh)
    if digest is None and not fresh:
        digest = _content_hash()

    if not fresh:
        # stamp miss: the source changed (or first build) — invalidate
        # every session cache derived from the path (memoized load,
        # FileIndex listing, CacheManager plans) so the rebuild reads
        # what is on disk (ADVICE r10)
        from .common import invalidate_source

        invalidate_source(spark, sf_dir, "documents")
        tf = (
            load(spark, sf_dir, "documents")
            .select(
                "doc_id",
                "source",
                F.explode(F.split("text", " ")).alias("token"),
            )
            # source is functionally dependent on doc_id, so carrying
            # it through the groupBy adds no groups — it rides along
            # (scheme v2) for the per-source consumers (corpus_source_kl)
            .groupBy("doc_id", "source", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
            .select("doc_id", "token", "tf", "source")
        )
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        (
            tf.repartition(_N_BUCKETS, F.col("doc_id"))
            .write.bucketBy(_N_BUCKETS, "doc_id")
            .sortBy("doc_id")
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tname)
        )
        with open(marker, "w") as fh:
            json.dump(
                {"size": size, "mtime_ns": mtime_ns,
                 "sha256": digest, **spec},
                fh,
            )
        return tname

    if not spark.catalog.tableExists(tname):
        schema = spark.read.parquet(path).schema
        spark.sql(
            f"CREATE TABLE {tname} ({_ddl(schema)}) USING PARQUET "
            f"CLUSTERED BY (doc_id) SORTED BY (doc_id) "
            f"INTO {_N_BUCKETS} BUCKETS LOCATION '{path}'"
        )
    return tname


def doc_tf(spark, sf_dir: str):
    """The shared (doc_id, token, tf) relation, bucketed by doc_id."""
    return spark.table(_ensure_doc_tf(spark, sf_dir))


def append_doc_tf(spark, sf_dir: str, new_docs) -> str:
    """Incrementally EXTEND the tf projection with a new document
    batch — the hourly-cron shape (the reference's cadence,
    run_serialise_raw_data.py): tokenize ONLY the arriving docs and
    append their (doc_id, token, tf, source) rows to the bucketed
    table; the corpus is never re-tokenized. Spark appends bucketed
    data bucket-aligned (same spec), so the Exchange-free per-doc
    folds keep working over the union.

    Contract: ``new_docs`` (doc_id, text, source) must be NEW doc_ids —
    tf rows are per-document, so appending an existing doc would
    double-count it (the caller gates admission; `stream_neardup_gate`
    is that front door). The source stamp is REMOVED (not updated):
    the on-disk table now deliberately leads the source parquet, and
    the next `_ensure_doc_tf` against a changed source rebuilds from
    scratch — append is an optimization between corpus versions, never
    a substitute for the staleness contract. Append==rebuild equality
    is pytest-pinned."""
    tname = _ensure_doc_tf(spark, sf_dir)
    batch_tf = (
        new_docs.select(
            "doc_id",
            "source",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("doc_id", "source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("doc_id", "token", "tf", "source")
    )
    (
        batch_tf.repartition(_N_BUCKETS, F.col("doc_id"))
        .write.mode("append")
        .insertInto(tname)
    )
    # the table now contains docs the stamped source doesn't: drop the
    # stamp so a later ensure() against a NEW corpus version rebuilds
    # rather than trusting a stale marker
    absd = os.path.abspath(sf_dir)
    label = hashlib.sha256(absd.encode()).hexdigest()[:12]
    marker = os.path.join(_repo_root(), ".scratch", "toktf", label, "_SRC.json")
    try:
        os.remove(marker)
    except OSError:
        pass
    return tname
