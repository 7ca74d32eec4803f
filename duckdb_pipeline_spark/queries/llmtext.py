"""Text-analysis + multimodal-plumbing queries (north-star ops) over
`documents`, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import (
    EMAIL_RE,
    LONG_DIGITS_RE,
    RK_K,
    RK_M,
    RK_POWS,
    TOKEN_PATTERN,
    URL_RE,
    chunk_tokens,
    fingerprint,
    language_id,
    quality_score,
    rolling_fingerprint,
    scrub_pii_arrow,
    token_stats,
)
from . import QuerySpec
from .common import load

STOPWORD_SQL_LIST = "['the', 'a', 'of', 'and', 'in', 'to', 'is', 'it', 'that', 'for']"


def text_token_stats(spark, sf_dir):
    return token_stats(load(spark, sf_dir, "documents"))


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_uniq_tokens,
       length(text) AS n_chars,
       CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
         / len(string_split(text, ' ')) AS avg_token_len,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_bpe_tokens
FROM documents
"""


def text_quality(spark, sf_dir):
    return quality_score(load(spark, sf_dir, "documents"))


QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE)
         / len(toks) AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS unique_ratio,
       0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE) / len(toks))
         + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS quality_score
FROM t
"""


def text_langid(spark, sf_dir):
    return language_id(load(spark, sf_dir, "documents"))


LANGID_SQL = f"""
WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE)
         / len(toks) AS en_score,
       CASE WHEN CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE)
                 / len(toks) > 0.02
            THEN 'en' ELSE 'unk' END AS lang_pred
FROM t
"""


def text_fingerprint(spark, sf_dir):
    return fingerprint(load(spark, sf_dir, "documents"))


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fingerprint,
       md5(text) AS content_hash
FROM documents
"""


def text_rolling_fingerprint(spark, sf_dir):
    """Rabin-Karp rolling-hash fingerprint (winnowing/MOSS family) over
    char 8-grams: per-doc k-gram count, min/max hash, mod-M hash sum.
    Vectorized numpy kernel; exact int64 arithmetic matches the oracle's
    BIGINT polynomial bit-for-bit."""
    return rolling_fingerprint(load(spark, sf_dir, "documents"))


_RK_POLY = " + ".join(
    f"CAST(unicode(substr(text, i + {j}, 1)) AS BIGINT) * {RK_POWS[j]}"
    for j in range(RK_K)
)

ROLLING_FP_SQL = f"""
WITH g AS (
  SELECT doc_id, text, u.i
  FROM documents, UNNEST(range(1, length(text) - {RK_K} + 2)) AS u(i)
  WHERE length(text) >= {RK_K}
),
h AS (
  SELECT doc_id, ({_RK_POLY}) % {RK_M} AS hh FROM g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_kgrams,
       min(hh) AS fp_min,
       max(hh) AS fp_max,
       CAST(SUM(hh) % {RK_M} AS BIGINT) AS fp_modsum
FROM h GROUP BY doc_id
"""


def multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: payload bytes + typed metadata (the
    oracle-checkable slice of operators.multimodal — decode itself is
    stubbed, see that module)."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
        F.ceil(F.octet_length(F.col("text")) / F.lit(1024.0)).cast("long").alias("n_chunks"),
    )


MULTIMODAL_SQL = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS checksum,
       CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_chunks
FROM documents
"""


def multimodal_decode(spark, sf_dir):
    """REAL distributed media decode: deterministic BMP/WAV payloads are
    synthesized from documents (genuine on-disk formats), pushed through
    the opaque-binary column, and decoded per Arrow batch in numpy /
    stdlib-wave (operators.multimodal.decode_payload). No SQL oracle —
    byte-level media decode is not SQL-expressible; correctness is
    covered by the codec roundtrip + reference-decode pytest
    (tests/test_catalog_multimodal.py)."""
    from ..operators.multimodal import extract_features, synthesize_media

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return extract_features(synthesize_media(docs), decode_stub=False)


def text_udtf_sentences(spark, sf_dir):
    """Python UDTF (table function) — the one UDF shape the rest of
    the engine doesn't exercise (scalar pandas UDFs and grouped/map
    Arrow UDFs are everywhere else): segment documents via a LATERAL
    table function (split on the token ' the '; the synthetic corpus
    has no sentence punctuation). UDTFs are the row-at-a-time slow
    path, so the corpus slice is small and the docstring is the
    warning: use mapInPandas (chunk_tokens) for the hot path; a UDTF
    buys SQL-side composability (LATERAL joins against it), not
    speed."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_id: int, sentence: string")
    class Sentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(" the ")):
                yield i, s

    spark.udtf.register("sentences", Sentences)
    load(spark, sf_dir, "documents").where(F.col("doc_id") < 100).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.sent_id, s.sentence "
        "FROM _udtf_docs d, LATERAL sentences(d.text) s"
    )


UDTF_SENTENCES_SQL = """
SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS sent_id, p[u.i] AS sentence
FROM (SELECT doc_id, string_split(text, ' the ') AS p FROM documents WHERE doc_id < 100),
     UNNEST(range(1, len(p) + 1)) AS u(i)
"""


def text_scrub_pii(spark, sf_dir):
    """PII scrub over documents (emails / URLs / long digit runs).
    Arrow/RE2 kernel variant — bitwise-identical to the JVM-regex
    `scrub_pii` (pytest equivalence) and ~6x faster at sf1; Java's
    backtracking regex was the one hot loop losing to RE2 engines."""
    return scrub_pii_arrow(load(spark, sf_dir, "documents"))


SCRUB_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{EMAIL_RE}', '<EMAIL>', 'g'), '{URL_RE}', '<URL>', 'g'),
         '{LONG_DIGITS_RE}', '<NUM>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}'))
          + len(regexp_extract_all(text, '{URL_RE}'))
          + len(regexp_extract_all(text, '{LONG_DIGITS_RE}')) AS BIGINT) AS n_redactions
FROM documents
"""


def text_chunk_windows(spark, sf_dir):
    """Overlapping 50-token / 30-stride chunking (LLM context-window
    prep) over the short documents."""
    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return chunk_tokens(docs, chunk=50, stride=30)


CHUNK_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 200),
ex AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1) + 1, 30)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // 30 AS BIGINT) AS chunk_id,
       array_to_string(toks[start:start+49], ' ') AS chunk_text,
       len(toks[start:start+49]) AS n_chunk_tokens
FROM ex WHERE start <= len(toks)
"""


def pipeline_corpus_prep(spark, sf_dir):
    """The composed training-corpus prep flow — the reason the
    north-star ops exist as one engine: exact dedup (keep min id per
    content hash) -> quality filter (score >= 0.45) -> overlapping
    token chunking. Each stage is the already-tested operator; the
    composition itself is the product. Plan shape at 100 TB: dedup is
    one content-hash shuffle, the quality filter is scan-side codegen
    on the kept docs, chunking is a map-side explode — no stage
    re-reads the corpus twice."""
    from ..operators.dedup import exact_dedup
    from ..operators.text import chunk_tokens, quality_score

    docs = load(spark, sf_dir, "documents")
    keepers = exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    kept = docs.join(keepers, "doc_id", "left_semi")
    good_ids = (
        quality_score(kept)
        .where(F.col("quality_score") >= 0.45)
        .select("doc_id")
    )
    return chunk_tokens(kept.join(good_ids, "doc_id", "left_semi"))


CORPUS_PREP_SQL = f"""
WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
kd AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
qual AS (
  SELECT doc_id FROM (
    SELECT doc_id, string_split(text, ' ') AS toks FROM kd
  )
  WHERE 0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
      + 0.3 * (CAST(len(list_filter(toks, x -> list_contains({STOPWORD_SQL_LIST}, x))) AS DOUBLE) / len(toks))
      + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) >= 0.45
),
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM kd JOIN qual USING (doc_id)),
ex AS (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks), 1) + 1, 30)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // 30 AS BIGINT) AS chunk_id,
       array_to_string(toks[start:start+49], ' ') AS chunk_text,
       len(toks[start:start+49]) AS n_chunk_tokens
FROM ex WHERE start <= len(toks)
"""


def multimodal_phash_groups(spark, sf_dir):
    """Perceptual image dedup: 64-bit average-hash (aHash) over REAL
    decoded BMP pixels, then groupBy(ahash) — exact dedup's plan shape,
    keyed on pixel content instead of file bytes. The corpus is the
    synthesized image set UNION a re-encode of every image under
    different encoder metadata (pixel-identical, byte-DIFFERENT files —
    every content checksum differs, so exact dedup finds nothing, while
    the pixel hash pairs each re-save with its original; the re-saved-
    upload case every image corpus has). Output: one row per duplicate
    group (n_copies >= 2). No SQL oracle — pixel decode is not
    SQL-expressible; aHash invariances are pytest-covered
    (tests/test_catalog_multimodal.py)."""
    from ..operators.multimodal import image_ahash, reencode_images, synthesize_media

    docs = load(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 400) & (F.col("doc_id") % 2 == 0)
    )
    media = synthesize_media(docs)
    copies = reencode_images(media).withColumn(
        "media_id", F.col("media_id") + F.lit(1_000_000)
    )
    corpus = media.unionByName(copies)
    return (
        image_ahash(corpus)
        .groupBy("ahash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("media_id").alias("keeper_id"))
        .where(F.col("n_copies") >= 2)
    )


QUERIES = {
    "pipeline_corpus_prep": QuerySpec(
        pipeline_corpus_prep, CORPUS_PREP_SQL, "dedup->quality->chunk corpus prep"
    ),
    "text_scrub_pii": QuerySpec(text_scrub_pii, SCRUB_SQL, "PII scrubbing"),
    "text_chunk_windows": QuerySpec(text_chunk_windows, CHUNK_SQL, "token-window chunking"),
    "text_token_stats": QuerySpec(text_token_stats, TOKEN_STATS_SQL, "token statistics"),
    "text_quality_score": QuerySpec(text_quality, QUALITY_SQL, "quality scoring"),
    "text_language_id": QuerySpec(text_langid, LANGID_SQL, "language-ID heuristic"),
    "text_fingerprint": QuerySpec(text_fingerprint, FINGERPRINT_SQL, "bag-of-words fingerprint"),
    "text_rolling_fingerprint": QuerySpec(
        text_rolling_fingerprint, ROLLING_FP_SQL, "Rabin-Karp rolling-hash fingerprint"
    ),
    "text_udtf_sentences": QuerySpec(
        text_udtf_sentences, UDTF_SENTENCES_SQL, "Python UDTF sentence split (LATERAL)"
    ),
    "multimodal_binary_meta": QuerySpec(multimodal_meta, MULTIMODAL_SQL, "binary payload metadata"),
    "multimodal_decode_features": QuerySpec(
        multimodal_decode, None, "real BMP/WAV decode features (non-SQL-expressible)"
    ),
    "multimodal_phash_groups": QuerySpec(
        multimodal_phash_groups, None, "perceptual image-hash dedup (non-SQL-expressible)"
    ),
}
