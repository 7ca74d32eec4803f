"""Deduplication operators for large text corpora (north-star ops,
BASELINE.json): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All deterministic and engine-portable by construction: the only hash
used is MD5 over explicit strings (identical in Spark and the DuckDB
oracle), "minimum" is the lexicographic min over fixed-width hex
strings — a valid uniform min-hash.

Scale design (100 TB corpus):
- everything is expressed as joins/groupBys on (doc_id, shingle) and
  (band, signature) keys — no pairwise O(n^2) stage ever materializes;
  LSH banding bounds candidate generation to true near-duplicates.
- the shingle explosion is the widest stage; it flows through a single
  map-side transform (split → slice → explode) with no shuffle until
  the minhash groupBy on doc_id.
- band-bucket self-join: bucket sizes follow collision probability;
  skewed buckets (boilerplate docs) are handled by AQE skew-join
  splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Docs with fewer than ``n`` tokens produce no shingles (mirrors the
    DuckDB ``range`` formulation).
    """
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    shingle_expr = F.expr(
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}), i -> array_join(slice(t, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        toks.select(F.col(id_col), F.explode(shingle_expr).alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 16) -> DataFrame:
    """(id, k, minhash): per document, K independent min-hashes.

    Hash k of a shingle = md5("<k>:<shingle>"); min over the doc's
    shingles. Lexicographic min over 32-char hex == min over uniform
    128-bit values.
    """
    ks = shingles.sparkSession.range(num_hashes).select(F.col("id").cast("int").alias("k"))
    return (
        shingles.crossJoin(F.broadcast(ks))
        .select(
            F.col(id_col),
            F.col("k"),
            F.md5(F.concat(F.col("k").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
        )
        .groupBy(id_col, "k")
        .agg(F.min("h").alias("h"))
    )


def lsh_bands(minhashes: DataFrame, id_col: str = "doc_id", rows_per_band: int = 4) -> DataFrame:
    """(id, band, sig): concatenate each band's minhashes (k-ordered)."""
    banded = minhashes.withColumn("band", F.expr(f"k div {rows_per_band}"))
    return banded.groupBy(id_col, "band").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("k", "h"))), lambda s: s["h"]),
            "|",
        ).alias("sig")
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band signature."""
    a = bands.select(F.col(id_col).alias("doc_a"), "band", "sig")
    b = bands.select(F.col(id_col).alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(shingles: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    |A∩B| / (|A| + |B| - |A∩B|)."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))).alias("jaccard"),
        )
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs with exact-Jaccard
    verification: (doc_a, doc_b, jaccard >= threshold)."""
    sh = word_shingles(df, id_col, text_col, n)
    mh = minhash_signatures(sh, id_col, num_hashes)
    bands = lsh_bands(mh, id_col, rows_per_band)
    cands = lsh_candidate_pairs(bands, id_col)
    return jaccard_verify(sh, cands, id_col).where(F.col("jaccard") >= threshold)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct text
    with the keeper id (min) and the duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3, bits: int = 32
) -> DataFrame:
    """Per-document SimHash fingerprint over word n-gram shingles.

    Bit b of md5(shingle) is extracted portably from the hex string
    (char index b//4, bit b%4); bit of the fingerprint = sign of the
    sum of (2*bit-1) over shingles. Returns (id, simhash BIGINT).
    """
    sh = word_shingles(df, id_col, text_col, n).select(
        F.col(id_col), F.md5(F.col("shingle")).alias("h")
    )
    bs = sh.sparkSession.range(bits).select(F.col("id").cast("int").alias("b"))
    bit_vals = sh.crossJoin(F.broadcast(bs)).select(
        F.col(id_col),
        F.col("b"),
        F.expr(
            "CASE WHEN (shiftright(instr('0123456789abcdef', substr(h, (b div 4) + 1, 1)) - 1, b % 4) & 1) = 1 "
            "THEN 1 ELSE -1 END"
        ).alias("v"),
    )
    bitsum = bit_vals.groupBy(id_col, "b").agg(F.sum("v").alias("s"))
    return bitsum.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(F.lit(0))
        ).alias("simhash")
    )


def ngram_jaccard_blocked(
    docs: DataFrame,
    block_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """All-pairs n-gram Jaccard within blocking-key groups.

    Blocking bounds the pair space (classic blocked dedup); within a
    block, candidate pairs are generated by the shingle join itself —
    only docs sharing at least one shingle ever pair up.
    """
    sh = word_shingles(docs, id_col, text_col, n).join(
        docs.select(id_col, block_col), id_col
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col(id_col).alias("doc_a"), F.col(block_col).alias("blk"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), F.col(block_col).alias("blk"), "shingle")
    inter = (
        a.join(b, ["blk", "shingle"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    za = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
