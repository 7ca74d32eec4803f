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


def word_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per document: (id, shingle).

    Docs with fewer than ``n`` tokens produce no shingles (mirrors the
    DuckDB ``range`` formulation). ``distinct=False`` skips the dedup
    shuffle — correct for consumers like min-hash where duplicates
    cannot change the result.
    """
    # explode an index sequence, then element_at + concat_ws — every
    # expression stays in whole-stage codegen (a transform() lambda
    # would drop the widest stage of the pipeline to interpreted eval;
    # measured ~3x slower)
    toks = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("t"))
    ex = toks.select(
        F.col(id_col),
        F.col("t"),
        F.explode(F.expr(f"sequence(1, greatest(size(t) - {n - 1}, 1))")).alias("i"),
    ).where(F.col("i") <= F.size("t") - (n - 1))
    parts = [F.element_at("t", F.col("i") + j) for j in range(n)]
    out = ex.select(F.col(id_col), F.concat_ws(" ", *parts).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 16) -> DataFrame:
    """(id, h0..h{K-1}): per document, K independent min-hashes as
    columns.

    Hash k of a shingle = md5("<k>:<shingle>"); min over the doc's
    shingles. Lexicographic min over 32-char hex == min over uniform
    128-bit values.

    Plan shape: ONE shuffle — the K hashes are K plain md5 column
    expressions (whole-stage codegen; a `transform` lambda would drop
    to interpreted evaluation), and the groupBy carries K min()
    aggregates with map-side partials. (The naive formulation — explode
    ×K then groupBy(id, k) — shuffles K× the data.)
    """
    hash_cols = [
        F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle"))).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    per = shingles.select(F.col(id_col), *hash_cols)
    aggs = [F.min(F.col(f"mh{k}")).alias(f"h{k}") for k in range(num_hashes)]
    return per.groupBy(id_col).agg(*aggs)


def lsh_bands(
    minhashes: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, band, sig): concatenate each band's minhash columns."""
    n_bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(n_bands)
    ]
    return minhashes.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


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
    |A∩B| / (|A| + |B| - |A∩B|).

    The candidate set is tiny relative to the shingle table (that's the
    point of LSH) — broadcast it so the intersection count is two
    broadcast joins over one shingle scan each, not a repartition of
    the full shingle table."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        F.broadcast(pairs).join(sa, "doc_a")
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
    # the shingle table feeds four plan branches (minhash + pair sides
    # + sizes); Spark doesn't CSE across branches, so persist it once
    sh = word_shingles(df, id_col, text_col, n).persist()
    mh = minhash_signatures(sh, id_col, num_hashes)
    bands = lsh_bands(mh, id_col, num_hashes, rows_per_band)
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
    # one ±1 expression per bit, all evaluated per shingle row inside
    # codegen; ONE shuffle with `bits` map-side partial sums (the
    # explode-×bits formulation shuffles bits× the data)
    bit_exprs = [
        F.expr(
            f"CASE WHEN (shiftright(instr('0123456789abcdef', substr(h, {b // 4 + 1}, 1)) - 1, {b % 4}) & 1) = 1 "
            "THEN 1 ELSE -1 END"
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    sums = sh.select(F.col(id_col), *bit_exprs).groupBy(id_col).agg(
        *[F.sum(f"v{b}").alias(f"s{b}") for b in range(bits)]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.alias("simhash"))


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
    ).persist()
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
