"""Similarity search over embedding columns (north-star op).

Exact brute-force cosine as the baseline; label/bucket-blocked variants
as the scale path (the same code shape used for IVF: restrict the pair
space by a partition key before the distance computation).

Cross-engine determinism: element products are computed in float64 and
fixed-point-truncated (``floor(x * 1e9)`` → BIGINT) before summation.
Integer sums are exact and association-order-free, so Spark and the
DuckDB oracle produce bitwise-identical cosines (double→decimal casts
are NOT portable at high scale — measured; see queries/common.py).

Scale notes: the posexplode formulation shuffles (n_vectors × dim)
rows; for 100 TB-scale ANN the blocked variant prunes to
per-bucket brute force (IVF-style), and the `zip_with` fold variant
(`cosine_zip`) avoids the explode entirely when the pair list is
already bounded — it stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000  # fixed-point scale for exact integer sums


def _dot_terms(a, b):
    """floor(a*b * SCALE) as bigint — deterministic fixed-point term."""
    return F.floor(a.cast("double") * b.cast("double") * F.lit(SCALE)).cast("long")


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    posexplode both sides → broadcast-join on position → integer-exact
    partial sums → cosine. Excludes the query vector itself.
    """
    q = (
        embeddings.where(F.col(id_col) == query_id)
        .select(F.posexplode(vec_col).alias("pos", "qv"))
    )
    e = embeddings.select(id_col, F.posexplode(vec_col).alias("pos", "ev"))
    sums = (
        e.join(F.broadcast(q), "pos")
        .groupBy(id_col)
        .agg(
            F.sum(_dot_terms(F.col("ev"), F.col("qv"))).alias("dot_i"),
            F.sum(_dot_terms(F.col("ev"), F.col("ev"))).alias("na_i"),
            F.sum(_dot_terms(F.col("qv"), F.col("qv"))).alias("nq_i"),
        )
    )
    cos = sums.select(
        F.col(id_col),
        (
            F.col("dot_i").cast("double")
            / (F.sqrt(F.col("na_i").cast("double")) * F.sqrt(F.col("nq_i").cast("double")))
        ).alias("cosine"),
    )
    return (
        cos.where(F.col(id_col) != query_id)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_blocked(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs within blocking-key groups
    (IVF-style pruning: only same-bucket pairs are compared)."""
    e = embeddings.select(
        F.col(id_col), F.col(block_col).alias("blk"), F.posexplode(vec_col).alias("pos", "v")
    )
    a = e.select(F.col(id_col).alias("vec_a"), "blk", "pos", F.col("v").alias("va"))
    b = e.select(F.col(id_col).alias("vec_b"), "blk", "pos", F.col("v").alias("vb"))
    sums = (
        a.join(b, ["blk", "pos"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum(_dot_terms(F.col("va"), F.col("vb"))).alias("dot_i"),
            F.sum(_dot_terms(F.col("va"), F.col("va"))).alias("na_i"),
            F.sum(_dot_terms(F.col("vb"), F.col("vb"))).alias("nb_i"),
        )
    )
    return sums.select(
        "vec_a",
        "vec_b",
        (
            F.col("dot_i").cast("double")
            / (F.sqrt(F.col("na_i").cast("double")) * F.sqrt(F.col("nb_i").cast("double")))
        ).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def cosine_zip(df: DataFrame, vec_a: str, vec_b: str, out: str = "cosine") -> DataFrame:
    """Codegen-friendly cosine between two array columns on one row
    (`zip_with` + `aggregate` fold — no explode, no shuffle). The fast
    path for bounded candidate lists; not oracle-exact (sequential
    float fold), hence used in benchmarks and pipelines, not in the
    hash-checked queries."""
    dot = F.aggregate(
        F.zip_with(F.col(vec_a), F.col(vec_b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(F.col(vec_a), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nb = F.aggregate(
        F.transform(F.col(vec_b), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return df.withColumn(out, dot / (F.sqrt(na) * F.sqrt(nb)))
