"""Similarity-search queries (north-star ops) over `embeddings`
(array<float>), oracle-checked bitwise (fixed-point integer sums; see
operators.similarity).
"""

from __future__ import annotations

from ..operators.similarity import cosine_pairs_blocked_vectorized, cosine_topk
from . import QuerySpec
from .common import load

S = 1_000_000_000


def similarity_topk(spark, sf_dir):
    """Brute-force exact cosine top-10 neighbors of vector 0."""
    return cosine_topk(load(spark, sf_dir, "embeddings"), query_id=0, k=10)


TOPK_SQL = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
terms AS (
  SELECT e.vec_id,
         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * CAST(q.qe[u.i] AS DOUBLE) * {S}) AS BIGINT) AS dt,
         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * CAST(e.embedding[u.i] AS DOUBLE) * {S}) AS BIGINT) AS et,
         CAST(floor(CAST(q.qe[u.i] AS DOUBLE) * CAST(q.qe[u.i] AS DOUBLE) * {S}) AS BIGINT) AS qt
  FROM embeddings e, q, UNNEST(range(1, len(e.embedding) + 1)) AS u(i)
),
sums AS (
  SELECT vec_id, CAST(SUM(dt) AS BIGINT) AS dot_i, CAST(SUM(et) AS BIGINT) AS na_i,
         CAST(SUM(qt) AS BIGINT) AS nq_i
  FROM terms GROUP BY vec_id
)
SELECT vec_id,
       CAST(dot_i AS DOUBLE) / (sqrt(CAST(na_i AS DOUBLE)) * sqrt(CAST(nq_i AS DOUBLE))) AS cosine
FROM sums
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def similarity_neardup_blocked(spark, sf_dir):
    """Embedding near-dup pairs, IVF-style blocked by label
    (vectorized per-block numpy kernel; bitwise-equal to the join
    formulation and the oracle)."""
    return cosine_pairs_blocked_vectorized(
        load(spark, sf_dir, "embeddings"), threshold=0.3
    )


NEARDUP_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
),
terms AS (
  SELECT vec_a, vec_b,
         CAST(floor(CAST(ea[u.i] AS DOUBLE) * CAST(eb[u.i] AS DOUBLE) * {S}) AS BIGINT) AS dt,
         CAST(floor(CAST(ea[u.i] AS DOUBLE) * CAST(ea[u.i] AS DOUBLE) * {S}) AS BIGINT) AS at2,
         CAST(floor(CAST(eb[u.i] AS DOUBLE) * CAST(eb[u.i] AS DOUBLE) * {S}) AS BIGINT) AS bt2
  FROM pairs, UNNEST(range(1, len(ea) + 1)) AS u(i)
),
sums AS (
  SELECT vec_a, vec_b, CAST(SUM(dt) AS BIGINT) AS dot_i,
         CAST(SUM(at2) AS BIGINT) AS na_i, CAST(SUM(bt2) AS BIGINT) AS nb_i
  FROM terms GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b,
       CAST(dot_i AS DOUBLE) / (sqrt(CAST(na_i AS DOUBLE)) * sqrt(CAST(nb_i AS DOUBLE))) AS cosine
FROM sums
WHERE CAST(dot_i AS DOUBLE) / (sqrt(CAST(na_i AS DOUBLE)) * sqrt(CAST(nb_i AS DOUBLE))) >= 0.3
"""


QUERIES = {
    "similarity_topk": QuerySpec(similarity_topk, TOPK_SQL, "exact cosine top-k"),
    "similarity_neardup_blocked": QuerySpec(
        similarity_neardup_blocked, NEARDUP_SQL, "blocked cosine near-dup pairs"
    ),
}
