"""The sf1 bench numbers in BASELINE.md rest on scripts/gen_scale.py
producing a faithful scale-up: referential integrity must hold (every
scaled fact row still joins its dimensions) and payload perturbation
must not plant cross-copy near-duplicates."""

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    import gen_scale

    out = str(tmp_path_factory.mktemp("sfx"))
    gen_scale.scale(out, k=3, src="/root/testdata/sf0.001")
    return out, "/root/testdata/sf0.001", 3


def test_counts_and_referential_integrity(scaled):
    out, src, k = scaled
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "events", "documents", "embeddings"):
        n_src = con.execute(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        n_out = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        assert n_out == k * n_src, t
    for t in ("region", "nation"):
        assert (
            con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
            == con.execute(f"SELECT count(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        )
    # every FK in the scaled fact tables resolves (zero orphans)
    orphans = {
        "li->orders": f"SELECT count(*) FROM '{out}/lineitem.parquet' l LEFT JOIN '{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL",
        "li->part": f"SELECT count(*) FROM '{out}/lineitem.parquet' l LEFT JOIN '{out}/part.parquet' p ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL",
        "li->supplier": f"SELECT count(*) FROM '{out}/lineitem.parquet' l LEFT JOIN '{out}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL",
        "orders->customer": f"SELECT count(*) FROM '{out}/orders.parquet' o LEFT JOIN '{out}/customer.parquet' c ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL",
        "customer->nation": f"SELECT count(*) FROM '{out}/customer.parquet' c LEFT JOIN '{out}/nation.parquet' n ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL",
    }
    for name, q in orphans.items():
        assert con.execute(q).fetchone()[0] == 0, name


def test_no_cross_copy_planted_twins(scaled):
    out, _, _ = scaled
    con = duckdb.connect()
    # exact cross-copy text dups would quadratically inflate dedup
    # workloads; the per-copy salting must keep texts distinct per copy
    n_docs, n_distinct_per_copy = con.execute(
        f"SELECT count(*), count(DISTINCT (text, doc_id // 1000000)) FROM '{out}/documents.parquet'"
    ).fetchone()
    dup_texts = con.execute(
        f"SELECT count(*) FROM (SELECT text FROM '{out}/documents.parquet' GROUP BY text HAVING count(DISTINCT doc_id // 1000000) > 1)"
    ).fetchone()[0]
    assert dup_texts == 0
    # embeddings: rotation keeps norms but no identical cross-copy vectors
    same_vec = con.execute(
        f"SELECT count(*) FROM (SELECT embedding FROM '{out}/embeddings.parquet' GROUP BY embedding HAVING count(DISTINCT vec_id // 1000000) > 1)"
    ).fetchone()[0]
    assert same_vec == 0
