"""Invariant tests for the product-quantization family: the fused
train kernel's partition/chunk invariance (exact integer partials must
re-aggregate identically under any data split), numpy parity of one
training step, and LUT-vs-direct equivalence of the ADC scorer.
Oracle parity (including the SQL replay of the codebook update) is
covered by the driver protocol (tests/oracle_check.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _planted(spark, n=60, d=8, parts=1):
    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, d).astype("float32")])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df.coalesce(1)


def _seed_cb(df, m_sub, k, ds):
    rows = df.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    S0 = np.stack([np.asarray(r["embedding"], dtype="float64") for r in rows])
    return np.stack([S0[:, m * ds : (m + 1) * ds] for m in range(m_sub)])


def _agg(df):
    out = {}
    for r in (
        df.groupBy("m", "code", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    ):
        out[(int(r["m"]), int(r["code"]), int(r["i"]))] = (int(r["s"]), int(r["n"]))
    return out


def test_pq_train_partials_partition_invariant(spark):
    from duckdb_pipeline_spark.operators.similarity import pq_train_partials

    m_sub, k, ds = 2, 4, 4
    a = _planted(spark, parts=1)
    b = _planted(spark, parts=7)
    cb = _seed_cb(a, m_sub, k, ds)
    ra = _agg(pq_train_partials(a, cb, emit_inertia=True))
    rb = _agg(pq_train_partials(b, cb, emit_inertia=True, chunk=5))
    assert ra == rb


def test_pq_train_step_matches_numpy(spark):
    """One kernel pass must reproduce the exact numpy assignment and
    component sums with the same floor fixed-point and low-code ties."""
    from duckdb_pipeline_spark.operators.similarity import (
        SCALE,
        pq_train_partials,
    )

    m_sub, k, ds = 2, 4, 4
    df = _planted(spark)
    V = np.stack(
        [
            np.asarray(r["embedding"], dtype="float64")
            for r in df.orderBy("vec_id").collect()
        ]
    )
    cb = _seed_cb(df, m_sub, k, ds)
    got = _agg(pq_train_partials(df, cb, emit_inertia=True))
    Vf = np.floor(V * float(SCALE)).astype("int64")
    for m in range(m_sub):
        Wm = V[:, m * ds : (m + 1) * ds]
        D = (
            np.floor((Wm[:, None, :] - cb[m][None, :, :]) ** 2 * float(SCALE))
            .astype("int64")
            .sum(axis=2)
        )
        a = D.argmin(axis=1)
        assert got[(m, -1, 0)][0] == int(D.min(axis=1).sum())
        for c in range(k):
            sel = a == c
            if sel.any():
                comp = Vf[sel][:, m * ds : (m + 1) * ds].sum(axis=0)
                for i in range(ds):
                    s, n = got[(m, c, i + 1)]
                    assert s == int(comp[i]) and n == int(sel.sum())


def test_pq_adc_lut_equals_direct_codeword_distance(spark):
    """For every vector, the LUT-summed ADC distance must equal the
    directly-computed distance between the query and the vector's
    assigned codewords."""
    from duckdb_pipeline_spark.operators.similarity import (
        SCALE,
        pq_adc_distances,
    )

    m_sub, k, ds = 2, 4, 4
    df = _planted(spark)
    cb = _seed_cb(df, m_sub, k, ds)
    q = np.asarray(
        df.where(F.col("vec_id") == 0).first()["embedding"], dtype="float64"
    )
    got = {
        int(r["vec_id"]): int(r["adc_dist"])
        for r in pq_adc_distances(df, cb, q).collect()
    }
    V = np.stack(
        [
            np.asarray(r["embedding"], dtype="float64")
            for r in df.orderBy("vec_id").collect()
        ]
    )
    for vid in range(len(V)):
        dist = 0
        for m in range(m_sub):
            Wm = V[vid, m * ds : (m + 1) * ds]
            D = (
                np.floor((Wm[None, :] - cb[m]) ** 2 * float(SCALE))
                .astype("int64")
                .sum(axis=1)
            )
            code = int(D.argmin())
            qm = q[m * ds : (m + 1) * ds]
            dist += int(
                np.floor((qm - cb[m][code]) ** 2 * float(SCALE))
                .astype("int64")
                .sum()
            )
        assert got[vid] == dist
