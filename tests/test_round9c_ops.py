"""Invariant tests for the third-round-9-session operators beyond the
PQ kernel suite (tests/test_pq.py): farthest-point seeding must be
partition-invariant (per-task argmax partials reduce to the same
global winner under any split), and the video frame-hash kernel must
be batch-shape-invariant."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _planted(spark, n=40, d=8, parts=1):
    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, d).astype("float32")])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(parts) if parts > 1 else df.coalesce(1)


def _pick(rows):
    return min(rows, key=lambda r: (-int(r["md"]), int(r["vid"])))


def test_farthest_point_partition_invariant(spark):
    from duckdb_pipeline_spark.operators.similarity import (
        farthest_point_partials,
    )

    a = _planted(spark, parts=1)
    b = _planted(spark, parts=9)
    seed = np.stack(
        [np.asarray(a.where(F.col("vec_id") == 0).first()["embedding"], "float64")]
    )
    ra = _pick(farthest_point_partials(a, seed).collect())
    rb = _pick(farthest_point_partials(b, seed, chunk=3).collect())
    assert (int(ra["md"]), int(ra["vid"])) == (int(rb["md"]), int(rb["vid"]))


def test_farthest_point_matches_numpy(spark):
    from duckdb_pipeline_spark.operators.similarity import (
        SCALE,
        farthest_point_partials,
    )

    df = _planted(spark, parts=5)
    V = np.stack(
        [
            np.asarray(r["embedding"], "float64")
            for r in df.orderBy("vec_id").collect()
        ]
    )
    seeds = np.stack([V[0], V[7]])
    got = _pick(farthest_point_partials(df, seeds).collect())
    D = (
        np.floor((V[:, None, :] - seeds[None, :, :]) ** 2 * float(SCALE))
        .astype("int64")
        .sum(axis=2)
        .min(axis=1)
    )
    order = np.lexsort((np.arange(len(V)), -D))
    assert int(got["vid"]) == int(order[0])
    assert int(got["md"]) == int(D[order[0]])


def test_video_frame_hashes_partition_invariant(spark):
    from duckdb_pipeline_spark.operators.multimodal import (
        synth_video_payload,
        synthesize_media,
        video_frame_hashes,
    )

    docs = spark.createDataFrame(
        [(i, 40 + 7 * i) for i in range(12)], "doc_id long, n_chars long"
    )
    frames = {}
    for parts in (1, 5):
        media = synthesize_media(
            docs.repartition(parts) if parts > 1 else docs.coalesce(1),
            payload_fn=synth_video_payload,
        )
        rows = video_frame_hashes(media, stride=2).collect()
        frames[parts] = sorted(
            (int(r["media_id"]), int(r["frame_no"]), int(r["n_frames"]), int(r["ahash"]))
            for r in rows
        )
    assert frames[1] == frames[5]
    # stride-2 sampling really halves the frames (ceil division)
    for mid, fno, nf, _ in frames[1]:
        assert fno % 2 == 0 and fno < nf


def test_ivfpq_append_batch_incremental(spark, sf_dir, tmp_path):
    """Incremental IVF-PQ maintenance: appended vectors get
    byte-identical index rows to a full encode under the same frozen
    codebooks/centroids; a replayed batch_id is a no-op."""
    import json
    import os

    from duckdb_pipeline_spark.queries.similarity import (
        _ensure_ivfpq_index,
        ivfpq_append_batch,
    )

    idx = _ensure_ivfpq_index(spark, sf_dir)
    base = spark.read.parquet(idx)
    n0 = base.count()
    # new batch: planted vectors with fresh ids
    rng = np.random.RandomState(5)
    rows = [
        (10_000 + i, [float(x) for x in rng.uniform(-1, 1, 64).astype("float32")])
        for i in range(20)
    ]
    batch = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    appended = ivfpq_append_batch(spark, batch, idx, "b1")
    assert appended == 20
    after = spark.read.parquet(idx)
    assert after.count() == n0 + 20
    # every id exactly once
    assert after.groupBy("vec_id").count().where("count > 1").count() == 0
    # replay is a no-op
    assert ivfpq_append_batch(spark, batch, idx, "b1") == 0
    assert spark.read.parquet(idx).count() == n0 + 20
    # appended codes equal a local re-encode under the frozen metadata
    from duckdb_pipeline_spark.queries.similarity import _ivfpq_encode

    CB1 = np.asarray(json.load(open(os.path.join(idx, "_CODEBOOKS.json"))), "float64")
    C = np.asarray(json.load(open(os.path.join(idx, "_CENTROIDS.json"))), "float64")
    want = {
        int(r["vec_id"]): (int(r["cell"]), list(r["codes"]))
        for r in _ivfpq_encode(batch, CB1, C).collect()
    }
    got = {
        int(r["vec_id"]): (int(r["cell"]), list(r["codes"]))
        for r in after.where(F.col("vec_id") >= 10_000).collect()
    }
    assert got == want
    # leave the shared index clean for other tests/queries
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
