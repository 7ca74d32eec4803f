"""dsum_fp (3-limb long fixed-point exact sum) vs exact integer math.

The oracle checks prove dsum_fp == DSUM on the testdata; this test
attacks the limb arithmetic directly with adversarial values —
negatives, sign-cancelling groups, magnitude extremes at the documented
|x| <= 4e6 domain bound, and fractions adjacent to the rounding
midpoint — comparing against Python's unbounded-int reference.
"""

import random

from pyspark.sql import functions as F

from duckdb_pipeline_spark.queries.common import dsum_fp


def _reference(vals):
    total = sum(round(v * 10**9) for v in vals)
    q, r = divmod(total, 10**9)  # floor semantics, r >= 0
    return float(q) + float(r) / 1e9


def test_dsum_fp_matches_exact_integer_reference(spark):
    rng = random.Random(7)
    groups = {
        "neg": [-4e6 + 0.000000001, -1.999999999, -0.000000001],
        "cancel": [4e6, -4e6, 1e-9, -1e-9, 123.456789123, -123.456789123],
        "big": [4e6 - 1e-9] * 50 + [-(4e6 - 1e-9)] * 49,
        "rand": [
            rng.uniform(-4e6, 4e6).__round__(9) for _ in range(500)
        ],
        "half": [0.5, -0.5, 1.5, 2.5, -2.5],
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {
        r.g: r.s
        for r in df.groupBy("g").agg(dsum_fp("x").alias("s")).collect()
    }
    for g, vals in groups.items():
        assert got[g] == _reference(vals), (g, got[g], _reference(vals))
