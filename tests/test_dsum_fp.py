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


def test_dsum_fp2_matches_dsum_on_scale2_domain(spark):
    """dsum_fp2 (single-limb scale-2 fold for quantity-like columns)
    must be bitwise-equal to the decimal idiom (dsum) on its domain:
    <= 2 decimal digits, negatives and sign-cancelling groups
    included."""
    import random

    from duckdb_pipeline_spark.queries.common import dsum, dsum_fp2

    rng = random.Random(11)
    groups = {
        "neg": [-1.25, -0.01, -99999.99],
        "cancel": [50.0, -50.0, 0.25, -0.25, 123.45, -123.45],
        "rand": [round(rng.uniform(-1e5, 1e5), 2) for _ in range(500)],
        "tiny": [0.01, 0.02, 0.03],
        "whole": [float(rng.randint(1, 50)) for _ in range(200)],
    }
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = (
        df.groupBy("g")
        .agg(dsum_fp2("x").alias("fp2"), dsum("x").alias("dec"))
        .collect()
    )
    for r in out:
        assert r.fp2 == r.dec, (r.g, r.fp2, r.dec)  # bitwise
