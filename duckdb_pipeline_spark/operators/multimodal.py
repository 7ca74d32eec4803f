"""Multimodal-column plumbing (north-star op).

Images/audio/video are opaque ``binary`` columns + typed metadata
structs. The Spark-side plumbing — schema, partition-friendly batch
shapes, Arrow-batched ``mapInPandas`` UDF signatures — is real and
tested; the actual media decode is STUBBED (decode libraries are not in
this container): ``decode_stub=True`` produces deterministic fake
features, ``decode_stub=False`` raises NotImplementedError where a real
``PIL.Image.open`` / ``soundfile.read`` call would go.

Scale notes: mapInPandas streams Arrow record batches; binary payloads
never round-trip through Python row objects. Media work parallelizes
per input partition — repartition by a size-balanced key before heavy
decode so one task doesn't get all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("checksum", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_dim", LongType()),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute the typed metadata struct from the raw payload (JVM-side
    — no Python in this path)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("checksum"),
        ),
    )


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real deployments replace the stub branch with the decode library
    call; the dataflow (schema, batching, partitioning) is identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "media decode requires PIL/soundfile/av — not in this container"
                )
            payloads = pdf["payload"]
            # deterministic fake feature: mean byte value of the payload
            feat = payloads.map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feat_mean": feat.astype("float64"),
                    "feat_dim": pd.Series([1] * len(pdf), dtype="int64"),
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped frame from the documents table
    (text bytes as a stand-in payload — exercises the full plumbing
    with the data available in this environment)."""
    return attach_media_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("media_type"),
            F.encode(F.col("text"), "UTF-8").alias("payload"),
        )
    )
