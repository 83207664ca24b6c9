"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched ``mapInPandas`` — the pattern a 100 TB
image/audio/video pipeline uses on Spark.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; the
pipeline uses a deterministic fake featureizer instead). Everything
Spark-side — binary column construction, schema, batch iteration,
partition-parallel UDF execution — is real and tested.

- ``multimodal_meta``     — binary column + metadata projection
  (oracle-checked: byte lengths/prefix via blob functions).
- ``multimodal_features`` — mapInPandas feature extraction over binary
  payloads (byte stats standing in for decoded-pixel stats). Rows-only
  (Python-side bytes math is not SQL-portable) but fully deterministic.

Scale notes: mapInPandas streams Arrow batches per partition — constant
memory per task regardless of table size; binary payloads never pass
through Python row-by-row. Real media would swap the featureizer body
for PIL/ffmpeg calls with the identical Spark plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesumer_spark.catalog import read_table
from kinesumer_spark.registry import register


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to pixels. STUB: codecs are not available
    in this environment; a production build plugs PIL/turbojpeg in here
    with the same signature."""
    raise NotImplementedError("image codecs unavailable in this container")


_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       substr(md5(text), 1, 8) AS media_checksum,
       CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END
         AS size_class
FROM documents
ORDER BY doc_id
"""


@register("multimodal_meta", oracle=_META_ORACLE, tags=("multimodal",))
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + typed metadata (the storage model: media as
    opaque bytes, metadata as queryable columns beside it)."""
    d = read_table(spark, sf_dir, "documents")
    media = F.col("text").cast("binary")  # stand-in payload bytes
    return (
        d.select(
            "doc_id",
            F.octet_length(media).cast("bigint").alias("n_bytes"),
            F.substring(F.md5(media), 1, 8).alias("media_checksum"),
            F.when(F.octet_length(media) > 300, "large")
            .otherwise("small")
            .alias("size_class"),
        )
        .orderBy("doc_id")
    )


_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, byte_mean double, "
    "fake_width int, fake_height int"
)


def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch featureizer. Deterministic byte statistics stand in
    for decoded-pixel statistics (mean/histogram/resize dims)."""
    for pdf in batches:
        payloads = pdf["media"]
        n_bytes = payloads.map(len)
        byte_sum = payloads.map(lambda b: sum(b))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "byte_sum": byte_sum.astype("int64"),
                "byte_mean": (byte_sum / n_bytes).round(6),
                # a real pipeline would emit decoded dims; fake but typed
                "fake_width": (n_bytes % 256).astype("int32"),
                "fake_height": (byte_sum % 256).astype("int32"),
            }
        )


@register("multimodal_features", oracle=None, tags=("multimodal",))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("media")
    )
    return d.mapInPandas(_featurize, schema=_FEATURES_SCHEMA).orderBy("doc_id")
