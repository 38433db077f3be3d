"""Multimodal column plumbing — SURVEY §2D.

Treats media as opaque ``binary`` payloads with a typed metadata
struct, and runs "decode / feature-extract" as an Arrow-batched
``mapInPandas`` stage — the one place in the engine where Python
touches rows, by design: real decoders (PIL/ffmpeg/torchaudio) are
C-library calls that belong in a vectorized Python worker, not in JVM
expressions.

The decode itself is STUBBED (the container ships no media libraries):
``_decode_stub`` derives deterministic features from the payload bytes
so the full pipeline — schema, batching, partitioning, downstream
aggregation — is real and testable. Swap ``_decode_stub`` for a real
decoder to productionize; nothing else changes.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payloads never hit the driver; the downstream aggregate is a normal
hash agg. At 100 TB the payload column stays columnar parquet and the
decode stage is the natural GPU/accelerator boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import documents

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    For the testdata the payload is the UTF-8 text bytes; in a real
    corpus this column is the raw image/audio bytes read from parquet.
    """
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/raw").alias("mime"),
        ).alias("meta"),
    )


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: per-payload byte statistics.

    A real implementation would decode ``payload`` with an image/audio
    library and emit embeddings / resized frames. NotImplementedError
    is deliberately NOT raised — the stub produces stable values so
    the pipeline is end-to-end testable without media libs.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_bytes": payloads.map(len).astype("int64"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
            }
        )


def decode_features(media: DataFrame) -> DataFrame:
    return media.mapInPandas(_decode_stub, FEATURE_SCHEMA)


def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: attach media columns → Arrow decode → per-source agg.

    Rows-only driver check (the decode stage is not SQL-expressible by
    design); unit tests assert the deterministic feature values.
    """
    feats = decode_features(with_media_columns(documents(spark, sf_dir)))
    return feats.groupBy("source").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("mean_byte"), 2).alias("avg_mean_byte"),
        F.round(F.avg("width"), 2).alias("avg_width"),
    )
