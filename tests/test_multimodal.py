"""Multimodal plumbing: binary payloads, Arrow decode stage, agg."""

from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.operators import multimodal
from cassandra_log_analyzer_mcp_spark.sources.tables import documents


def test_media_columns_schema(spark, sf_dir):
    media = multimodal.with_media_columns(documents(spark, sf_dir))
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<width:int,height:int")


def test_decode_features_deterministic(spark, sf_dir):
    media = multimodal.with_media_columns(documents(spark, sf_dir))
    feats = multimodal.decode_features(media)
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    text = (
        documents(spark, sf_dir).filter(F.col("doc_id") == 0).collect()[0].text
    )
    b = text.encode("utf-8")
    assert row.n_bytes == len(b)
    assert abs(row.mean_byte - sum(b) / len(b)) < 1e-9
    assert row.width == 0 % 640 + 32


def test_pipeline_aggregates_by_source(spark, sf_dir):
    out = multimodal.multimodal_pipeline(spark, sf_dir)
    rows = out.collect()
    n_sources = documents(spark, sf_dir).select("source").distinct().count()
    assert len(rows) == n_sources
    assert all(r.n_items > 0 and r.total_bytes > 0 for r in rows)
