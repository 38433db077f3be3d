"""Salted aggregation equals the direct aggregation, including on a
pathologically skewed key distribution."""

from pyspark.sql import functions as F

from cassandra_log_analyzer_mcp_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    # 90% of rows on one key
    df = spark.range(0, 100000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("key"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = {
        r.key: (r.total, r.n, r.vmax)
        for r in salted_agg(
            df,
            ["key"],
            {
                "total": ("sum", F.sum("v")),
                "n": ("count", F.count("*")),
                "vmax": ("max", F.max("v")),
            },
        ).collect()
    }
    want = {
        r.key: (r.total, r.n, r.vmax)
        for r in df.groupBy("key")
        .agg(
            F.sum("v").alias("total"),
            F.count("*").alias("n"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]
        assert got[k][2] == want[k][2]
        assert abs(got[k][0] - want[k][0]) < 1e-6 * max(1.0, abs(want[k][0]))
