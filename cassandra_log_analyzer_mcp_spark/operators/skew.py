"""Skew-mitigation helpers.

AQE's skew-join splitting handles join-side skew automatically, but a
heavily-skewed AGGREGATION key (one node spewing 90% of the errors, a
hot user_id) still funnels one reducer. ``salted_agg`` is the standard
fix: spray each key across N salt buckets for a partial aggregate, then
combine partials — two small shuffles instead of one hot one. Results
are exactly equal for any commutative-mergeable aggregate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge expression per partial-agg column, used by the final stage
MERGES: dict[str, Callable[[str], Column]] = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column name → (merge_kind, partial_agg_col),
    e.g. ``{"errors": ("sum", F.sum(F.col("is_error").cast("long")))}``.
    merge_kind ∈ {sum, count, min, max}: how partials combine.
    """
    salt = (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[col.alias(name) for name, (_, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[
            MERGES[kind](name).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed fact-fact join.

    The skewed side gets a salt column, the other side replicates
    n_salts× with every salt value, and the join key becomes
    (key, salt) — a hot key's rows split across n_salts reducers
    instead of funneling one. Output rows are exactly those of the
    plain join (each skewed row meets each matching other row exactly
    once, at its own salt) — proven through the hash gate by
    shipping_priority_salted sharing the plain query's oracle.

    This is the manual fallback when AQE's runtime skew splitting
    can't kick in (first shuffle of a stage, or skew invisible to
    stats); the replication factor costs n_salts× the OTHER side's
    shuffle volume, so keep that side the smaller fact.
    """
    salt = (
        (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    ).cast("int")
    left = skewed.withColumn("_salt_l", salt)
    right = other.withColumn(
        "_salt_r", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        left.join(
            right,
            (F.col(skewed_key) == F.col(other_key))
            & (F.col("_salt_l") == F.col("_salt_r")),
        )
        .drop("_salt_l")
        .drop("_salt_r")
    )
