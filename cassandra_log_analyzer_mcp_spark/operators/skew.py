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
