"""Vector Column expressions over array<float>/array<double> columns.

Dot products fold sequentially with F.aggregate (same element order as
DuckDB's list_dot_product, so double results agree bit-for-bit in
practice); everything stays JVM-side — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_long(a: Column, b: Column) -> Column:
    """Integer dot product over array<long> columns — exact, so
    quantized-vector scores need no rounding for oracle parity."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: list[float]) -> Column:
    """Literal double array as ONE parsed expression. The obvious
    ``F.array(*[F.lit(v) ...])`` costs one py4j round-trip per
    element — ~0.3 s of pure driver time per 64-dim plane set,
    re-paid on every query build (measured round 10); a single
    ``expr`` string parses JVM-side to the identical Literal tree.
    ``repr(float)`` round-trips exactly, and the ``D`` suffix makes
    each element a DoubleType literal, same as ``F.lit(float)``."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in values) + ")"
    )
