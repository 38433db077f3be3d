"""Driver-literal DataFrames without the Python-worker round trip.

``spark.createDataFrame(list_of_tuples, ddl)`` parallelizes pickled
rows through a Python worker: every action over the frame (including
a broadcast build) schedules a PythonRDD task, pays the JVM↔Python
boundary, and — measured in round 11 — intermittently stalls for
seconds when the first such task follows a worker-heavy streaming
query (the executor sat in ``BasePythonRunner$ReaderInputStream.read``
for ~6 s while a 4-row dimension frame was written). The guide's §4
("eliminate the JVM↔Python boundary") and §6 ("Arrow for driver
transfers") both point the same way: ship the literal rows as ONE
Arrow batch and let the plan be a pure-JVM ``LocalTableScan``.

Measured (local[8], warm session): 5 noop writes of a 2-row frame,
list path 3.21 s vs Arrow path 0.52 s — and the Arrow path never
touches a Python worker, so the stall class is gone entirely.

Used by every operator/bridge that lands a driver-side rollup
(bounded-state streaming folds, probe tables, tiny dimensions). At
100 TB these frames stay rollup-sized by design — the helper is about
the boundary, not the volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, ddl)`` via one Arrow batch.

    ``rows`` is a sequence of position-matched tuples (the same
    contract as createDataFrame with a DDL string); the result is a
    ``LocalTableScan`` — no PythonRDD, no pickled rows, no Python
    worker at execution or broadcast time. Falls back to the classic
    path if Arrow conversion rejects a value (type fidelity beats
    speed: the fallback is correct, just slower).
    """
    rows = [tuple(r) for r in rows]
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(StructType.fromDDL(schema))
        cols = (
            list(zip(*rows)) if rows else [[] for _ in arrow_schema]
        )
        table = pa.Table.from_arrays(
            [
                pa.array(list(col), type=field.type)
                for col, field in zip(cols, arrow_schema)
            ],
            schema=arrow_schema,
        )
        return spark.createDataFrame(table)
    except Exception:
        return spark.createDataFrame(rows, schema)
