"""Stateful streaming error-burst detection — SURVEY §2E.

The streaming twin of ``operators.analysis.error_bursts``: gap-based
sessionization (>gap_s between errors on a node ⇒ new burst),
implemented with ``applyInPandasWithState`` so each node keeps O(1)
state (the open burst) regardless of stream length. Closed bursts are
emitted as soon as a later error proves the gap; the open burst stays
in state across micro-batches.

At scale: state is keyed by node (cluster-size cardinality), Arrow
batches per group, and the timeout hook would evict nodes that go
silent — the custom-stateful-operator pattern for anything Spark's
built-in session windows can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

GAP_S = 300

OUTPUT_SCHEMA = StructType(
    [
        StructField("node", StringType()),
        StructField("n_events", LongType()),
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
    ]
)
# state: (burst_start_s, burst_end_s, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("end_s", LongType()),
        StructField("n", LongType()),
    ]
)


def _update_bursts(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (node,) = key
    if state.exists:
        start_s, end_s, n = state.get
    else:
        start_s = end_s = None
        n = 0

    closed: list[tuple[str, int, int, int]] = []
    times: list[int] = []
    for pdf in pdfs:
        times.extend(int(t) for t in pdf["epoch_s"])
    for t in sorted(times):
        if start_s is None:
            start_s = end_s = t
            n = 1
        elif t - end_s > GAP_S:
            closed.append((node, n, start_s, end_s))
            start_s = end_s = t
            n = 1
        else:
            end_s = max(end_s, t)
            n += 1

    state.update((start_s, end_s, n))
    yield pd.DataFrame(
        closed, columns=["node", "n_events", "start_s", "end_s"]
    )


def streaming_error_bursts(parsed_stream: DataFrame) -> DataFrame:
    """parsed+flagged stream → closed bursts per node."""
    from pyspark.sql import functions as F

    errors = parsed_stream.filter(F.col("is_error")).select(
        "node", F.col("ts").cast("long").alias("epoch_s")
    )
    return errors.groupBy("node").applyInPandasWithState(
        _update_bursts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
