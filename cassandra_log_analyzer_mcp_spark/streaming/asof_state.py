"""Stateful STREAMING AS-OF JOIN — SURVEY §2E.

The streaming twin of ``operators.analytics.asof_purchase_before_error``
(for each error, the same user's most recent purchase at-or-before it):
``applyInPandasWithState`` keyed by user carries exactly ONE long per
user — the last purchase epoch — across micro-batches, so state is
O(users), never O(events), and an error arriving hours after its
purchase still joins without any replay.

This is the canonical "enrich a stream with the latest-known record"
operator (trade-vs-quote, event-vs-config, error-vs-purchase) that
watermarked stream-stream interval joins can't express when the lookback
is unbounded. Equivalence to the batch as-of holds because the feed
replays in event-time order across batches (early file first) and rows
sort by (epoch, event_id) within each group — the same total order the
batch window uses, so the shared oracle hash-proves the state path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("err_epoch", LongType()),
        StructField("last_purchase_epoch", LongType()),
        StructField("gap_s", LongType()),
    ]
)
#: state: the user's latest purchase epoch (one long — O(users) total)
STATE_SCHEMA = StructType([StructField("last_purchase_epoch", LongType())])


def _update_asof(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last = state.get[0] if state.exists else None

    parts = [p for p in pdfs if len(p)]
    if not parts:
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(
            columns=[
                "event_id",
                "user_id",
                "err_epoch",
                "last_purchase_epoch",
                "gap_s",
            ]
        )
        return
    rows = pd.concat(parts, ignore_index=True)
    rows = rows.sort_values(["epoch", "event_id"])
    out: list[tuple] = []
    for event_id, epoch, is_purchase in zip(
        rows["event_id"], rows["epoch"], rows["is_purchase"]
    ):
        if is_purchase:
            last = int(epoch)
        else:
            out.append(
                (
                    int(event_id),
                    int(user_id),
                    int(epoch),
                    last,
                    None if last is None else int(epoch) - last,
                )
            )
    if last is not None:
        state.update((last,))
    yield pd.DataFrame(
        out,
        columns=[
            "event_id",
            "user_id",
            "err_epoch",
            "last_purchase_epoch",
            "gap_s",
        ],
    )


def streaming_asof(tagged_stream: DataFrame) -> DataFrame:
    """(event_id, user_id, epoch, is_purchase) stream → per-error
    as-of rows, keyed state = one epoch per user."""
    return tagged_stream.groupBy("user_id").applyInPandasWithState(
        _update_asof,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
