"""Custom stateful streaming operators via ``applyInPandasWithState``.

The windowed operators in :mod:`.windows` cover everything expressible as a
built-in aggregation; these cover per-key state machines the built-ins
can't: streaming first-seen dedup (the streaming twin of the batch exact
dedup, ``operators/dedup.py``) and a running per-key counter.

Scale notes: state is partitioned by the grouping key exactly like any
keyed aggregation — one shuffle on the key, state store per partition.
First-seen state is a single marker per key (bytes, not rows); the counter
is one long per key. Pair with a watermark + timeout when keys churn, or
state grows with key cardinality forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen(
    stream: DataFrame,
    key_col: str = "user_id",
    out_schema: str = "user_id bigint, first_ts timestamp, event_type string",
    ts_col: str = "ts",
    payload_col: str = "event_type",
) -> DataFrame:
    """Emit exactly one row per key: the first event the stream delivers for
    it (streaming exact dedup / user first-touch). State per key is a single
    marker; every later event for the key is dropped without emitting."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(ts_col).iloc[0]
            if first is None or cand[ts_col] < first[ts_col]:
                first = cand
        if first is not None:
            state.update((True,))
            yield pd.DataFrame(
                {
                    key_col: [first[key_col]],
                    "first_ts": [first[ts_col]],
                    payload_col: [first[payload_col]],
                }
            )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, "seen boolean", "append", GroupStateTimeout.NoTimeout
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: duplicates arriving within
    the watermark horizon drop; key state expires as the watermark advances
    — the production default over :func:`first_seen`'s forever-markers when
    duplicates are near-time (replays, at-least-once sources)."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )


def running_counts(
    stream: DataFrame,
    key_col: str = "event_type",
    out_schema: str = "event_type string, n bigint",
) -> DataFrame:
    """Cumulative per-key event count, re-emitted each time the key receives
    data (update-mode state machine — the hand-rolled analog of a running
    aggregation, for pipelines that need custom merge logic beside it)."""

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
        if seen:
            total += seen
            state.update((total,))
            yield pd.DataFrame({key_col: [key[0]], "n": [total]})

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, "n bigint", "update", GroupStateTimeout.NoTimeout
        )
    )
