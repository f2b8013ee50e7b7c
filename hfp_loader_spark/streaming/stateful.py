"""Custom stateful streaming operator via ``applyInPandasWithState``.

The one place the streaming tier genuinely needs arbitrary per-key state
beyond built-in windows: cumulative per-user counters that survive across
micro-batches (running count / sum / max event time), emitting refreshed
totals whenever a batch touches the key.

Scale notes: state lives in the state store keyed by ``user_id`` — memory
is O(distinct keys), not O(events); each micro-batch ships only the
touched groups through Arrow to the Python worker.  With
``trigger(availableNow)`` + ``maxFilesPerTrigger`` a backfill streams the
archive through bounded batches while the state carries totals forward.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_ts", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_ts", StringType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, max_ts = state.get if state.exists else (0, 0.0, "")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # second-precision string: lexicographic order == time order, and
        # the format is stable across engines/batches
        stamps = pdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
        batch_max = stamps.max() if len(stamps) else ""
        if isinstance(batch_max, str) and batch_max > max_ts:
            max_ts = batch_max
    state.update((n, total, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_ts": [max_ts],
        }
    )


def stateful_user_counters(events: DataFrame) -> DataFrame:
    """Running per-user counters over a streaming events frame.

    Each micro-batch emits the refreshed cumulative totals for every user
    it touched; state persists across batches in the state store.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas variant (Spark 4.x arbitrary-state API) ---

DISTINCT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_distinct_types", LongType()),
    ]
)

try:  # the API is new in Spark 4.x; keep the module importable elsewhere
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    # The state-server protocol needs protobuf at RUNTIME (worker side);
    # probe it here so callers can gate cleanly instead of failing
    # mid-query.  applyInPandasWithState (stateful_user_counters) has no
    # such dependency and is the always-available path.
    import importlib.util

    HAS_TRANSFORM_WITH_STATE = (
        importlib.util.find_spec("google.protobuf") is not None
        and importlib.util.find_spec("google.protobuf.descriptor") is not None
    )
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False


class DistinctTypesProcessor(StatefulProcessor):
    """Per-user distinct event-type tracker on the ``transformWithState``
    API: the seen-type set lives in a typed ``ListState`` (the state
    store's native list encoding — no whole-value rewrite per batch, the
    append is incremental), and each batch that touches a user emits the
    refreshed distinct count.

    Chosen over :func:`stateful_user_counters`'s single-value state to
    exercise the OTHER state shape: growing collections with incremental
    appends, which is what dedup-key and seen-set operators need at scale.
    """

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self.seen = handle.getListState("seen_types", "event_type string")

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        seen = {t[0] for t in self.seen.get()}
        for pdf in rows:
            fresh = set(pdf["event_type"].dropna().unique()) - seen
            if fresh:
                self.seen.appendList([(t,) for t in sorted(fresh)])
                seen |= fresh
        yield pd.DataFrame(
            {"user_id": [int(user_id)], "n_distinct_types": [len(seen)]}
        )

    def close(self) -> None:
        pass


def stateful_distinct_types(events: DataFrame) -> DataFrame:
    """Running per-user distinct event-type counts (transformWithState)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=DistinctTypesProcessor(),
        outputStructType=DISTINCT_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
