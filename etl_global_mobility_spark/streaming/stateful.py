"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in windowed
aggregations can't express: arbitrary per-key state carried across
micro-batches. Example operator: a per-user running profile
(event count, decimal-exact value total, first/last event time) that
emits one updated row per user per batch.

State is bounded per key (a few scalars) and keyed by user — at scale
the state store partitions with the shuffle, and a real deployment adds
a timeout (``GroupStateTimeout.ProcessingTimeTimeout``) to expire idle
keys; here the stream is bounded so NoTimeout keeps the example exact.

Spark 4's successor API, ``transformWithStateInPandas``
(StatefulProcessor with typed value/list/map state, timers, and
initial-state handling), is the forward path for new code — it is NOT
used here because its driver-side runner requires ``google.protobuf``,
which this environment lacks (verified: the streaming Python runner
fails at import). The operator contract below ports 1:1 to a
StatefulProcessor (state scalars → getValueState fields).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "count LONG, total_millis LONG, first_us LONG, last_us LONG"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_millis", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into the carried state.

    `value` is accumulated in integer milli-units — integer arithmetic
    is exact and order-independent, so replays and the batch oracle
    agree bit-for-bit (a float sum here would depend on row order).
    """
    (user_id,) = key
    if state.exists:
        count, total_millis, first_us, last_us = state.get
    else:
        count, total_millis, first_us, last_us = 0, 0, None, None

    import numpy as np

    for pdf in pdfs:
        count += len(pdf)
        # floor(v*1000 + 0.5): every step is a single IEEE op, so any
        # engine computes the identical integer (numpy .round() would
        # use half-even and disagree with SQL round()).
        total_millis += int(
            np.floor(pdf["value"].astype("float64").mul(1000).add(0.5)).sum()
        )
        ts_us = pdf["ts_us"].astype("int64").tolist()
        lo, hi = min(ts_us), max(ts_us)
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)

    state.update((count, total_millis, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [count],
            "total_value_millis": [total_millis],
            "first_us": [first_us],
            "last_us": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events (with a ``ts_us`` LONG column: µs since epoch, computed
    Spark-side via ``unix_micros``) → per-user stateful profile.

    Taking the epoch integer as a column — rather than decoding pandas
    datetime64 in the UDF — keeps the state math integer end-to-end and
    independent of the pandas/Arrow timestamp unit of the batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
