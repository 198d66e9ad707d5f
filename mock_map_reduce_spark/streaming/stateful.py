"""Custom stateful streaming operators — applyInPandasWithState.

The reference's generic reduce RPC (SURVEY UD1) generalized to
arbitrary user state over an unbounded stream: each key group keeps a
state tuple across micro-batches; the operator function sees Arrow
batches and the state handle.

Scale notes: state lives in the executor state store (one entry per
active key); ``GroupStateTimeout`` bounds lifetime so the store does
not grow monotonically — at 100 TB/day of events, keys MUST expire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Cumulative (n_events, total_value) per user, updated per micro-batch.

    The stateful twin of ``groupBy(user).agg(count, sum)`` — but
    emitting a running snapshot every batch instead of one final
    answer, the shape used for live per-entity counters.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
