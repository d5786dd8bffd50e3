"""Custom stateful streaming operator via applyInPandasWithState —
the engine's escape hatch for stateful semantics the built-in
windows/aggregates can't express (prompt: "applyInPandasWithState for
custom stateful operators").

`running_user_stats` keeps an explicit per-user accumulator across
micro-batches (games, value_sum) and emits the updated totals each
time the user appears — the reference's `$inc` upsert
(transformer_loader/main.py:184-190) as true managed streaming state
(fault-tolerant via the checkpoint, bounded via timeouts at scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, games LONG, value_sum DOUBLE"
STATE_SCHEMA = "games LONG, value_sum DOUBLE"


def _update_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    games, value_sum = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        games += len(pdf)
        value_sum += float(pdf["value"].sum())
    state.update((games, value_sum))
    yield pd.DataFrame(
        {"user_id": [key[0]], "games": [games], "value_sum": [value_sum]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (games, value_sum), one row per user per
    micro-batch in which the user appeared; state carried by the
    engine's state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
