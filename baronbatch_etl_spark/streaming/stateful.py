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
from pyspark.sql import functions as F
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


# ---------------------------------------------------------------------------
# Streaming funnel: per-user view → click → purchase progression
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = (
    "user_id LONG, stage LONG, t_view_us LONG, t_click_us LONG, "
    "t_purchase_us LONG"
)
FUNNEL_STATE_SCHEMA = "t_view_us LONG, t_click_us LONG, t_purchase_us LONG"

_FUNNEL_STAGES = ("view", "click", "purchase")


def _update_funnel(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    v, c, p = state.get if state.exists else (None, None, None)
    # applyInPandasWithState delivers one GROUP as multiple Arrow
    # chunks (~10k rows each) in arbitrary shuffle order — sorting each
    # chunk independently is NOT a total order. Materialize the whole
    # group first, then sort once, so a user with more events than one
    # chunk per micro-batch still folds in (ts_us, event_id) order.
    # Memory bound: one user's events within one micro-batch.
    chunks = list(pdfs)  # timeout invocations deliver zero chunks
    pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(pdf):
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts, et in zip(pdf["ts_us"], pdf["event_type"]):
            ts = int(ts)
            if v is None:
                if et == "view":
                    v = ts
            elif c is None:
                if et == "click" and ts > v:
                    c = ts
            elif p is None:
                if et == "purchase" and ts > c:
                    p = ts
    state.update((v, c, p))
    stage = sum(t is not None for t in (v, c, p))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "t_view_us": [v],
            "t_click_us": [c],
            "t_purchase_us": [p],
        }
    )


def funnel_progress(events: DataFrame) -> DataFrame:
    """Streaming twin of the w_funnel catalog query: per-user funnel
    stage (0–3) advanced micro-batch by micro-batch with an O(1)
    3-timestamp state in the engine's state store. Within a batch the
    user's events replay in (ts, event_id) order, and every stage
    comparison is the same strict ``ts > previous-stage ts`` the batch
    fold uses — so with in-order admission the final emission per user
    is bit-equal to the batch fold (pinned by
    tests/test_stateful_streaming.py). Cross-batch stragglers follow
    admission-order semantics (an earlier-ts view arriving AFTER a
    click was already rejected cannot resurrect that click) — the
    same no-unbounded-buffering tradeoff every online funnel makes;
    the batch query is the reconciliation path.
    """
    keyed = events.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
