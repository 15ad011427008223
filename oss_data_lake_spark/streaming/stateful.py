"""Custom stateful streaming operator via applyInPandasWithState (the
north-star pattern for operators Structured Streaming lacks natively).

Running per-user session/event totals with gap-based session boundaries:
state = (last event ts, sessions so far, events so far) per user; each
micro-batch folds its rows into the state and emits one updated summary row
per user. Cross-batch session continuity is exactly what stateless batch
sessionization cannot do incrementally — this is the streaming twin of
``operators.windows.sessionize`` and the test pins their agreement.

State size: O(users) fixed-width rows — at 100 TB scale the state store
shards by key across executors; no unbounded growth (timestamps, not rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_us long, n_events long, n_sessions long"


def sessionize_stateful(events: DataFrame, gap_s: int = SESSION_GAP_SECONDS) -> DataFrame:
    """events (streaming DF with ts timestamp, user_id, event_id) →
    one running (user_id, n_events, n_sessions) row per user per batch."""

    gap_us = gap_s * 1_000_000

    # nested: shipped to Python workers — must pickle by value
    def fold(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        last_us, n_events, n_sessions = (
            state.get if state.exists else (None, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            us = int(ts.value // 1000)  # pandas ns → µs
            if last_us is None or us - last_us > gap_us:
                n_sessions += 1
            last_us = us
            n_events += 1
        state.update((last_us, n_events, n_sessions))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
