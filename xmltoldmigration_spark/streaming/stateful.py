"""Custom stateful streaming operator: sessionization via
`applyInPandasWithState` (SURVEY §2.7 / training-pipeline streaming).

The batch twin (`queries/streamq.py::stream_sessionization`, lag+cumsum
windows) is oracle-checked; this operator computes the SAME sessions
over an unbounded stream with explicit per-user state:

    state per user = (last event epoch, current session id,
                      current session's n_events / first_event)

Each micro-batch's rows are sessionized VECTORIZED inside the group
(sorted epochs -> diff -> gap>30min -> cumsum -> groupby agg; no
per-event Python loop), seeded from the carried state so sessions span
micro-batches.  Output mode "update": every batch emits the latest
aggregate for each session it touched; downstream consumers keep the
last row per (user_id, session_id) — within a session n_events only
grows and first_event only shrinks, so (max, min) converges to the
batch result.

Scale notes: state is O(active users) and keyed by the shuffle hash of
user_id — the standard Structured Streaming state-store shape; skewed
hot users cost one group each, and the vectorized inner path keeps the
per-batch work linear in batch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_GAP_S = 1800

OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, first_event bigint"
)
STATE_SCHEMA = (
    "last_epoch bigint, session_id bigint, n_events bigint, first_event bigint"
)


def sessionize_stream(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """events stream -> per-session aggregates (update semantics).

    The group function is a closure (cloudpickled by value) so executor
    python workers need no importable copy of this package — the same
    worker-bootstrap pattern as kg/parse.py.
    """

    def sessionize_group(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        user_id = key[0]
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        # truncate to whole seconds regardless of the incoming unit
        # (ns/us), matching the batch twin's unix_timestamp() semantics
        epochs = rows["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        event_ids = rows["event_id"].to_numpy()

        if state.exists:
            last_epoch, sid, cur_n, cur_first = state.get
        else:
            last_epoch, sid, cur_n, cur_first = None, 0, 0, None

        prev = np.empty_like(epochs)
        prev[1:] = epochs[:-1]
        prev[0] = last_epoch if last_epoch is not None else np.iinfo("int64").min
        new_session = (epochs - prev) > gap_s
        if last_epoch is None:
            new_session[0] = True
        sids = sid + np.cumsum(new_session)

        frame = pd.DataFrame({"session_id": sids, "event_id": event_ids})
        agg = frame.groupby("session_id", sort=True).agg(
            n=("event_id", "size"), first=("event_id", "min")
        )
        # fold the carried open session into its continuation (same sid)
        out = []
        for s, row in agg.iterrows():
            n = int(row["n"])
            first = int(row["first"])
            if s == sid and cur_n:
                n += cur_n
                first = min(first, int(cur_first))
            out.append((user_id, int(s), n, first))
        last = out[-1]
        state.update((int(epochs[-1]), last[1], last[2], last[3]))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "n_events", "first_event"]
        )

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
