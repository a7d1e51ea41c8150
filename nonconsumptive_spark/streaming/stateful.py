"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful streaming at all (SURVEY §2.9 — its
"streams" are batch generator pipelines); this is the extension surface
for operators whose semantics built-in windowed aggregation cannot
express: arbitrary per-key state carried across micro-batches.

The demonstrator keeps, per user, a running profile that includes a
*distinct-set* accumulator (event types seen so far) — exactly the kind
of state ``groupBy().agg()`` in update mode cannot maintain incrementally
without re-scanning: the distinct set must persist between triggers.

Scale notes: state lives in the state store keyed by ``user_id`` — the
stream shuffles once on the grouping key and each task owns its key
range's state; no driver involvement, no global barrier.  The pandas
function receives an *iterator* of batches per key so a hot key never
materializes all its rows at once.  State size is O(distinct event types)
per user — bounded, watermark/timeout-evictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "n_types long, last_ts_micros long"
)
STATE_SCHEMA = "n long, total double, types array<string>, last_micros long"


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value total, distinct event-type
    count, last event time) maintained across micro-batches.

    Emits one updated profile row per user per trigger in which that user
    appeared (output mode ``update``).  The final emission per user equals
    the batch ``groupBy(user_id).agg(...)`` over the same data — asserted
    in tests/test_streaming.py.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update_profile(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, total, types, last_micros = state.get
            types = set(types)
        else:
            n, total, types, last_micros = 0, 0.0, set(), None
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            types.update(pdf["event_type"].tolist())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                micros = batch_max.value // 1000  # ns -> us
                if last_micros is None or micros > last_micros:
                    last_micros = micros
        state.update((n, total, sorted(types), last_micros))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "total_value": total,
                    "n_types": len(types),
                    "last_ts_micros": last_micros,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_profile,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
