"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

Spark's built-in ``session_window`` covers standard session aggregation
(operators/windows.py); THIS module demonstrates the escape hatch for
session semantics the built-in cannot express — custom emission policy,
arbitrary per-session accumulators, per-group business rules — using
``applyInPandasWithState`` (Arrow-batched per-group state, RocksDB-backed
via the session's state-store provider).

Semantics (chosen to be differentially testable against the batch twin):
one open session per user in state; events join the session while the gap
to the previous event is < ``gap``; a session CLOSES either

- in-batch, when a later event for the same user exceeds the gap
  (emitted immediately), or
- by EVENT-TIME TIMEOUT, when the watermark passes session_end
  (= last event + gap) — the watermark is the proof no in-gap event can
  still arrive, the same closure rule the built-in uses.

Cross-batch correctness assumes per-user event-time order across batches
(in-batch order is irrelevant — each batch sorts). An out-of-order event
WITHIN the watermark but in an earlier batch than its neighbors can split
a session the built-in would merge; the built-in session_window handles
that case with window-merge state, which is exactly why it remains the
default and this operator is the *custom-policy* path (SURVEY.md §2.8).

Value accumulation is scaled-int64 (value × 10⁴, the DECIMAL(18,4)
contract from functions.dsum) so sums are exact, order-independent, and
bit-identical to the batch twin — a float accumulator would drift by
partition order and break the differential. Null metrics contribute 0 (the
P5 fill contract, cleaning.clean_events); an all-null session therefore
reports total_value 0.0 where bare SQL ``SUM`` would report NULL.

No reference analogue (its streaming agg is windowed only,
spark/app.py:163-181); extension surface per BASELINE.json.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # imported lazily inside the worker otherwise
    import pandas as pd

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# open session accumulator: micros timestamps + scaled-int value sum
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)

_SCALE = 10_000  # DECIMAL(18,4) contract — see functions.dsum


def _scaled_int64(series) -> "pd.Series":
    """double → scaled int64 with EXACTLY the semantics of Spark's
    ``CAST(x AS DECIMAL(18,4))`` (functions.dsum): round the double's
    exact binary expansion HALF_UP at scale 4, nulls → 0.

    A pandas ``(x * 10000).round()`` is NOT that contract twice over —
    the float multiply can land a 1-ulp step across the .5 boundary the
    exact expansion sits under, and ``.round()`` ties to even where the
    decimal cast ties up. ``Decimal(float)`` takes the exact binary
    value, so this matches the JVM cast bit-for-bit.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd  # noqa: F811 — worker-side import

    one = Decimal(1)

    def conv(x) -> int:
        if x is None or x != x:  # NaN-safe null check
            return 0
        return int(
            Decimal(x).scaleb(4).quantize(one, rounding=ROUND_HALF_UP)
        )

    return series.map(conv).astype("int64")


def sessionize_stream(
    df: DataFrame,
    *,
    gap_seconds: int = 7200,
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user custom sessionizer over a stream; output schema matches the
    batch twin :func:`..windows.session_agg` (session_end = last + gap)."""
    import pandas as pd  # noqa: F811 — worker-side import

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def _emit(uid: int, start: int, last: int, n: int, total: int) -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "user_id": [uid],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last + gap_us, unit="us")],
                "total_value": [total / _SCALE],
                "n_events": [n],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        uid = key[0]
        if state.hasTimedOut:
            # watermark passed session_end: no in-gap event can arrive
            start, last, n, total = state.get
            state.remove()
            yield _emit(uid, start, last, n, total)
            return
        batch = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = batch[ts_col].astype("datetime64[us]").astype("int64")
        vals = _scaled_int64(batch[value_col])  # nulls contribute 0
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = -1
            n = total = 0
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if start < 0:
                start, last, n, total = t, t, 1, v
            elif t - last >= gap_us:
                yield _emit(uid, start, last, n, total)
                start, last, n, total = t, t, 1, v
            else:
                last, n, total = max(last, t), n + 1, total + v
        state.update((start, last, n, total))
        # event-time timeout at session_end (ms API); must exceed the
        # current watermark — clamp for groups replaying old event time
        end_ms = (last + gap_us) // 1000
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API): running per-user totals
# ---------------------------------------------------------------------------

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_scaled", T.LongType()),
    ]
)


def running_totals_stream(df: DataFrame, *, user_col: str = "user_id") -> DataFrame:
    """Running per-user totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state operator API (typed ValueState handles, state
    schema evolution, timers) that supersedes ``applyInPandasWithState``
    for new stateful operators.

    Semantics: a ValueState per user accumulates (count, scaled-int value
    sum); each micro-batch emits the user's updated running totals. Totals
    are monotone in batch order, so the final emission per user equals the
    batch ``groupBy(user).agg(count, dsum)`` — the differential anchor
    (tests/test_stateful.py). Null values contribute 0 (the P5 fill
    contract); the scaled-int64 accumulator keeps sums exact and
    order-independent like every other decimal-contract aggregate.

    Scale shape: state is 16 bytes per user in the state store (RocksDB
    under the session's provider), input shuffles once on user_id per
    micro-batch — identical runtime profile to the built-in streaming agg
    this re-implements, which is exactly why it's the API-surface demo:
    the value of transformWithState is custom policy (TTL, timers,
    multi-state) at built-in cost.

    Runtime dependency: transformWithState's Python worker speaks a
    protobuf state-server protocol — ``google.protobuf`` must be
    installed (absent in this container, like the Kafka connector). The
    construct is testable everywhere; the end-to-end differential test is
    env-gated on the import (tests/test_stateful.py), the same policy as
    test_kafka_integration.py.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # noqa: F811 — worker-side import

            n = 0
            scaled = 0
            for pdf in rows:
                n += int(len(pdf))
                scaled += int(_scaled_int64(pdf["value"]).sum())
            if self._totals.exists():
                prev_n, prev_scaled = self._totals.get()
                n += int(prev_n)
                scaled += int(prev_scaled)
            self._totals.update((n, scaled))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [scaled / _SCALE],
                }
            )

        def close(self) -> None:
            pass

    return (
        df.select(user_col, "value")
        .groupBy(user_col)
        .transformWithStateInPandas(
            _RunningTotals(),
            RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
