"""Custom stateful streaming operator (E33): applyInPandasWithState.

``running_user_totals``: per-user running event count + value sum
carried across micro-batches in explicit state — the escape hatch for
stateful logic that built-in aggregations can't express (per-key
custom accumulators, decaying counters, CUSUM detectors…).

State is one small tuple per user; the watermark/timeout config bounds
lifetime. Output mode "update": each micro-batch emits the refreshed
totals for the users it saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, v double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream (user_id, value, …) → per-user running totals."""

    def update(key, pdfs, state):
        # self-contained: executors import nothing from ccog_spark
        import pandas as pd

        n, v = state.get if state.exists else (0, 0.0)  # .get is a property
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of ``running_user_totals`` —
    the Spark 4.x arbitrary-stateful API (typed state handles +
    timers, SPARK-49564) that supersedes applyInPandasWithState. Same
    contract and output schema; state is a single ValueState tuple per
    user. Kept alongside the classic operator so both stateful verbs
    stay covered while the ecosystem migrates.

    OPTIONAL DEPENDENCY: the API's Python↔JVM state server speaks
    protobuf — without ``google.protobuf`` the streaming worker
    crashes at run time with an opaque JVM error, so this guard fails
    fast with the actionable message instead (the CI container has no
    protobuf; tests/test_streaming.py importorskips the equality pin
    against the classic operator)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state-server protocol); install protobuf or use "
            "running_user_totals (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        # self-contained: defined in-closure, pickled by value
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tot = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            prev = self._tot.get() if self._tot.exists() else None
            n, v = (int(prev[0]), float(prev[1])) if prev else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._tot.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [v]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
