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
