"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §1.3: "no streaming"), but the
engine's gap-sessionization and trailing-window features generalize to
streams; this module provides the two idiomatic shapes:

- ``streaming_session_stats`` — session windows via the built-in
  ``F.session_window`` (gap-based, watermark-driven state eviction): the
  streaming twin of ``operators.windows.with_session_id``. Pure SQL
  operators, works with any sink/trigger.
- ``streaming_pit_features`` — custom per-entity stateful features via
  ``applyInPandasWithState``: running event count, last-event gap, and
  backfilled last non-null value per entity — the stateful-cursor analogue
  of the batch PIT kernel, with GroupStateTimeout-based state.

Tested with a file source + ``Trigger.AvailableNow`` over the same parquet
tables the batch path reads (tests/test_streaming.py), so batch and stream
results are comparable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_session_stats(
    events: DataFrame,
    entity: str,
    ts: str,
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per (entity, session window): event count + value sum. Late rows
    beyond the watermark are dropped (the batch engine instead enforces
    correctness via the as-of inequality; streams need watermarks)."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(entity), F.session_window(F.col(ts), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            entity,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_pit_features(
    events: DataFrame,
    entity: str,
    ts: str,
    value_col: str,
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per entity keeps
    (event_count, last_ts_us, last_nonnull_value) across micro-batches and
    emits per-row running features — the streaming analogue of the batch
    kernel's sessionize/backfill state."""
    # derive key/time field types from the input schema (string entity keys
    # and timestamp_ntz event times must round-trip unchanged)
    ent_type = events.schema[entity].dataType.simpleString()
    ts_type = events.schema[ts].dataType.simpleString()
    out_schema = (
        f"{entity} {ent_type}, {ts} {ts_type}, {value_col} double, "
        "running_count long, gap_sec double, value_bf double"
    )
    state_schema = "count long, last_ts long, last_val double"

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            count, last_ts, last_val = state.get
        else:
            count, last_ts, last_val = 0, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts, kind="stable")
            t = pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
            x = pdf[value_col].to_numpy(dtype=float)
            n = len(pdf)
            prev = np.concatenate([[last_ts if last_ts is not None else -1], t[:-1]])
            gap = np.where(prev >= 0, (t - prev) / 1e6, np.nan)
            bf = pd.Series(x).ffill().to_numpy()
            if last_val is not None and not pd.isna(last_val):
                bf = np.where(np.isnan(bf), last_val, bf)
            out = pd.DataFrame(
                {
                    entity: pdf[entity],
                    ts: pdf[ts],
                    value_col: pdf[value_col],
                    "running_count": count + np.arange(1, n + 1),
                    "gap_sec": gap,
                    "value_bf": bf,
                }
            )
            count += n
            last_ts = int(t[-1])
            nn = np.flatnonzero(~np.isnan(x))
            if len(nn):
                last_val = float(x[nn[-1]])
            yield out
        state.update((count, last_ts, last_val))

    return events.groupBy(entity).applyInPandasWithState(
        fn, out_schema, state_schema, "Update", GroupStateTimeout.NoTimeout
    )
