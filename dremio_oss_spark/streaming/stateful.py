"""Custom stateful streaming operator via applyInPandasWithState.

No reference equivalent (Dremio OSS has no stream engine); this is the
engine's escape hatch for stateful logic Spark's built-in windows can't
express (custom sessionization policies, decaying counters, CEP-ish
patterns).

Scale: state lives in the state store partitioned by the grouping key —
same shuffle layout as a batch groupBy.  Each micro-batch hands the
operator (key, Arrow batches, state handle); state must stay O(1) per
key (here: three scalars), never O(events).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
        StructField("first_event_id", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mx", DoubleType()),
        StructField("first_id", LongType()),
        StructField("last_id", LongType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user totals: state is (count, max, first_id, last_id)."""
    if state.exists:
        n, mx, first_id, last_id = state.get
    else:
        n, mx, first_id, last_id = 0, float("-inf"), None, None
    for pdf in batches:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
            ids = pdf["event_id"]
            first_id = int(ids.min()) if first_id is None else min(first_id, int(ids.min()))
            last_id = int(ids.max()) if last_id is None else max(last_id, int(ids.max()))
    state.update((n, mx, first_id, last_id))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "max_value": [mx],
            "first_event_id": [first_id],
            "last_event_id": [last_id],
        }
    )


def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events stream through the custom stateful operator; the
    final update per user equals the batch aggregate (oracle-checked)."""
    import os
    import re

    from .windows import run_to_table, stream_events

    ev = stream_events(spark, sf_dir).select("user_id", "event_id", "value")
    updated = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    tag = re.sub(r"\W", "_", os.path.basename(os.path.normpath(sf_dir)))
    name = f"stateful_{tag}"
    run_to_table(updated, name, "update")
    # update-mode memory sink may hold one row per key per micro-batch;
    # running counts are monotone, so the final state is the row-wise max
    from pyspark.sql import functions as F

    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
            F.min("first_event_id").alias("first_event_id"),
            F.max("last_event_id").alias("last_event_id"),
        )
        .orderBy("user_id")
    )
