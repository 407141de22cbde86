"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only stateful stream op is the keyed upsert sink
(SURVEY §2.10 T3/T4 — everything else is stateless row routing). These
operators extend the streaming lane with the keyed state a training-data
pipeline needs:

* `first_seen_stream` — cross-batch exact deduplication: emit a row the
  first time its content key is seen, drop every later arrival, across
  micro-batch boundaries (state survives in the checkpoint). The
  streaming twin of the batch `dedup_exact` lane.
* `running_totals_stream` — per-key running count/sum emitted every
  micro-batch (update-style progressive aggregate).

Scale notes: state is per-group and fixed-size (a seen flag / two
numbers), so executor state stores stay O(distinct keys) regardless of
input volume; the grouping shuffle is the same hash partition a batch
groupBy would pay. Arrow moves batches to Python — the per-group pandas
function touches only that group's rows. At 100 TB the seen-set would
get a TTL via GroupStateTimeout so abandoned keys age out of the store;
on unbounded key spaces prefer a bloom-filter pre-pass to keep the state
store bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def first_seen_stream(df: DataFrame, key_col: str) -> DataFrame:
    """Streaming exact dedup: keep only the first-arriving row per key.

    Input may be streaming or batch; rows are grouped on `key_col` (one
    shuffle), and a single boolean of state per key marks it seen. Within
    a micro-batch, the first row of the group's iterator wins (arrival
    order); across batches, the state store wins.
    """
    fields = df.schema.fields
    out_schema = T.StructType(fields)
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def emit_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # already emitted in an earlier batch
        for pdf in pdfs:
            if len(pdf):
                state.update((True,))
                yield pdf.iloc[:1]
                return

    return df.groupBy(key_col).applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_stream(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum): one row per key per micro-batch with
    totals over everything seen so far — the progressive-aggregate shape
    (batch twin: groupBy().agg(count, sum) once all data has arrived)."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def update_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if batch_n:
            yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        update_totals,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
