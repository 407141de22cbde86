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
* `funnel_stage_stream` — per-user funnel stage machine (strict-order
  view→click→purchase), robust to out-of-order arrival across batches;
  the continuous twin of the batch `events_funnel_conversion` lane.

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


def funnel_stage_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming funnel tracker: per-user stage machine over out-of-order
    events — the continuous twin of the batch ``events_funnel_conversion``
    lane (plans/funnel.py), with identical strict-ordering semantics: a
    user reaches stage N only via a stage-N event strictly after the
    earliest stage-(N−1) event that anchors their funnel.

    Robust to out-of-order arrival ACROSS micro-batches: state keeps the
    minimal stage-anchor evidence — the earliest stage-1 timestamp plus
    the (deduplicated, sorted) stage-2/stage-3 timestamps — and
    recomputes the reachable stage per batch. A late stage-1 event with
    an earlier timestamp can re-anchor the funnel and promote previously
    ineligible stage-2 events; the reached stage is provably monotone
    non-decreasing under re-anchoring (an earlier anchor only widens the
    eligible sets), so ``update``-mode consumers can treat the last
    emission per user as current truth.

    Emits one row per touched user per micro-batch once stage ≥ 1:
    (user, stage_idx, stage, reached_ts_us).

    Scale: state is O(#stage-2 + #stage-3 events per user) — bounded in
    practice by per-user funnel activity; at 100 TB add a watermark and
    a GroupStateTimeout so abandoned users age out, and prune list
    entries older than the watermark once their batch is final. The
    map-side pre-filter to funnel event types shrinks the shuffle to
    funnel traffic only.

    ``ts_col`` must be an integer column (e.g. ``unix_micros(ts)``) —
    Arrow keeps the Python side dtype-stable that way.
    """
    import pyspark.sql.functions as F

    s1, s2, s3 = stages
    src = df.filter(F.col(type_col).isin(*stages)).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("long").alias("ts_us"),
        F.col(type_col).alias("event_type"),
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("stage_idx", T.IntegerType()),
            T.StructField("stage", T.StringType()),
            T.StructField("reached_ts_us", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("t1", T.LongType()),
            T.StructField("t2s", T.ArrayType(T.LongType())),
            T.StructField("t3s", T.ArrayType(T.LongType())),
        ]
    )

    def track(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t1, t2s, t3s = state.get if state.exists else (None, [], [])
        t2s, t3s = list(t2s or []), list(t3s or [])
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            for ts, et in zip(pdf["ts_us"], pdf["event_type"]):
                ts = int(ts)
                if et == s1:
                    t1 = ts if t1 is None else min(t1, ts)
                elif et == s2:
                    t2s.append(ts)
                else:
                    t3s.append(ts)
        if not touched:
            return
        t2s = sorted(set(t2s))
        t3s = sorted(set(t3s))
        state.update((t1, t2s, t3s))
        if t1 is None:
            return  # no stage-1 anchor yet: not in the funnel
        stage_idx, stage, reached = 1, s1, t1
        t2 = next((t for t in t2s if t > t1), None)
        if t2 is not None:
            stage_idx, stage, reached = 2, s2, t2
            t3 = next((t for t in t3s if t > t2), None)
            if t3 is not None:
                stage_idx, stage, reached = 3, s3, t3
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage_idx": [stage_idx],
                "stage": [stage],
                "reached_ts_us": [reached],
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
