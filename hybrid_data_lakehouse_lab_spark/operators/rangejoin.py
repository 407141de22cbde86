"""Binned interval join — the scale-safe form of `point.ts BETWEEN
interval.start AND interval.end`.

Spark plans a pure range predicate (no equi-key) as a broadcast
nested-loop or cartesian join: O(|points| × |intervals|) comparisons and
a single-threaded build side. The standard fix (used by Databricks'
range-join optimization and time-series engines' chunk exclusion) is
BINNING: quantize time into fixed bins, explode each interval to the
bins it covers, and equi-join on the bin id — Catalyst then plans an
ordinary hash join (shuffle or broadcast), and the exact range predicate
filters within the matched bin.

Cost model: |points| rows keep one bin each; intervals replicate by
ceil(duration / bin) rows. Pick `bin_seconds` near the MEDIAN interval
duration: too small explodes the interval side, too large packs
unrelated rows into one bin and shifts work to the post-join filter.
Each (point, interval) match arises from exactly ONE bin (the point's),
so no dedup pass is needed — overlapping intervals yield one row per
overlap by construction.

The reference has no range join (its SQL surface is equi-join only —
SURVEY §2.3); this is an extension operator every event-time analytics
engine needs (sessions × incidents, events × maintenance windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86400,
    extra_on: Column | None = None,
) -> DataFrame:
    """Rows of `points` joined to every interval containing their
    timestamp (half-open: start <= ts < end).

    `extra_on`: optional additional equi/filter condition applied with
    the range predicate (e.g. matching a tenant column).
    """

    def to_bin(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bin_seconds)

    pb = points.withColumn("_bin", to_bin(F.col(ts_col)))
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(to_bin(F.col(start_col)), to_bin(F.col(end_col)))
        ),
    )
    in_range = (F.col(ts_col) >= F.col(start_col)) & (
        F.col(ts_col) < F.col(end_col)
    )
    if extra_on is not None:
        in_range = in_range & extra_on
    return pb.join(ib, "_bin").filter(in_range).drop("_bin")
