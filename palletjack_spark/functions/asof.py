"""Skew-proof as-of join (last value at-or-before a timestamp).

The one-shuffle formulation (queries/joins.py q26) windows over the raw
join key: correct and single-pass, but a hot key serializes one window
partition and AQE cannot split window skew.  This module is the 100×-scale
variant: **time-bucketed two-phase carry-forward**, the standard fix —

1. rows shuffle on ``(key, time_bucket)`` — a hot key spreads over as many
   partitions as it has active buckets;
2. the within-bucket running last is a window over ``(key, bucket)``;
3. per-``(key, bucket)`` summaries (one row each) get a tiny per-key window
   that computes the carry-in from earlier buckets — the only per-key
   serial step, O(#buckets) rows per key instead of O(#rows);
4. the final value is ``greatest(within-bucket last, carry-in)`` (valid
   because the carried value is itself the event-time of the right row, so
   "latest" == "max").

Shuffle count: one exchange on (key, bucket) shared by both windows via
partial-key reuse + one tiny aggregate exchange on key.  No range-join row
blowup at any skew level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_last_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    bucket: str = "30 days",
) -> DataFrame:
    """For each ``left`` row, the ``value_col`` of the latest ``right`` row
    with the same ``key`` and ``right_ts <= left_ts``.

    ``value_col`` must be ``right_ts`` itself or non-decreasing in it
    (e.g. the timestamp, a date, a monotonically assigned version) — the
    carry combine uses ``greatest``.  Returns ``left`` columns +
    ``asof_<value_col>``.

    ``bucket`` is a SQL interval literal; pick it so a hot key has at most
    a few thousand rows per bucket at the target scale.
    """
    lcols = left.columns
    e = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).alias("tm"),
        F.lit(1).alias("is_event"),
        F.struct(*lcols).alias("payload"),
        F.lit(None).cast(dict(right.dtypes)[value_col]).alias("v"),
    )
    o = right.select(
        F.col(key).alias("k"),
        F.col(right_ts).alias("tm"),
        F.lit(0).alias("is_event"),
        F.lit(None)
        .cast(e.schema["payload"].dataType)
        .alias("payload"),
        F.col(value_col).alias("v"),
    )
    u = e.unionByName(o).withColumn(
        "bkt", F.window("tm", bucket)["start"]
    )
    # ONE shuffle on (k, bkt): both windows below share the partitioning
    wb = Window.partitionBy("k", "bkt").orderBy("tm", "is_event")
    within = u.withColumn(
        "v_run",
        F.last("v", ignorenulls=True).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # per-(k, bkt) summary: ONE row per bucket → the per-key carry window
    # is O(#buckets per key), never O(#rows per key).  Grouped over ALL
    # rows (not just right rows) so buckets containing only left rows still
    # receive their carry-in; max() ignores their null v.
    summary = u.groupBy("k", "bkt").agg(F.max("v").alias("bkt_last"))
    wk = (
        Window.partitionBy("k")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summary.select(
        "k", "bkt", F.max("bkt_last").over(wk).alias("carry_in")
    )
    return (
        within.where(F.col("is_event") == 1)
        .join(carry, ["k", "bkt"], "left")
        .select(
            *[F.col(f"payload.{c}").alias(c) for c in lcols],
            F.greatest("v_run", "carry_in").alias(f"asof_{value_col}"),
        )
    )
