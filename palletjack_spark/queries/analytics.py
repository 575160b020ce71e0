"""Event-analytics operators (SURVEY §2.2 Q116/Q117/Q120): SCD Type-2
dimension builds, gap-based sessionization, and ordered funnel analysis.

These are the batch time-series shapes a warehouse team runs daily over an
events table; each is a single-shuffle plan at any scale: every window and
the final aggregate partition on ``user_id``, so Spark plans ONE hash
exchange and reuses its partitioning for the downstream stages (verified
in tests/test_plans.py).  Timestamps are compared as int64 epoch
microseconds (``unix_micros`` ≡ DuckDB ``epoch_us``) per the q42b
discipline, with ``event_id`` as the total-order tiebreak so window frames
are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t

#: µs view of events shared by every oracle here (q42b idiom: the tuned
#: session pins UTC so the cast is instant-preserving on both engines)
_E = (
    "(SELECT event_id, user_id, event_type, value,"
    " epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events)"
)


def _ts_us() -> F.Column:
    return F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")


@query(
    "q116_scd2_dimension",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, ts_us, event_id FROM {_E}),
    ordered AS (
      SELECT user_id, event_type, ts_us, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM e),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type)
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
           LEAD(ts_us) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
             AS is_current
    FROM changes
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (Q116): collapse an event stream into
    attribute-version intervals — one row per (user, event_type run) with
    [valid_from, valid_to) validity and an is_current flag, the standard
    slowly-changing-dimension shape every warehouse maintains.

    Gaps-and-islands via two window passes: LAG detects change points,
    LEAD closes each version's interval.  Both windows partition on
    user_id, so the plan carries ONE exchange; at 100 TB the per-user
    partitions are tiny (events per user, not global) and AQE handles the
    long tail.  No UDFs, no driver state."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", _ts_us(), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .drop("prev_type")
    )
    valid_to = F.lead("ts_us").over(w)
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "q117_sessionization",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, value, ts_us FROM {_E}),
    flagged AS (
      SELECT user_id, event_id, value, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                       OR ts_us - LAG(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sessions AS (
      SELECT user_id, value, ts_us,
             CAST(SUM(is_new) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM flagged)
    SELECT user_id, session_seq,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM sessions GROUP BY user_id, session_seq
    """,
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (Q117): split each user's event stream into
    sessions at >30-minute silence gaps (the batch sibling of the Q72
    streaming session window), then aggregate per session.

    Gap flags via LAG, session ids via a running SUM of the flags — both
    windows and the final aggregate cluster on user_id, so rows for one
    session are co-located after the single window exchange and the
    partial (map-side) aggregate collapses each session to one row before
    the final agg's exchange moves anything.  Session values use decimal
    accumulation for order-independent exactness."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value", _ts_us())
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("session_value"),
    )


@query(
    "q120_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, event_type, ts_us FROM {_E}),
    w1 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'signup' THEN ts_us END) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS signup_so_far
      FROM e),
    q1 AS (
      SELECT *,
             CASE WHEN event_type = 'click' AND signup_so_far <= ts_us
                  THEN ts_us END AS qc
      FROM w1),
    w2 AS (
      SELECT *,
             MIN(qc) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS click_so_far
      FROM q1)
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup' THEN ts_us END) AS signup_us,
           MIN(qc) AS click_us,
           MIN(CASE WHEN event_type = 'purchase' AND click_so_far <= ts_us
                    THEN ts_us END) AS purchase_us,
           CASE
             WHEN MIN(CASE WHEN event_type = 'purchase' AND click_so_far <= ts_us
                           THEN ts_us END) IS NOT NULL THEN 3
             WHEN MIN(qc) IS NOT NULL THEN 2
             WHEN MIN(CASE WHEN event_type = 'signup' THEN ts_us END)
                  IS NOT NULL THEN 1
             ELSE 0
           END AS stage_reached
    FROM w2 GROUP BY user_id
    """,
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (Q120): per user, the earliest
    signup → click-after-signup → purchase-after-that-click chain, plus
    the funnel stage reached — the product-analytics query that motivates
    sessionized event stores.

    Ordering is enforced with prefix-window running minima (earliest
    signup/qualified-click seen so far at each row), so "click after
    signup" and "purchase after that click" are exact event-order
    semantics, not same-row approximations.  Two window passes + one
    aggregate, all clustered on user_id: Spark plans a single exchange
    and the final groupBy reuses the window's hash partitioning."""
    e = t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", _ts_us())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    signup_ts = F.when(F.col("event_type") == "signup", F.col("ts_us"))
    w1 = e.withColumn("signup_so_far", F.min(signup_ts).over(w))
    q1 = w1.withColumn(
        "qc",
        F.when(
            (F.col("event_type") == "click")
            & (F.col("signup_so_far") <= F.col("ts_us")),
            F.col("ts_us"),
        ),
    )
    w2 = q1.withColumn("click_so_far", F.min("qc").over(w))
    qp = F.when(
        (F.col("event_type") == "purchase")
        & (F.col("click_so_far") <= F.col("ts_us")),
        F.col("ts_us"),
    )
    agg = w2.groupBy("user_id").agg(
        F.min(signup_ts).alias("signup_us"),
        F.min("qc").alias("click_us"),
        F.min(qp).alias("purchase_us"),
    )
    return agg.select(
        "user_id",
        "signup_us",
        "click_us",
        "purchase_us",
        F.when(F.col("purchase_us").isNotNull(), 3)
        .when(F.col("click_us").isNotNull(), 2)
        .when(F.col("signup_us").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("stage_reached"),
    )


@query(
    "q116b_temporal_join",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, ts_us, event_id FROM {_E}),
    ordered AS (
      SELECT user_id, event_type, ts_us, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
      FROM e),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type),
    dim AS (
      SELECT user_id, event_type AS dim_state,
             ts_us AS valid_from_us,
             COALESCE(LEAD(ts_us) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id),
               9223372036854775807) AS valid_to_us
      FROM changes),
    facts AS (
      SELECT user_id, event_id, value, ts_us FROM {_E}
      WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, f.ts_us, d.dim_state,
           CAST(f.value AS DOUBLE) AS value
    FROM facts f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts_us >= d.valid_from_us AND f.ts_us < d.valid_to_us
    """,
)
def q116b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-time) dimension join (Q116b): enrich fact rows
    with the dimension version valid AT THE FACT'S TIMESTAMP — the join
    every SCD2 warehouse runs, and the lookup that makes Q116's interval
    build useful.  Here the facts are purchase events and the dimension
    is the user's state history from Q116's gaps-and-islands build.

    Join shape at scale: the equality key (user_id) drives a normal hash
    join — the validity-interval predicate is a RESIDUAL filter evaluated
    inside the matched key group, never a nested-loop over the table (the
    plan is SortMergeJoin/ShuffledHashJoin with a join condition, not
    BroadcastNestedLoop — asserted in tests/test_plans.py).  Intervals
    are half-open [from, to) and partition each user's timeline, so every
    fact matches exactly one version — no row explosion."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", _ts_us(), "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("dim_state"),
        F.col("ts_us").alias("valid_from_us"),
        F.coalesce(
            F.lead("ts_us").over(w), F.lit(9223372036854775807)
        ).alias("valid_to_us"),
    )
    facts = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", "ts_us"
    )
    return facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("ts_us") >= F.col("valid_from_us"))
        & (F.col("ts_us") < F.col("valid_to_us")),
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "dim_state",
        F.col("value").cast("double").alias("value"),
    )
