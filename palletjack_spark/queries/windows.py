"""Window functions + sorts/limits (SURVEY §2.2 Q40-Q46).

All window orderings carry a unique tiebreak key so ranking is total and
results hash-match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t

_EVENTS_US = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,"
    " value, props FROM events)"
)


@query(
    "q40_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions [host]."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q41_lag_lead",
    oracle=f"""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_type) OVER w AS first_type
    FROM {_EVENTS_US}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead/first [host]."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_type").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_type"),
    )


@query(
    "q42_moving_agg",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_sum,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_n
    FROM {_EVENTS_US}
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving frame aggregates [host] — decimal-exact so sliding-sum
    implementation differences between engines can't leak into values."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("moving_sum"),
        F.count("*").over(w).alias("frame_n"),
    )


@query(
    "q43_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group [host]: rank window + filter — Spark pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so no full
    per-group materialization happens at scale."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "q45_multikey_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
    LIMIT 50
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with null ordering [host]; LIMIT makes the ordering
    observable under the order-insensitive hash."""
    return (
        t(spark, sf_dir, "customer")
        .orderBy(
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_mktsegment").asc(),
            F.col("c_custkey").asc(),
        )
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .limit(50)
    )


@query(
    "q46_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k [host]: TakeOrderedAndProject — per-partition heaps then
    a k-row merge on the driver, no global sort even at 100 TB."""
    return (
        t(spark, sf_dir, "lineitem")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    )


@query(
    "q44_dist_windows",
    oracle="""
    SELECT o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd,
           ntile(4)       OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions [host]: percent_rank / cume_dist /
    ntile over a total order (unique o_orderkey tiebreak, so every engine
    ranks identically).  percent_rank = (rank-1)/(n-1) is a ratio of exact
    integers — bit-identical doubles across engines."""
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
    )
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "q42b_range_time_window",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_10m,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
             AS n_10m
    FROM {_EVENTS_US}
    """,
)
def q42b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE frame aggregates (Q42b): per user, the rolling
    10-minute sum/count over a RANGE frame keyed on epoch microseconds —
    the batch-side sibling of the Q71 sliding stream window, and the
    frame type ROWS can't express when events are irregularly spaced.
    Both engines order on the identical int64 microsecond key, so frame
    membership (including ties) is bit-identical; sums are decimal-exact
    per the registry discipline."""
    # ts is TIMESTAMP_NTZ (arrow-staged events); the tuned session pins
    # UTC, so the cast to TIMESTAMP is instant-preserving and unix_micros
    # equals DuckDB's epoch_us on the same wall-clock value
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_10m"),
        F.count("*").over(w).alias("n_10m"),
    )


@query(
    "q42c_ewma_fold",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(FLOOR(value * 1000) AS BIGINT) AS x
      FROM events),
    g AS (
      SELECT user_id,
             list(x ORDER BY ts_us, event_id) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM e GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(xs[1] AS BIGINT) AS first_milli,
           CAST(list_reduce(xs,
                (acc, x) -> (205 * x + 819 * acc) // 1024) AS BIGINT)
             AS ewma_milli
    FROM g
    """,
)
def q42c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA as an exact-integer fold (Q42c): per-user exponentially
    weighted moving average of value — the recurrence
    ``ewma' = α·x + (1−α)·ewma`` with α = 205/1024, computed as the
    integer fold ``(205·x + 819·acc) div 1024`` over the time-ordered
    stream.  A recurrence has no windowed-aggregate form (each state
    depends on ALL predecessors), so this is the pattern for running
    any per-key linear state machine WITHOUT a Python UDF: pack the
    key's events into a deterministically ordered array and fold with
    a JVM-side higher-order ``aggregate`` lambda.

    Determinism: value milli-quantized (FLOOR), fold arithmetic is
    exact integer truncating division, and BOTH engines fold the
    identically sorted list left-to-right — bit-identical at any
    parallelism.  Scale shape: ONE exchange on user_id; the per-user
    array is bounded by events-per-key (the q101/q117 assumption —
    keys with unbounded streams chunk by epoch first); the fold itself
    is codegen'd, zero Python.  Q76 is the streaming sibling
    (applyInPandasWithState); this is the batch backfill."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("x"),
    )
    g = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_us", "event_id", "x"))
            ).alias("evs"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            "n_events",
            F.expr("transform(evs, s -> s.x)").alias("xs"),
        )
    )
    return g.select(
        "user_id",
        "n_events",
        F.expr("xs[0]").cast("long").alias("first_milli"),
        F.expr(
            "aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
            " (acc, x) -> (205 * x + 819 * acc) div 1024)"
        )
        .cast("long")
        .alias("ewma_milli"),
    )
