"""Joins (SURVEY §2.2 Q20-Q26).

Scale notes: dimension sides (region/nation/part/customer at TPC-H ratios)
are broadcast explicitly (Q23) or by AQE; fact-fact joins shuffle on the
join key and rely on AQE skew-join splitting.  The as-of join (Q26) is the
one-pass union+window formulation — a single shuffle on the key, no
range-join blowup — the idiomatic Spark shape for "latest record at or
before t" at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t

# events.ts is timestamp[ns] in parquet; Spark truncates to µs, so oracles
# must compare at µs too.
_EVENTS_US = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,"
    " value, props FROM events)"
)


@query(
    "q20_inner_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           l.l_extendedprice * (1 - l.l_discount) AS disc_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join [host] — shuffle join on the fact key; AQE picks
    broadcast when the filtered side is small."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


@query(
    "q21_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join [host]: customers keep a row even with no orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@query(
    "q22_semi_anti_join",
    oracle="""
    SELECT c_custkey, 'has_orders' AS kind FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS kind FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi + left anti joins [host]."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("kind", F.lit("has_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("kind", F.lit("no_orders"))
    )
    return semi.unionByName(anti)


@query(
    "q23_broadcast_join",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 30
    GROUP BY p.p_brand
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join [ref R8 analogue]: the dimension is shipped to every
    executor once — like the reference's in-memory index, small metadata is
    kept hot instead of re-read.  tests/test_plans.py asserts
    BroadcastHashJoin in the physical plan."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").where(F.col("p_size") >= 30)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
            F.count("*").alias("cnt"),
        )
    )


@query(
    "q24_cross_join",
    oracle="""
    SELECT r.r_name, n.n_name,
           CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS same_region
    FROM region r CROSS JOIN nation n
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join [host] — only ever between tiny dimensions."""
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1)
        .otherwise(0)
        .alias("same_region"),
    )


@query(
    "q25_range_join",
    oracle="""
    SELECT b.band, COUNT(*) AS cnt,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM orders o
    JOIN (VALUES ('low', 0.0, 50000.0),
                 ('mid', 50000.0, 150000.0),
                 ('high', 150000.0, 1000000000.0)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join [host]: BroadcastNestedLoop against a tiny banding
    table — the scalable shape for value-range classification."""
    o = t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q27_salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join [north-star scale]: manual skew mitigation for when one
    key dominates a shuffle join (a hot user, a null-ish default key).

    The fact side gets a deterministic per-row salt (hash of the row, mod
    S); the dimension side is exploded ×S; the join key becomes
    (key, salt), so a hot key's rows spread over S reducers instead of one.
    Results are identical to the unsalted join — the oracle is the plain
    SQL join.  (AQE skew-join does this adaptively for sort-merge joins;
    salting remains the portable fallback and works for aggregations too.)
    """
    S = 8
    o = t(spark, sf_dir, "orders").withColumn(
        "_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(S)).cast("int")
    )
    c = (
        t(spark, sf_dir, "customer")
        .withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(i) for i in range(S)]).cast("array<int>")),
        )
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o._salt == c._salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q28_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join [north-star scale]: both fact tables are
    written bucketed (+sorted) on the join key, so the sort-merge join
    reads matching buckets directly — NO exchange on either side
    (asserted in tests/test_plans.py).  The 100 TB pattern: pay the
    bucketing shuffle once at ingest, amortize it over every later join.
    """
    import os
    import tempfile

    from palletjack_spark.queries.scans import (
        _src_sig,
        _stage_fresh,
        _stage_mark,
    )

    n_buckets = 8
    key = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    # Bucket count + sort discipline are encoded in the temp path so a future
    # change to either constant can never silently re-register stale files
    # written under the old layout (the DDL below must describe the on-disk
    # layout exactly or the exchange-free SMJ returns wrong results).
    wh = os.path.join(
        tempfile.gettempdir(), f"pjspark_{key}_buckets{n_buckets}_sortkey"
    )
    names = {}
    for tbl, bkey in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"pj_bkt_{key}_b{n_buckets}_{tbl}"
        names[tbl] = name
        # source-signature invalidation (round-14 sweep, the q92g round-8
        # lesson): a regenerated source table must not keep serving the
        # stale bucketed copy — drop both the catalog entry and the files
        sig = _src_sig(sf_dir, tbl)
        path = os.path.join(wh, tbl)
        marker = os.path.join(path, "_PJ_SRC_SIG")
        if not _stage_fresh(marker, sig):
            import shutil

            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(path, ignore_errors=True)
        if not spark.catalog.tableExists(name):
            if os.path.exists(os.path.join(path, "_SUCCESS")):
                # files survive across sessions; only the catalog entry is
                # per-session — re-register the existing bucketed layout
                # instead of re-shuffling the data ("pay the bucketing
                # once at ingest" made literal)
                ddl = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in t(spark, sf_dir, tbl).schema.fields
                )
                spark.sql(
                    f"CREATE TABLE {name} ({ddl}) USING parquet "
                    f"CLUSTERED BY ({bkey}) SORTED BY ({bkey}) "
                    f"INTO {n_buckets} BUCKETS "
                    f"LOCATION '{path}'"
                )
            else:
                (
                    t(spark, sf_dir, tbl)
                    .write.bucketBy(n_buckets, bkey)
                    .sortBy(bkey)
                    .option("path", path)
                    .mode("overwrite")
                    .saveAsTable(name)
                )
                _stage_mark(marker, sig)
    li = spark.table(names["lineitem"])
    o = spark.table(names["orders"])
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q26_asof_join",
    oracle=f"""
    SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_date
    FROM {_EVENTS_US} e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id, e.user_id
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join [north-star, time-series]: for each event, the most recent
    order of that user at-or-before the event time.

    One-pass formulation: union events and orders tagged by kind, window
    over (key) ordered by (time, kind) with last(order_date ignorenulls) —
    a single shuffle on user_id, no range-join row blowup.  Orders sort
    before events at equal timestamps, giving <= semantics.
    """
    e = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("tm"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("o_date"),
    )
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("tm"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("o_date"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("tm", "is_event", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.unionByName(o)
        .withColumn("last_order_date", F.last("o_date", ignorenulls=True).over(w))
        .where(F.col("is_event") == 1)
        .select(
            "event_id", F.col("k").alias("user_id"), "last_order_date"
        )
    )


@query(
    "q26b_asof_bucketed",
    oracle=f"""
    SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_date
    FROM {_EVENTS_US} e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    GROUP BY e.event_id, e.user_id
    """,
)
def q26b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, skew-proof variant [north-star scale]: same semantics as
    q26 but via the time-bucketed two-phase carry-forward
    (functions/asof.py) — a hot user spreads over (user, bucket) partitions
    instead of serializing one window task; the only per-key serial step is
    O(#buckets).  This is the plan to ship at 100 TB when keys are skewed;
    q26 remains the minimal one-shuffle shape for well-distributed keys."""
    from palletjack_spark.functions.asof import asof_last_bucketed

    e = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("o_date")
    )
    return asof_last_bucketed(
        e.withColumnRenamed("user_id", "k_user"),
        o.withColumnRenamed("o_custkey", "k_user"),
        key="k_user",
        left_ts="ts",
        right_ts="o_date",
        value_col="o_date",
        bucket="90 days",
    ).select(
        "event_id",
        F.col("k_user").alias("user_id"),
        F.col("asof_o_date").alias("last_order_date"),
    )


@query(
    "q29_star_join",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (TPC-H Q5 shape) [host]: the 6-table local-supplier-volume
    query.  Scale shape: region/nation/supplier broadcast (fixed-size or
    SF-sublinear dims), but CUSTOMER is NOT hinted — it grows linearly with
    the fact (~1.5 TB at TPC-H-proportional 100 TB) and a forced broadcast
    would OOM every executor; AQE picks broadcast at small SF and a shuffle
    join at scale on actual runtime sizes.  So the worst-case plan is two
    fact-side shuffles (lineitem ⋈ orders on orderkey, then ⋈ customer on
    custkey) and every genuinely small dimension ships whole.  Exercises
    the one fixture table (supplier) nothing else touches."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q29b_tpch_q3_shape",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q29b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customer ⋈
    date-filtered orders ⋈ lineitem → revenue per order → global top 10.
    Scale shape: both date/segment filters push to the scans; the
    filtered customer side broadcasts; the final LIMIT plans as
    TakeOrderedAndProject (per-partition heaps, no global sort).  The
    spec's revenue-DESC order gains an l_orderkey tiebreak so the top-10
    cut is total and engine-independent."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1998-03-15"
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q29c_tpch_q18_shape",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q29c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING-subquery
    pattern — qualifying order keys come from a pre-aggregation of the
    FACT table itself, then rejoin customer/orders/lineitem for the
    report.  Scale shape: the qualifying-keys aggregate partial-combines
    map-side and its (rare) survivors broadcast into a semi-join, so the
    fact table streams once unfiltered and once semi-filtered — never
    shuffled against itself."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q29d_tpch_q13_shape",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q29d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): the
    aggregate-of-aggregate over a LEFT OUTER join — customers with zero
    orders must survive into the c_count=0 bucket, which an inner join
    silently drops.  Scale shape: the outer join shuffles both sides on
    the customer key once; the first aggregate reuses that partitioning
    (no extra exchange), and the second aggregates a c_count-keyed table
    whose cardinality is tiny (distinct order counts)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def _bloom_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@query(
    "q20b_runtime_bloom_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    """,
)
def q20b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (Q20b): when a selective dim
    filter can't broadcast, Catalyst builds a Bloom filter over the dim
    keys at RUNTIME and injects ``might_contain`` into the fact scan —
    at 100 TB this turns a full-fact shuffle join into a pre-filtered
    one, the same asymmetric-join economics as Q102's broadcast grams
    but decided by the optimizer.  The thresholds are lowered here so
    the injection fires at fixture scale (the plan assertion lives in
    tests/test_plans.py); production leaves the defaults."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # materialize under the scoped confs — the runtime filter is
        # injected at planning time of THIS action.  localCheckpoint
        # (eager) pins the computed partitions executor-side, so the
        # result never round-trips through the driver (round-5 verdict
        # item 7: the previous collect + createDataFrame did).
        out = _bloom_join_df(spark, sf_dir).localCheckpoint()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


@query(
    "q29e_tpch_q5_shape",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q29e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table join where the
    customer and the supplier must share a nation inside one region —
    the classic snowflake traversal with a correlated equality across
    two fact-side paths.

    Scale shape: the two big tables (orders→lineitem) hash-join on
    orderkey ONCE; supplier/nation/region are dims and broadcast (the
    c_nationkey = s_nationkey correlation rides as an equi-key of the
    supplier broadcast join, never a post-filter over a wider join);
    the date filter pushes into the orders scan.  Revenue accumulates
    through the exact-decimal sum so the hash matches under any
    partitioning."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q29f_tpch_q10_shape",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q29f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers
    returned the most revenue in a quarter — the fact-fact join with a
    returnflag filter, a broadcast nation dim, and a revenue top-20.

    Scale shape: the returnflag and date filters push into the two fact
    scans (fractions of both tables survive), the orderkey hash join is
    the only big exchange, nation broadcasts, and the top-20 plans as
    TakeOrderedAndProject (no global sort) with (revenue DESC, custkey)
    as the deterministic total order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q29g_tpch_q7_shape",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q29g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): the
    double-dimension pattern — nation joined TWICE under different roles
    (supplier side, customer side) with a symmetric pair filter, yearly
    revenue rollup.

    Scale shape: both nation roles broadcast (two tiny builds of the
    same dim — Spark plans two independent BroadcastHashJoins, no self
    join materialization); the symmetric pair predicate applies above
    them as a row-local filter; the only big exchange is orderkey for
    the fact-fact join; supplier broadcasts.  Year extraction is
    integer, revenue is the exact-decimal sum."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        F.broadcast(s)
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(vol).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q29h_tpch_q14_shape",
    oracle="""
    SELECT
      CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
        AS promo_revenue,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
      100.0
        * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,6))) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q29h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the conditional-revenue ratio
    — one month of lineitem joined to the part dim, with promo revenue
    as a CASE'd sum over the SAME pass as total revenue (one scan, one
    aggregate, no second join or self-union).

    Scale shape: the shipdate filter pushes into the fact scan, part
    broadcasts, and the global two-sum aggregate partial-aggregates
    map-side to a single row.  Both sums are exact decimals cast to
    double; the ratio is one deterministic double division."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(promo.cast("decimal(18,6)")).cast("double").alias("promo_revenue"),
        F.sum(vol.cast("decimal(18,6)")).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@query(
    "q29i_tpch_q17_shape",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand = 'Brand#23'),
    st AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (PARTITION BY l_partkey)
               AS sum_qty,
             COUNT(*) OVER (PARTITION BY l_partkey) AS cnt
      FROM li)
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM st
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * CAST(5 * cnt AS DECIMAL(18,0))
          < sum_qty
    """,
)
def q29i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    `l_quantity < 0.2 * avg(l_quantity) per part` subquery, decorrelated
    the Spark-first way — NOT as a second aggregate + self-join (two
    lineitem passes, two partkey exchanges) but as a window over ONE
    brand-filtered pass: partitionBy(l_partkey) computes the per-part
    sum/count next to each row, so the plan is one scan, one exchange.

    Determinism: the 0.2·avg threshold is evaluated divide-free in exact
    decimals — `qty * 5 * cnt < Σqty` is the same comparison with no
    float rounding on either engine.  Scale shape: the Brand#23 filter
    broadcasts (~1/25 of part) and semi-reduces lineitem BEFORE the
    window's exchange; per-part groups are bounded (order count per
    part), so the window state never skews."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    filtered = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    qty_dec = F.col("l_quantity").cast("decimal(18,6)")
    st = filtered.select(
        "l_quantity",
        "l_extendedprice",
        F.sum(qty_dec).over(w).alias("sum_qty"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    small = st.where(
        qty_dec * (F.lit(5) * F.col("cnt")).cast("decimal(18,0)")
        < F.col("sum_qty")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / F.lit(7.0)
        )
        .cast("double")
        .alias("avg_yearly")
    )


@query(
    "q29j_tpch_q19_shape",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q29j(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    OR of three (brand, size, quantity) branches across both join sides.
    The part-only weakening of the disjunction — `p_brand IN (…) AND
    p_size BETWEEN 1 AND 15` — is applied explicitly before the
    broadcast (Catalyst does not CNF-extract it from the mixed OR), so
    the broadcast side shrinks ~8× and the l_quantity weakening
    (BETWEEN 1 AND 30) pushes into the fact scan; the exact disjunction
    then filters the joined rows.  One scan, one broadcast, a single
    partial-aggregated global sum — zero hash exchanges."""
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    p = t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 15)
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    joined = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).where(branch)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.agg(
        F.sum(vol.cast("decimal(18,6)")).cast("double").alias("revenue")
    )


@query(
    "q29k_tpch_q22_shape",
    oracle="""
    WITH seg AS (
      SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,6)) AS bal
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')),
    avg_t AS (
      SELECT CAST(SUM(bal) AS DECIMAL(38,6)) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seg WHERE bal > 0),
    rich AS (
      SELECT seg.* FROM seg, avg_t WHERE bal * n > s)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM rich
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = rich.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q29k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-customer relationship): customers in
    select market segments with above-average balance and no URGENT
    orders — a scalar correlated-average subquery plus a NOT EXISTS
    anti-join (the fixture's order table covers every customer, so the
    priority predicate keeps the anti join selective AND non-empty —
    203 survivors at sf0.01 — where TPC-H's no-orders-at-all would
    return zero rows here).

    Scale shape: the segment average is a one-ROW aggregate broadcast
    back as (Σbal, n) — the threshold compare is divide-free exact
    decimal ``bal·n > Σbal`` (q29i's discipline; an AVG double would be
    summation-order-dependent).  The NOT EXISTS decorrelates to a
    LEFT ANTI hash join on custkey; the orders side projects to the
    join key only, so the anti join moves keys, not rows.  Final
    per-segment rollup partial-aggregates map-side."""
    seg = (
        t(spark, sf_dir, "customer")
        .where(
            F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("c_acctbal").cast("decimal(18,6)").alias("bal"),
        )
    )
    avg_t = seg.where(F.col("bal") > 0).agg(
        F.sum("bal").alias("s"), F.count("*").alias("n")
    )
    rich = seg.join(F.broadcast(avg_t)).where(
        F.col("bal") * F.col("n") > F.col("s")
    )
    o_keys = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    no_orders = rich.join(
        o_keys, rich.c_custkey == o_keys.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def _q21_pair_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q29l's corpus reduction: the DISTINCT (order, supplier) pair table
    for finished orders, each pair flagged with whether that supplier
    EVER shipped late on the order.  Exposed un-checkpointed so the plan
    test can pin the shape: the single corpus-sized exchange carries
    map-side partial-combined (ok, sk) pairs — never raw lineitems, and
    never a COUNT-DISTINCT Expand."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_suppkey").alias("sk"),
            (F.datediff("l_shipdate", "o_orderdate") > 90).alias("late"),
        )
        .groupBy("ok", "sk")
        .agg(F.bool_or("late").alias("late"))
    )


@query(
    "q29l_tpch_q21_shape",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey AS ok, l_suppkey AS sk,
             (datediff('day', o_orderdate, l_shipdate) > 90) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    po AS (
      SELECT ok, COUNT(DISTINCT sk) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN sk END) AS n_late
      FROM lo GROUP BY ok),
    cand AS (SELECT DISTINCT ok, sk FROM lo WHERE late),
    w AS (
      SELECT cand.sk FROM cand JOIN po USING (ok)
      WHERE po.n_supp > 1 AND po.n_late = 1)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM w JOIN supplier ON sk = s_suppkey
    WHERE s_nationkey < 13
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q29l(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders, find the supplier who was the SOLE late shipper on a
    multi-supplier order — the benchmark's hardest correlated-subquery
    topology (EXISTS another supplier + NOT EXISTS another late
    supplier), here with ship-lag > 90 days standing in for the fixture's
    missing receipt/commit dates.

    Scale shape — the standard decorrelation, ONE corpus-sized shuffle
    total: both EXISTS collapse into per-order counts over the DISTINCT
    (order, supplier) pair table.  The flagged lineitem stream (orders
    dim broadcast into it) is reduced to that pair table by a single
    ``groupBy(ok, sk).agg(bool_or(late))`` — map-side partial combine,
    so the one corpus exchange carries combined pairs, and the
    distinct-count Expand shape (which would double the corpus before
    ITS exchange) never appears.  The pair table is localCheckpointed
    (it is what every consumer needs; checkpointed scans re-exchange,
    so materialize AFTER the reduction, never before): the per-order
    counts, the late-candidate filter (row-local, no distinct needed —
    the table is already distinct), and their shuffle_hash join on ok
    all pay only pair-table-sized exchanges.  A correlated rewrite
    would re-scan lineitem once per subquery.  The supplier dimension
    is a broadcast; the final per-supplier count partial-aggregates
    map-side.  Top-100 carries a (numwait DESC, s_name) total order
    for the driver."""
    per_pair = _q21_pair_table(spark, sf_dir).localCheckpoint()
    po = per_pair.groupBy("ok").agg(
        F.count("*").alias("n_supp"),
        F.count_if("late").alias("n_late"),
    )
    w = per_pair.where("late").join(
        po.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)).hint(
            "shuffle_hash"
        ),
        "ok",
    )
    s = (
        t(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") < 13)
        .select("s_suppkey", "s_name")
    )
    return (
        w.join(F.broadcast(s), w.sk == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "q29m_tpch_q9_shape",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY n_name, o_year DESC
    """,
)
def q29m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year, minus the
    fixture-absent partsupp supplycost term): name-filtered part ⋈
    lineitem ⋈ supplier ⋈ nation ⋈ orders → profit per (nation, year).
    Scale shape: the LIKE filter pushes to the part scan and that pruned
    part side BROADCASTS (parts matching a name pattern are a fraction
    of an already-dimension-sized table), as do supplier and nation —
    lineitem, the fact table, is never shuffled before the final
    (nation, year) aggregate, which map-side combines to ~nations×years
    rows.  Decimal(18,6) accumulation keeps the sum order-independent
    and engine-exact (the q29b discipline)."""
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q29n_tpch_q4_shape",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q29n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): one-quarter order
    window, EXISTS-decorrelated to a LEFT SEMI join against lineitems
    that shipped more than 60 days after the order date (the fixture
    lacks commit/receipt dates, so late shipment stands in for the
    spec's late-commit condition — same correlated-EXISTS shape).
    Scale shape: the date window pushes to the orders scan; the
    EXISTS is ONE semi join on orderkey (never a count + filter), so
    each order contributes at most one row regardless of lineitem
    fan-out; the priority rollup map-side combines to 5 rows."""
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q29o_tpch_q8_shape",
    oracle="""
    WITH all_sales AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             n2.n_name AS supp_nation,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               AS volume
      FROM lineitem
      JOIN part     ON p_partkey   = l_partkey
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN orders   ON o_orderkey  = l_orderkey
      JOIN customer ON c_custkey   = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                         THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q29o(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): PROMO-part sales into the
    ASIA customer market, NATION_7's supplier share of volume per year.
    Scale shape: part (type-filtered), supplier, customer's
    nation⋈region scope, and both nation legs all BROADCAST — lineitem
    joins orders on orderkey (the only fact-fact shuffle) and the
    two-level aggregate (conditional sum over the same rows) is ONE
    map-side-combined pass, never two scans.  Both volume sums
    accumulate in decimal(18,6); the share is a SINGLE double division
    of two engine-identical sums (the q125b sequencing rule), so the
    float result is bit-equal across engines."""
    p = (
        t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem")
    asia_cust = c.join(
        F.broadcast(n1), c.c_nationkey == n1.n_nationkey
    ).join(F.broadcast(r), n1.n_regionkey == r.r_regionkey).select("c_custkey")
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("supp_nation"),
            volume.alias("volume"),
        )
    )
    return (
        sales.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_7", F.col("volume")
                    ).otherwise(F.lit(0).cast("decimal(18,6)"))
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q29p_tpch_q15_shape",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q29p(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue view, global max,
    equality join back — the view-plus-scalar-subquery topology.  Scale
    shape: the date window pushes to the lineitem scan; the revenue view
    is ONE map-side-combined aggregate on suppkey, localCheckpointed
    because it feeds both the scalar max and the equality filter (Spark
    re-executes shared subtrees otherwise — the playbook rule); the max
    is a 1-row broadcast-joined scalar, supplier dim broadcasts, and the
    equality on total_revenue is exact because both engines accumulate
    decimal(18,6) and cast once to double (identical bits, q29b rule)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("total_revenue")
        )
        .localCheckpoint()
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q29a_tpch_q1_shape",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q29a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report) — the benchmark's
    canonical scan-filter-cluster-aggregate, completing the q29 family
    (round-15 verdict item 6).  Scale shape: the shipdate predicate
    pushes into the parquet scan, the grouping has 4-ish groups so the
    whole aggregate map-side combines to a handful of rows per task,
    and every sum accumulates decimal(18,6) (the q29b rule: exact,
    fold-order-independent) with ONE cast to double.  The averages are
    a single IEEE double division of the engine-identical decimal sum
    by the group count — bit-equal on both engines (the q29o/q125b
    sequencing rule), never a float AVG whose accumulation order
    differs."""
    dec6 = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "1998-09-02"
    )
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec6(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec6(F.col("l_extendedprice")))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                dec6(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec6(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec6(F.col("l_quantity"))).cast("double") / cnt).alias(
                "avg_qty"
            ),
            (
                F.sum(dec6(F.col("l_extendedprice"))).cast("double") / cnt
            ).alias("avg_price"),
            (F.sum(dec6(F.col("l_discount"))).cast("double") / cnt).alias(
                "avg_disc"
            ),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q29q_tpch_q6_shape",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q29q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the canonical
    scan-filter-aggregate — no join at all; the whole query is how much
    the scan can skip.  Scale shape: all three predicates push into the
    parquet scan (PushedFilters), the single sum partial-aggregates
    map-side to one row per task, and the exact decimal accumulation
    casts once to double (the q29b rule)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "q29r_tpch_q2_shape",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY 1, 2),
    eu AS (
      SELECT partkey, suppkey, supplycost, s_acctbal, s_name, n_name
      FROM ps
      JOIN supplier ON suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    mn AS (SELECT partkey, MIN(supplycost) AS min_cost FROM eu GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(eu.supplycost AS DOUBLE) AS supplycost
    FROM eu
    JOIN mn ON eu.partkey = mn.partkey AND eu.supplycost = mn.min_cost
    JOIN part ON eu.partkey = p_partkey
    WHERE p_size = 15 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q29r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated scalar
    subquery — for each part, keep only the region suppliers matching
    that part's MINIMUM supply cost.  The testdata has no partsupp
    table, so the (part, supplier, cost) relation derives from lineitem
    (min extendedprice per pair) — same topology: derived bridge,
    3-dim snowflake filter, per-group min, equality join back.

    Scale shape: the bridge aggregate is the only corpus-sized exchange;
    supplier/nation/region and the filtered part dim all broadcast; cost
    equality is exact decimal (no double compare).  ``eu`` — the bridge
    joined to the region suppliers — is localCheckpointed because it
    feeds both the per-part min and the equality join-back (Spark
    re-executes shared subtrees otherwise), and past the checkpoint both
    consumers re-partition only the SMALL region-filtered pair table,
    never lineitem again."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supplycost")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu = ps.join(
        F.broadcast(s), F.col("suppkey") == F.col("s_suppkey")
    ).select(
        "partkey", "suppkey", "supplycost", "s_acctbal", "s_name", "n_name"
    ).localCheckpoint()
    # mn derives FROM eu, so its key is renamed to keep the equality
    # join self-join-unambiguous
    mn = (
        eu.groupBy("partkey")
        .agg(F.min("supplycost").alias("min_cost"))
        .withColumnRenamed("partkey", "mn_partkey")
    )
    p = (
        t(spark, sf_dir, "part")
        .where((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    return (
        eu.join(
            mn,
            (F.col("partkey") == F.col("mn_partkey"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q29s_tpch_q11_shape",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY 1),
    tot AS (SELECT SUM(value) AS total FROM v)
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM v, tot
    WHERE value * 1000 > total
    ORDER BY value DESC, partkey
    LIMIT 100
    """,
)
def q29s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part value
    among one nation's suppliers, kept only when it exceeds a FRACTION
    of the global total — the scalar-subquery-in-HAVING topology.  The
    partsupp value (supplycost × availqty) derives from lineitem
    (extendedprice sums per part) — same shape, available columns.

    Scale shape: one corpus exchange (the per-part aggregate, filtered
    map-side by the broadcast nation-suppliers semi-join); the global
    total is a 1-row broadcast; the threshold compare is integer-scaled
    DECIMAL (value×1000 > total) — no cross-engine double rounding on
    the cut line.  ``v`` is localCheckpointed (feeds total + filter)."""
    s7 = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(s7), F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi"
    )
    v = (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("value")
        )
        .localCheckpoint()
    )
    tot = v.agg(F.sum("value").alias("total"))
    return (
        v.join(F.broadcast(tot))
        .where(F.col("value") * 1000 > F.col("total"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
        .limit(100)
    )


@query(
    "q29t_tpch_q12_shape",
    oracle="""
    SELECT l_returnflag AS mode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q29t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority mix): the fact-fact join
    whose aggregate buckets order priority with CASE'd conditional sums
    per mode — one pass, never two scans.  The testdata has no
    l_shipmode/commitdate/receiptdate, so the mode column is
    l_returnflag and the date window is on shipdate — same topology.

    Scale shape: the date filter pushes to the lineitem scan BEFORE the
    orderkey join (the join input shrinks to one year); both CASE sums
    share one HashAggregate pass that partial-aggregates map-side; the
    orders side carries only (orderkey, priority)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("mode")
    )


@query(
    "q29u_tpch_q16_shape",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
)
def q29u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-part relationship count): distinct
    suppliers per (brand, type, size) over a filtered part set, with a
    NOT IN subquery excluding flagged suppliers (no s_comment in the
    testdata, so the complaint filter becomes s_acctbal < 0) and the
    partsupp bridge derived from lineitem — same topology: dim filters,
    set-exclusion subquery, grouped COUNT(DISTINCT).

    Scale shape: the bridge DISTINCT hash-partitions on (partkey,
    suppkey) once; the filtered part dim broadcasts; the exclusion is a
    broadcast ANTI join (s_suppkey is never null, so NOT IN ≡ anti
    join); the count-distinct runs partial per partition before the
    (brand, type, size) exchange."""
    ps = (
        t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    p = t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 23)
    )
    bad = t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), "suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@query(
    "q29v_tpch_q20_shape",
    oracle="""
    WITH q96 AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2),
    q95 AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty95
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY 1, 2),
    excess AS (
      SELECT DISTINCT q96.suppkey
      FROM q96
      JOIN q95 ON q96.partkey = q95.partkey AND q96.suppkey = q95.suppkey
      WHERE q96.partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
        AND q96.qty96 * 2 > q95.qty95)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT suppkey FROM excess)
    ORDER BY s_name
    """,
)
def q29v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    shipments of the promoted parts GREW — nested IN subqueries with a
    correlated half-of-sum threshold.  The partsupp availqty becomes
    the pair's 1996 shipped quantity compared against half of its 1995
    baseline (pairs with no baseline are out, by the inner join — the
    declared adaptation); the part filter is the canonical p_name LIKE.

    Scale shape: the two year-windowed (partkey, suppkey) aggregates
    hash-partition identically, so their join is exchange-reusing; the
    promoted-part filter is a broadcast semi-join; the quantity
    threshold is integer-scaled DECIMAL (qty96×2 > qty95 — exact); the
    final supplier lookup is a broadcast semi-join into the dim."""
    li = t(spark, sf_dir, "lineitem")

    def year_qty(lo: str, hi: str, alias: str) -> DataFrame:
        return (
            li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
            .groupBy(
                F.col("l_partkey").alias("partkey"),
                F.col("l_suppkey").alias("suppkey"),
            )
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias(alias))
        )

    q96 = year_qty("1996-01-01", "1997-01-01", "qty96")
    q95 = year_qty("1995-01-01", "1996-01-01", "qty95")
    red = t(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("partkey")
    )
    excess = (
        q96.join(q95, ["partkey", "suppkey"])
        .join(F.broadcast(red), "partkey", "leftsemi")
        .where(F.col("qty96") * 2 > F.col("qty95"))
        .select("suppkey")
        .distinct()
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(t(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("suppkey"), "leftsemi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
