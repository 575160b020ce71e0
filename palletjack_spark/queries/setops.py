"""Set operations (SURVEY §2.2 Q50-Q52)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t


@query(
    "q50_union",
    oracle="""
    SELECT o_custkey, 'F' AS status FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey, 'O' AS status FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey, 'P' AS status FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + UNION DISTINCT [host].  (SQL UNION binds the distinct
    over the whole stack; we mirror that exactly.)"""
    o = t(spark, sf_dir, "orders")

    def part(status: str) -> DataFrame:
        return (
            o.where(F.col("o_orderstatus") == status)
            .select("o_custkey")
            .withColumn("status", F.lit(status))
        )

    return part("F").unionByName(part("O")).unionByName(part("P")).distinct()


@query(
    "q51_intersect_except",
    oracle="""
    SELECT c_custkey, 'both' AS kind FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT c_custkey, 'f_only' AS kind FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT [host]."""
    o = t(spark, sf_dir, "orders")
    f_custs = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    o_custs = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    both = f_custs.intersect(o_custs).withColumn("kind", F.lit("both"))
    f_only = f_custs.subtract(o_custs).withColumn("kind", F.lit("f_only"))
    return both.unionByName(f_only)


@query(
    "q52_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode FROM (
      SELECT l_returnflag, l_linestatus,
             CASE WHEN l_quantity < 25 THEN 'small' ELSE 'large' END AS l_shipmode
      FROM lineitem
    )
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT / dropDuplicates [north-star dedup building block]."""
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.when(F.col("l_quantity") < 25, "small")
            .otherwise("large")
            .alias("l_shipmode"),
        )
        .dropDuplicates()
    )


_Q53_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM {orders} o
    WHERE o_custkey IN (SELECT c_custkey FROM {customer}
                        WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > (SELECT 0.5 * MAX(l_extendedprice) FROM {lineitem})
      AND EXISTS (SELECT 1 FROM {lineitem} l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
"""


@query(
    "q53_sql_subqueries",
    oracle=_Q53_SQL.format(orders="orders", customer="customer", lineitem="lineitem"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL subqueries [host]: IN-subquery (left-semi), EXISTS (correlated ->
    left-semi after decorrelation), and a scalar subquery (one-row broadcast).
    Catalyst rewrites all three into joins — no per-row re-execution, unlike
    a naive interpreter.  The exact same SQL text runs on both engines."""
    for name in ("orders", "customer", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"pj_q53_{name}")
    return spark.sql(
        _Q53_SQL.format(
            orders="pj_q53_orders",
            customer="pj_q53_customer",
            lineitem="pj_q53_lineitem",
        )
    )


_Q55_SQL = """
    WITH RECURSIVE months(m) AS (
      SELECT 1
      UNION ALL
      SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m AS month, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN {orders}
      ON EXTRACT(MONTH FROM o_orderdate) = m
    GROUP BY m
"""


@query(
    "q55_recursive_cte",
    oracle=_Q55_SQL.format(orders="orders"),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE [host, Spark 4]: an iterative UnionLoop seeded by the
    anchor — here a 12-row month dimension joined against orders.  The
    recursion happens on the driver plan, the join fans out normally."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("pj_q55_orders")
    return spark.sql(_Q55_SQL.format(orders="pj_q55_orders"))


@query(
    "q54_lateral_join",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    ORDER BY c.c_custkey, t.o_orderkey
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (Q54): a per-row subquery — top-2 orders
    per customer — the SQL spelling of Q43's rank-limit window.  Catalyst
    DECORRELATES the lateral into a join + WindowGroupLimit rather than
    executing the subquery per outer row, which is the only survivable
    plan at 100 TB (per-row subquery execution would be O(customers)
    scans)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("pj_q54_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("pj_q54_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM pj_q54_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM pj_q54_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )
