"""Scalar function families (SURVEY §2.2 Q60-Q67).

Oracle-parity notes: DuckDB list indexing is 1-based (Spark getItem is
0-based); Spark FLOOR/CEIL of double returns BIGINT (DuckDB returns DOUBLE
— cast in SQL); both engines' ROUND cannot disagree on arbitrary doubles
because exact decimal half-way points are not double-representable.
Transcendental libm functions (exp/ln) are deliberately excluded from
hash-matched outputs — JVM vs libm may differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t

_EVENTS_US = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,"
    " value, props FROM events)"
)


@query(
    "q60_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS uname,
           LOWER(c_mktsegment) AS lseg,
           SUBSTR(c_name, 1, 8) AS prefix,
           LENGTH(c_name) AS name_len,
           TRIM(CONCAT(c_name, ' ')) AS trimmed,
           CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           REGEXP_EXTRACT(c_name, '[0-9]+') AS digits,
           STRING_SPLIT(c_name, '#')[1] AS first_tok
    FROM customer
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions [host]."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.concat_ws("#", F.col("c_mktsegment"), F.col("c_nationkey")).alias(
            "seg_nation"
        ),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.split("c_name", "#").getItem(0).alias("first_tok"),
    )


@query(
    "q61_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAYOFMONTH(o_orderdate) AS INT) AS dom,
           DATE_TRUNC('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
           CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS unix_sec
    FROM orders
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions [host] (fixture o_orderdate is timestamp[ms])."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp_ntz")
        .alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.unix_timestamp(
            F.col("o_orderdate").cast("timestamp")
        ).alias("unix_sec"),
    )


@query(
    "q62_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0) AS abs_dev,
           ROUND(l_extendedprice, 1) AS rounded,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_price,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           SQRT(l_quantity) AS sqrt_qty,
           ((l_orderkey % 7) + 7) % 7 AS pmod7
    FROM lineitem
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions [host] — the IEEE-exact subset (abs/round/floor/ceil/
    sqrt/pmod) hash-matches; transcendental fns live outside the oracle."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
        F.round("l_extendedprice", 1).alias("rounded"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("pmod7"),
    )


@query(
    "q63_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
           IFNULL(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unspecified')
             AS priority_label
    FROM orders
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: when/otherwise, coalesce, nullif, nvl [host]."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
        ).alias("status_label"),
        F.nvl(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")),
            F.lit("unspecified"),
        ).alias("priority_label"),
    )


@query(
    "q64_decimal_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(3,2))
                AS DECIMAL(18,4)) AS VARCHAR) AS tithe,
           CAST(CAST(o_orderkey AS SMALLINT) % 100 AS INT) AS key_mod
    FROM orders WHERE o_orderkey < 10000
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast / exact decimal arithmetic [ref types h:824-853].  Decimals are
    emitted as canonical strings so both engines' pandas representations
    compare byte-equal."""
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 10000)
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    return o.select(
        "o_orderkey",
        dec.cast("string").alias("price_dec"),
        (dec * F.lit(0.1).cast("decimal(3,2)"))
        .cast("decimal(18,4)")
        .cast("string")
        .alias("tithe"),
        (F.col("o_orderkey").cast("smallint") % 100).cast("int").alias("key_mod"),
    )


@query(
    "q65_array_funcs",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS s(i)
    WHERE vec_id < 10
    UNION ALL
    SELECT vec_id, -1 AS pos, CAST(len(embedding) AS DOUBLE) AS val
    FROM embeddings
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions: explode with position, size [ref LIST h:706]
    (fixture ``embeddings.embedding`` list<float>[64])."""
    e = t(spark, sf_dir, "embeddings")
    exploded = (
        e.where(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "v"))
        .select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    )
    sizes = e.select(
        "vec_id",
        F.lit(-1).alias("pos"),
        F.size("embedding").cast("double").alias("val"),
    )
    return exploded.unionByName(sizes)


@query(
    "q66_map_funcs",
    oracle="""
    SELECT event_id,
           map(['type','props'], [event_type, props])['type'][1] AS m_type,
           CAST(cardinality(map(['type','props'], [event_type, props])) AS INT)
             AS m_size
    FROM events
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions: create_map / element_at / size [ref MAP h:686]."""
    ev = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("props"), F.col("props")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.size(m).alias("m_size"),
    )


@query(
    "q67_json_funcs",
    oracle=f"""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN 'absent' ELSE 'present' END AS missing_probe
    FROM {_EVENTS_US}
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions [ref JSON h:1056] (fixture events.props, e.g.
    ``{{"k": 87}}``)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(
            F.get_json_object("props", "$.missing").isNull(), "absent"
        )
        .otherwise("present")
        .alias("missing_probe"),
    )


@query(
    "q68_array_hof",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6)
             AS norm2,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(list_max(embedding) AS DOUBLE) AS vmax
    FROM embeddings
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions [ref LIST h:706]: transform / filter /
    aggregate lambdas evaluated inside the JVM over the embedding column —
    the JVM-side building blocks the cosine/ANN pipeline (Q92*) composes.
    Sequential fold both engines -> identical doubles (rounded vs FMA)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.expr(
                "aggregate(embedding, 0D,"
                " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            ),
            6,
        ).alias("norm2"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("n_pos"),
        F.array_max("embedding").cast("double").alias("vmax"),
    )
