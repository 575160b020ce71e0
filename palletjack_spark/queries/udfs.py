"""UDF / UDAF / UDTF surface (SURVEY §2.2 Q80-Q84).

Every UDF here computes something expressible in SQL so the oracle can
verify it exactly — the point is exercising the Python execution surface
(row UDF, Arrow-vectorized pandas UDF, grouped map, grouped agg, UDTF),
not hiding logic in Python.  Hot-path guidance: pandas UDFs (Arrow batches)
over row UDFs, builtins over both (SURVEY §4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from palletjack_spark.queries.registry import query, t


@query(
    "q80_scalar_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (l_orderkey * 31 + l_linenumber * 7) % 97 AS bucket
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (row-at-a-time) Python UDF [host surface] — the slow path,
    exercised on a filtered subset; the same logic is a one-line builtin."""

    @F.udf(LongType())
    def bucket(orderkey, linenumber):
        return (orderkey * 31 + linenumber * 7) % 97

    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bucket("l_orderkey", "l_linenumber").alias("bucket"),
    )


@query(
    "q81_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF [host] — Arrow-batched, ~10-100x the row UDF;
    numpy elementwise doubles are IEEE-identical to the SQL engine's."""

    @pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "q82_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           value - MIN(value) OVER (PARTITION BY user_id) AS value_centered
    FROM events
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas [host]: per-group transform with pandas.
    Min-centering (not mean) keeps doubles exact for the oracle."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["value_centered"] = pdf["value"] - pdf["value"].min()
        return pdf[["event_id", "user_id", "value_centered"]]

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # explicit keyed repartition: AQE would coalesce the small-by-bytes
    # shuffle to one partition and serialize every pandas group through a
    # single Python worker; the explicit count pins the fan-out and
    # satisfies applyInPandas's required hash partitioning (no 2nd shuffle)
    ev = ev.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    return ev.groupBy("user_id").applyInPandas(
        center, "event_id long, user_id long, value_centered double"
    )


@query(
    "q83_grouped_agg_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_centi_sum
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF [host]: integer accumulation (floor to
    centi-units) is order-independent, so the custom aggregate
    hash-matches SQL exactly."""

    @pandas_udf("long")
    def qty_centi_sum(qty: pd.Series) -> int:
        import numpy as np

        return int(np.floor(qty.to_numpy() * 100).astype("int64").sum())

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qty_centi_sum("l_quantity").alias("qty_centi_sum")
    )


@query(
    "q84_udtf_mapinpandas",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 50
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style flat map via mapInPandas [host]: one input row → many
    output rows (tokenization).  Also the implementation vehicle for the
    indexed scan (Q03)."""

    def tokenize(it):
        for pdf in it:
            toks = pdf["text"].str.split(" ")
            n = toks.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n).to_numpy(),
                    "token": [tok for lst in toks for tok in lst],
                }
            )

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    return docs.mapInPandas(tokenize, "doc_id long, token string")


@query(
    "q85_python_udtf",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '. ') AS p
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(i AS INT) AS sent_id,
           p[i] AS sentence
    FROM parts, UNNEST(generate_series(1, len(p))) AS s(i)
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF [host, Spark 4]: a ``@udtf`` class whose eval
    yields multiple rows per input (sentence splitting) — the declarative
    table-function surface (vs q84's mapInPandas).  Row-at-a-time Python
    is the slow path; it's registered here as API coverage, with the
    Arrow-batched q84 shape as the hot-path vehicle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, sent_id: int, sentence: string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            for i, s in enumerate(text.split(". ")):
                yield doc_id, i + 1, s

    spark.udtf.register("pj_sentence_split", SentenceSplit)
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("pj_q85_docs")
    return spark.sql(
        "SELECT s.doc_id, s.sent_id, s.sentence "
        "FROM pj_q85_docs d, LATERAL pj_sentence_split(d.doc_id, d.text) s"
    )
