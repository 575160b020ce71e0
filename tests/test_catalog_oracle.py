"""Differential oracle test over the whole declared query inventory —
the local mirror of the driver's CORRECTNESS gate (and of the reference's
pyarrow-vs-palletjack differential strategy, test_palletjack.py:58-107):
run every REGISTRY query on Spark AND its DuckDB oracle, assert exact
match (row count, schema, order-insensitive values)."""

from __future__ import annotations

import pytest

from palletjack_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_frames_match

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_q32_tolerance(spark, duck):
    """Raw HLL++ estimate within 5% of exact (SURVEY §2.3) — the driver
    row only sees the 10% boolean, this pins the tighter bound."""
    from pyspark.sql import functions as F

    pdf = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"))
        .toPandas()
    )
    exact = duck.sql(
        "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS ex FROM orders"
        " GROUP BY o_orderstatus"
    ).df()
    merged = pdf.merge(exact, on="o_orderstatus")
    assert len(merged) == len(exact)
    rel_err = (merged["approx_custs"] - merged["ex"]).abs() / merged["ex"]
    assert (rel_err < 0.05).all(), merged
