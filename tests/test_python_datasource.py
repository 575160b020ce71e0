"""Spark 4 Python DataSource surface (round 9): format("palletjack")
plans scans from the metadata index — stats + dictionary pruning via
4.1 filter pushdown — while every filter stays residual, so rows are
identical to the native reader no matter what gets pruned."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR
from palletjack_spark.tables import table_path


def _interleaved(tmp_path):
    path = str(tmp_path / "inter.parquet")
    order = sorted(range(400), key=lambda i: (i % 4, i))
    pq.write_table(
        pa.table(
            {
                "tag": pa.array([f"user_{i:04d}" for i in order]),
                "n": pa.array(order, type=pa.int64()),
            }
        ),
        path,
        row_group_size=100,
        compression="snappy",
    )
    return path


def test_format_palletjack_equals_native_reader(spark):
    from pyspark.sql import functions as F

    from palletjack_spark.sources.python_datasource import register_datasource

    register_datasource(spark)
    path = table_path(SF_DIR, "orders")
    via_ds = spark.read.format("palletjack").load(path)
    native = spark.read.parquet(path)
    assert via_ds.count() == native.count()
    cond = (F.col("o_orderkey") >= 100) & (F.col("o_orderkey") <= 200)
    a = sorted(
        (r["o_orderkey"], r["o_totalprice"])
        for r in via_ds.where(cond).select("o_orderkey", "o_totalprice").collect()
    )
    b = sorted(
        (r["o_orderkey"], r["o_totalprice"])
        for r in native.where(cond).select("o_orderkey", "o_totalprice").collect()
    )
    assert a == b and len(a) > 0


def test_pushed_filters_prune_partitions(spark, tmp_path):
    """The reader receives Catalyst's typed filters, keeps them ALL as
    residual, and uses them for planning: equality and IN prune to the
    dictionary-proven row groups; a literal outside every dictionary
    plans the empty scan and returns zero rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, In

    from palletjack_spark.sources.python_datasource import (
        PalletJackReader,
        register_datasource,
    )

    register_datasource(spark)
    path = _interleaved(tmp_path)
    df = spark.read.format("palletjack").load(path)

    r = PalletJackReader([path], df.schema)
    residual = list(r.pushFilters([EqualTo(("tag",), "user_0005")]))
    assert len(residual) == 1  # everything stays residual
    assert r._predicate == [("tag", "=", "user_0005")]
    assert [p.value for p in r.partitions()] == [(path, [1])]

    r2 = PalletJackReader([path], df.schema)
    list(r2.pushFilters([In(("tag",), ("user_0005", "user_0006"))]))
    assert [p.value for p in r2.partitions()] == [(path, [1, 2])]

    # end-to-end rows through the pruned plan
    got = df.where(F.col("tag") == "user_0005").collect()
    assert [(x["tag"], x["n"]) for x in got] == [("user_0005", 5)]
    assert df.where(F.col("tag") == "no_such_value").count() == 0
    assert (
        df.where(F.col("tag").isin("user_0005", "user_0006")).count() == 2
    )


def test_unsupported_filters_fall_through(spark, tmp_path):
    """Filters outside the mini-language (e.g. StringContains) are left
    for Spark; the scan stays full but rows stay exact."""
    from pyspark.sql import functions as F

    from palletjack_spark.sources.python_datasource import register_datasource

    register_datasource(spark)
    path = _interleaved(tmp_path)
    df = spark.read.format("palletjack").load(path)
    got = df.where(F.col("tag").contains("_0005")).collect()
    assert [(x["tag"], x["n"]) for x in got] == [("user_0005", 5)]
