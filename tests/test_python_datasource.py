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


def test_columns_option_prunes_decode_schema(spark, tmp_path):
    """Spark's Python DataSource API has no column-pruning pushdown, so
    ``.option("columns", ...)`` reaches the parquet decoder directly:
    the source schema (and the Arrow batches it reads) carry ONLY the
    named columns."""
    import pytest

    from palletjack_spark.errors import InvalidSelectionError
    from palletjack_spark.sources.python_datasource import register_datasource

    register_datasource(spark)
    path = table_path(SF_DIR, "orders")
    wide = spark.read.format("palletjack").load(path)
    narrow = (
        spark.read.format("palletjack")
        .option("columns", "o_orderkey,o_totalprice")
        .load(path)
    )
    assert len(wide.schema.fields) > 2
    assert narrow.schema.fieldNames() == ["o_orderkey", "o_totalprice"]
    a = sorted(tuple(r) for r in narrow.limit(50).collect())
    b = sorted(
        tuple(r)
        for r in spark.read.parquet(path)
        .select("o_orderkey", "o_totalprice")
        .limit(50)
        .collect()
    )
    assert len(a) == 50 and {x[0] for x in a} <= {
        r["o_orderkey"] for r in spark.read.parquet(path).collect()
    }
    # unknown names fail loudly at schema time
    with pytest.raises(Exception, match="Unknown column"):
        spark.read.format("palletjack").option(
            "columns", "o_orderkey,nope"
        ).load(path).schema


def test_hive_partitioned_root_matches_native_reader(spark, tmp_path):
    """Hive layouts: partition keys surface as string columns (appended
    after file columns), predicates on them prune whole files at plan
    time, and rows equal spark.read.parquet's (modulo the documented
    string-typed partition values)."""
    from pyspark.sql import functions as F

    from palletjack_spark.sources.python_datasource import (
        PalletJackReader,
        register_datasource,
    )

    register_datasource(spark)
    root = tmp_path / "hive"
    for region, lo in (("emea", 0), ("apac", 100)):
        d = root / f"region={region}"
        d.mkdir(parents=True)
        pq.write_table(
            pa.table({"v": pa.array(range(lo, lo + 50), pa.int64())}),
            str(d / "part.parquet"),
        )
    df = spark.read.format("palletjack").load(str(root))
    assert df.schema.fieldNames() == ["v", "region"]
    assert dict(df.dtypes)["region"] == "string"
    got = sorted(
        (r["region"], r["v"])
        for r in df.where(F.col("region") == "apac").collect()
    )
    assert got == [("apac", v) for v in range(100, 150)]

    # plan-time file pruning: the apac equality plans ONE file
    r = PalletJackReader([str(root)], df.schema, ["region"])
    r._predicate = [("region", "=", "apac")]
    parts = [p.value for p in r.partitions()]
    assert len(parts) == 1 and "region=apac" in parts[0][0]

    # mixed partition-key + data predicates stay exact
    both = sorted(
        r["v"]
        for r in df.where(
            (F.col("region") == "emea") & (F.col("v") >= 40)
        ).collect()
    )
    assert both == list(range(40, 50))


def test_not_filters_translate_and_prune(spark, tmp_path):
    """Round-10 ADVICE / verdict item 3: Spark pushes ``!=`` as
    Not(EqualTo) and ``NOT IN`` as Not(In) — the translation maps them
    to the mini-language exclusion ops (and NOT over a range to its
    complement), so the planner prunes single-valued / wholly-excluded
    chunks instead of silently dropping the filter."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull, Not

    from palletjack_spark.sources.python_datasource import (
        PalletJackReader,
        _translate,
        register_datasource,
    )

    assert _translate(Not(EqualTo(("t",), "a"))) == ("t", "!=", "a")
    assert _translate(Not(In(("t",), ("a", "b")))) == ("t", "not_in", ["a", "b"])
    assert _translate(Not(GreaterThan(("n",), 5))) == ("n", "<=", 5)
    assert _translate(Not(IsNull(("n",)))) == ("n", "not_null")
    assert _translate(Not(Not(EqualTo(("t",), "a")))) == ("t", "=", "a")

    register_datasource(spark)
    # rg0 is single-valued {a}; rg1 holds {b, c}
    path = str(tmp_path / "ex.parquet")
    pq.write_table(
        pa.table(
            {
                "t": pa.array(["a"] * 100 + ["b", "c"] * 50),
                "n": pa.array(range(200), type=pa.int64()),
            }
        ),
        path,
        row_group_size=100,
    )
    df = spark.read.format("palletjack").load(path)

    r = PalletJackReader([path], df.schema)
    residual = list(r.pushFilters([Not(EqualTo(("t",), "a"))]))
    assert len(residual) == 1  # stays residual: results exact either way
    assert r._predicate == [("t", "!=", "a")]
    assert [p.value for p in r.partitions()] == [(path, [1])]

    r2 = PalletJackReader([path], df.schema)
    list(r2.pushFilters([Not(In(("t",), ("b", "c")))]))
    assert [p.value for p in r2.partitions()] == [(path, [0])]

    # end-to-end through Spark's own pushFilters delivery
    got = sorted(
        (x["t"], x["n"]) for x in df.where(F.col("t") != "a").collect()
    )
    assert got == sorted(
        [("b", 100 + 2 * i) for i in range(50)]
        + [("c", 101 + 2 * i) for i in range(50)]
    )
    assert df.where(~F.col("t").isin("b", "c")).count() == 100


def test_shadowed_partition_key_reads_data_not_path(spark, tmp_path):
    """Round-10 ADVICE (medium): a hive ``key=value`` segment whose key
    names a PHYSICAL file column must read as data — schema() already
    dropped the shadowed key, and reader() must apply the same rule or
    read() substitutes the constant path string for the column (type
    mismatch) and partitions() prunes files by path instead of data."""
    from pyspark.sql import functions as F

    from palletjack_spark.sources.python_datasource import register_datasource

    register_datasource(spark)
    root = tmp_path / "shadow"
    for seg, lo in (("v=9", 0), ("v=1", 100)):
        d = root / seg
        d.mkdir(parents=True)
        pq.write_table(
            pa.table({"v": pa.array(range(lo, lo + 50), pa.int64()),
                      "w": pa.array([seg] * 50)}),
            str(d / "part.parquet"),
        )
    df = spark.read.format("palletjack").load(str(root))
    # v is the FILE column (bigint), not a string partition key
    assert df.schema.fieldNames() == ["v", "w"]
    assert dict(df.dtypes)["v"] == "bigint"
    assert sorted(r["v"] for r in df.collect()) == (
        list(range(50)) + list(range(100, 150))
    )
    # predicates on v filter by DATA (both files hold v < 50 is false
    # for one of them; path-value pruning would keep/drop the wrong one)
    got = sorted(r["v"] for r in df.where(F.col("v") >= 100).collect())
    assert got == list(range(100, 150))
    assert df.where(F.col("v") == 9).count() == 1
