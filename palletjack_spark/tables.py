"""Fixture table loading (TESTDATA.md / FIXTURES.md).

``events`` carries a ``timestamp[ns]`` column which Spark's native parquet
reader rejects outright ([PARQUET_TYPE_ILLEGAL]); it is read through our
pyarrow-backed source, which truncates to Spark's microsecond precision —
exactly the fidelity note in SURVEY.md §7 ("events.ts is timestamp[ns]!").
All other tables go through ``spark.read.parquet`` so Catalyst keeps its
native pushdown/pruning over them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from palletjack_spark.sources.arrow_scan import read_parquet_arrow

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: tables whose parquet types Spark's native reader cannot represent
_ARROW_SOURCE_TABLES = {"events"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"Unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    if name in _ARROW_SOURCE_TABLES:
        return read_parquet_arrow(spark, path)
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
