"""Query registry: the contract surface checked by the driver.

Determinism rules every query here follows (so the order-insensitive
value-hash against DuckDB is exact, not approximate):

- every computed column is aliased identically in Spark and SQL;
- SUM/AVG over doubles go through exact decimal accumulation:
  ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`` — decimal sums are
  order-independent and the final double cast is correctly rounded, so both
  engines produce bit-identical doubles regardless of partitioning.
  (A double at an exact half-ulp-of-decimal boundary is not representable,
  so rounding-mode differences cannot bite.)
- elementwise double arithmetic (+,-,*,/ on values read from parquet) is
  IEEE-deterministic and needs no special handling;
- LIMIT/top-k queries carry a total order with a unique tiebreak key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.session import tune_session
from palletjack_spark.tables import load_table

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


def query(name: str, oracle: str | None = None):
    """Register a query.  The wrapped fn(spark, sf_dir) is called with a
    tuned session (UTC, AQE, pushdown — session.RUNTIME_CONF)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name, fn=wrapped, oracle=oracle, doc=(fn.__doc__ or "").strip()
        )
        return wrapped

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
