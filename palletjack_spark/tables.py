"""Fixture table loading (TESTDATA.md / FIXTURES.md).

``events`` is documented as carrying a ``timestamp[ns]`` column, which
Spark's native parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]);
nanos route through our pyarrow-backed source, which truncates to Spark's
microsecond precision — exactly the fidelity note in SURVEY.md §7
("events.ts is timestamp[ns]!").  The routing is decided from the ACTUAL
footer, not the table name: a fixture generation whose ``ts`` is already
microseconds is fully Spark-representable, and the native scan keeps
Catalyst column pruning and predicate pushdown (the arrow source is an
opaque ``mapInArrow`` — every events consumer would otherwise ship ALL
columns, including the fat ``props`` string, through the Python boundary;
guide §4.1).  Measured 3.5× per events aggregate (0.78 → 0.22 s at sf0.1,
interleaved A/B), values byte-identical.  All other tables go through
``spark.read.parquet`` unconditionally.
"""

from __future__ import annotations

import os

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

#: tables whose parquet types MAY not be Spark-representable (checked
#: against the actual footer by ``_needs_arrow_source``)
_ARROW_SOURCE_TABLES = {"events"}


def _has_nanos(t) -> bool:
    """True when an arrow type (recursively) contains timestamp[ns]."""
    import pyarrow as pa

    if pa.types.is_timestamp(t) and t.unit == "ns":
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_nanos(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_nanos(f.type) for f in t)
    if pa.types.is_map(t):
        return _has_nanos(t.key_type) or _has_nanos(t.item_type)
    return False


def _needs_arrow_source(path: str) -> bool:
    """Footer probe: does this dataset carry a type Spark's native parquet
    reader rejects (timestamp[ns])?  One ``pq.read_schema`` call, and the
    result rides the load_table memo — never re-probed for an unchanged
    file."""
    import glob as _glob

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        inside = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not inside:
            return True  # unknown layout: the arrow source gives the
            # typed error surface for it
        probe = inside[0]
    try:
        schema = pq.read_schema(probe)
    except Exception:
        return True  # let the arrow source surface its typed errors
    return any(_has_nanos(f.type) for f in schema)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _stat_key(path: str) -> tuple:
    """Freshness fingerprint of a fixture table: (mtime_ns, size) of the
    path, plus every direct child for directory datasets — a rewritten or
    appended table must never be served from the memoized plan."""
    st = os.stat(path)
    key: list = [st.st_mtime_ns, st.st_size]
    if os.path.isdir(path):
        for entry in sorted(os.scandir(path), key=lambda e: e.name):
            es = entry.stat()
            key += [entry.name, es.st_mtime_ns, es.st_size]
    return tuple(key)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Resolve a fixture table to a DataFrame through a session-scoped
    relation memo — the path-read analogue of a catalog lookup.

    ``spark.read.parquet(path)`` pays schema inference (a footer-sampling
    Spark job) plus file listing on EVERY call, ~40-190 ms of driver-side
    metadata work that is byte-identical for an immutable input (guide
    §6 caches file listings for exactly this reason; ``spark.table`` on a
    catalog table — the q1b surface — reuses the resolved relation the
    same way).  The memo holds only the ANALYZED PLAN: every action on
    the returned DataFrame still scans the parquet input afresh, so no
    result or intermediate is ever reused.  Keyed on the file's
    (mtime_ns, size) so a rewritten fixture is re-resolved, and stored on
    the session object so the memo dies with the session."""
    if name not in TABLES:
        raise KeyError(f"Unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    memo = getattr(spark, "_pj_table_memo", None)
    if memo is None:
        memo = {}
        spark._pj_table_memo = memo
    key = (path, _stat_key(path))
    df = memo.get(key)
    if df is None:
        if name in _ARROW_SOURCE_TABLES and _needs_arrow_source(path):
            df = read_parquet_arrow(spark, path)
        else:
            df = spark.read.parquet(path)
        memo[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
