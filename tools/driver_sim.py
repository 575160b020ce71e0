"""Driver-contract simulation: pre-verify the CORRECTNESS window.

Replays exactly what the per-round verification driver does — fresh-import
``__spark_entry__``, run each windowed query on Spark at a given scale
factor, run its registered oracle SQL on DuckDB over the same parquet
tables, and compare row count, sorted column names, and values (columns
sorted by name, rows sorted by all columns, datetime units normalized —
the driver's hash comparison is unit-insensitive, see PLANS round-11
pre-verification note).

Usage::

    python tools/driver_sim.py                 # full driver window (aliased keys)
    python tools/driver_sim.py q92k q92l       # only QIDs matching these prefixes
    SPARK_GRAFT_SIM_SF=/root/testdata/sf0.001 python tools/driver_sim.py

Prints one line per query (``ok``/``MISMATCH``/``ERR``) and exits non-zero
on any failure, so it can gate a commit.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import numpy as np
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# the fixture-table list lives with the engine (round-13 review: a
# private copy here would silently miss a future table and report ERR
# on every oracle referencing it)
from palletjack_spark.tables import TABLES  # noqa: E402


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-equivalent canonical form: columns sorted by name, datetimes
    to us, float32 widened, rows sorted by every column's string form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    if len(df):
        key = df.astype(str)
        df = df.loc[key.sort_values(by=list(df.columns)).index].reset_index(drop=True)
    return df


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = av.astype(np.float64).to_numpy()
            bb = bv.astype(np.float64).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            # EXACT equality (tests/conftest parity; round-13 review:
            # rtol=1e-9 here could print ok for values the driver's
            # hash comparison will fail — this gate must be at least as
            # strict as the check it simulates)
            if not bool(np.all(both_nan | (aa == bb))):
                return False
        else:
            if not av.astype(str).equals(bv.astype(str)):
                return False
    return True


def main(argv: list[str]) -> int:
    prefixes = [a for a in argv if not a.startswith("-")]
    mod = _load_entry()
    qs, osql = mod.queries(), mod.oracle_sql()
    window = {k: v for k, v in mod._driver_keys().items() if k != v}
    keys = sorted(window) if not prefixes else sorted(
        k for k in qs if any(p in k or p in mod._canonical(k) for p in prefixes)
    )
    if not keys:
        print("no keys matched", prefixes)
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for k in keys:
        t0 = time.perf_counter()
        try:
            raw_s = qs[k](spark, SF_DIR).toPandas()
            sdf = _normalize(raw_s)
            if k in osql:
                raw_o = con.sql(osql[k]).df()
                odf = _normalize(raw_o)
                ok_rows = len(sdf) == len(odf)
                ok_cols = list(sdf.columns) == list(odf.columns)
                # strict dtype tags (tests/conftest._dtype_tag parity):
                # the q79 lesson — an int32 Spark column value-matches an
                # int64 oracle but fails the driver's schema hash
                def tag(s):
                    if pd.api.types.is_datetime64_any_dtype(s):
                        return "datetime"
                    return str(s.dtype)

                ok_dtypes = ok_cols and all(
                    tag(raw_s[c]) == tag(raw_o[c]) for c in raw_s.columns
                )
                ok_vals = ok_rows and ok_cols and _values_equal(sdf, odf)
                status = (
                    "ok"
                    if (ok_rows and ok_cols and ok_dtypes and ok_vals)
                    else "MISMATCH"
                )
                detail = (
                    f"rows={len(sdf)}/{len(odf)} cols={ok_cols}"
                    f" dtypes={ok_dtypes} vals={ok_vals}"
                )
            else:
                status, detail = "ok", f"rows-only={len(sdf)}"
        except Exception as e:  # noqa: BLE001 — report and continue
            status, detail = "ERR", repr(e)[:200]
        dt = time.perf_counter() - t0
        print(f"{status:8s} {k:42s} {dt:6.2f}s  {detail}", flush=True)
        if status != "ok":
            failures.append(k)

    print(f"\n{len(keys) - len(failures)}/{len(keys)} green", flush=True)
    if failures:
        print("failed:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
