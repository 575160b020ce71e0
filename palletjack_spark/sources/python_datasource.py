"""``spark.read.format("palletjack")`` — the Spark 4 Python DataSource
integration surface.

The DataFrame interception (``index/routing.py``), the JVM optimizer rule
(``index/jvm_routing.py``), and ``smart_read`` all require the caller to
opt in through palletjack entry points.  The Python DataSource API (Spark
4.0+, filter pushdown 4.1+) plugs the index into Spark's OWN reader
surface instead: after one ``register_datasource(spark)``, any
``spark.read.format("palletjack").load(path)`` — including from code that
has never imported this package — plans its scan from the metadata index:

- ``pushFilters`` receives Catalyst's conjunctive filters as typed
  objects (EqualTo/GreaterThan/LessThan/In/IsNull/...), translates the
  single-column scalar ones into the index predicate mini-language, and
  returns EVERY filter as residual — row-group pruning is approximate,
  so Spark must keep evaluating the originals; identical results with
  or without the source, as everywhere else in the index stack.
- ``partitions`` plans DRIVER-side from the index: stats pruning +
  dictionary-page probing (q03e) + ~128 MB span chunking — the same plan
  `MetadataIndex.read` produces, delivered through Spark's partition
  planning instead of a mapInArrow stage.
- ``read`` runs executor-side and yields Arrow record batches for one
  (file, row-group span), the ``arrow_scan`` fast path.

Scale note: like every Python DataSource, ``partitions()`` runs on the
driver — appropriate for the ≤``DRIVER_BUILD_MAX_FILES`` driver-local
index shape; catalog-scale reads should keep using ``smart_read`` /
``MetadataIndex.read``, whose planning stays distributed.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "palletjack"

#: mirror of arrow_scan's span sizing (import-free so the reader object
#: stays trivially picklable)
_TARGET_TASK_BYTES = 128 * 1024 * 1024


def _translate(f: Filter):
    """One Catalyst Filter -> one index mini-language conjunct, or None
    when the filter shape (nested column, non-scalar value) is outside
    the mini-language.  ``attribute`` is the dataclass field carrying
    the column path tuple; length > 1 means a nested field — skip.

    ``Not``-wrapped filters (round-10 ADVICE / verdict item 3): Spark
    pushes ``!=`` as Not(EqualTo) and ``NOT IN`` as Not(In) — map them
    to the mini-language's exclusion ops.  NOT over a range filter is
    its complement for row-keeping purposes (a NULL passes neither the
    original nor the complement), so those flip too.  Any other Not
    shape is outside the mini-language — skip (Spark still evaluates
    the original as residual, so skipping is always exact)."""
    if isinstance(f, Not):
        inner = _translate(f.child)
        if inner is None:
            return None
        flip = {
            "=": "!=",
            "!=": "=",
            "in": "not_in",
            "not_in": "in",
            ">": "<=",
            ">=": "<",
            "<": ">=",
            "<=": ">",
            "is_null": "not_null",
            "not_null": "is_null",
        }
        op = flip.get(inner[1])
        return (inner[0], op, *inner[2:]) if op else None
    col = getattr(f, "attribute", None)
    if col is None or len(col) != 1:
        return None
    name = col[0]
    if isinstance(f, EqualTo):
        return (name, "=", f.value)
    if isinstance(f, GreaterThan):
        return (name, ">", f.value)
    if isinstance(f, GreaterThanOrEqual):
        return (name, ">=", f.value)
    if isinstance(f, LessThan):
        return (name, "<", f.value)
    if isinstance(f, LessThanOrEqual):
        return (name, "<=", f.value)
    if isinstance(f, In):
        return (name, "in", list(f.value))
    if isinstance(f, IsNull):
        return (name, "is_null")
    if isinstance(f, IsNotNull):
        return (name, "not_null")
    return None


class PalletJackDataSource(DataSource):
    """``format("palletjack")``: options

    - ``path`` (file, directory, or comma-separated list; required);
    - ``columns`` (comma-separated, optional): read ONLY these columns.
      Spark's Python DataSource API has no column-pruning pushdown (a
      ``.select()`` above the source still decodes every column), so
      narrow projections over wide tables should name their columns here
      — the option reaches the parquet decoder itself.

    Hive-partitioned roots: ``key=value`` path segments surface as
    string partition columns APPENDED after the file columns (Spark's
    type-inference-off semantics, matching ``MetadataIndex.read``), safe
    equality predicates on them prune whole files, and every predicate
    stays exact via Spark's residual evaluation."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _paths(self) -> list[str]:
        path = self.options.get("path")
        if not path:
            from palletjack_spark.errors import InvalidSelectionError

            raise InvalidSelectionError(
                "format('palletjack') needs .load(path) or .option('path', ...)"
            )
        return [p for p in str(path).split(",") if p]

    def _columns(self) -> list[str] | None:
        cols = self.options.get("columns")
        if not cols:
            return None
        return [c.strip() for c in str(cols).split(",") if c.strip()]

    def schema(self) -> StructType:
        from palletjack_spark.index.footer_splice import read_schema
        from palletjack_spark.sources.arrow_scan import (
            arrow_to_spark_schema,
            expand_paths,
            partition_values,
            resolve_columns,
        )
        from pyspark.sql.types import StringType, StructField

        files = expand_paths(self._paths())
        # metadata-only: ONE footer's schema (homogeneous-dataset
        # assumption, same as spark.read.parquet without mergeSchema);
        # hive partition keys parsed from one path (standard layouts
        # carry the same keys on every file — MetadataIndex.partition_keys
        # documents the same assumption)
        base = arrow_to_spark_schema(read_schema(parquet_path=files[0]))
        part_keys = [
            k for k in sorted(partition_values(files[0]))
            if k not in base.fieldNames()
        ]
        sel = resolve_columns(
            list(base.fieldNames()) + part_keys, self._columns(), None
        )
        if sel is None:
            file_fields = list(base.fields)
            out_keys = part_keys
        else:
            file_fields = [base[c] for c in sel if c in base.fieldNames()]
            out_keys = [k for k in part_keys if k in sel]
        return StructType(
            file_fields
            + [StructField(k, StringType(), True) for k in out_keys]
        )

    def reader(self, schema: StructType) -> "PalletJackReader":
        from palletjack_spark.index.footer_splice import read_schema
        from palletjack_spark.sources.arrow_scan import (
            arrow_to_spark_schema,
            expand_paths,
            partition_values,
        )

        files = expand_paths(self._paths())
        # drop hive keys SHADOWED by a physical file column, exactly as
        # schema() does: a key=value segment whose key names a real
        # column must read as data (round-10 ADVICE — treating it as a
        # partition key substituted the constant path string for the
        # column and pruned files by path instead of data)
        base = arrow_to_spark_schema(read_schema(parquet_path=files[0]))
        part_keys = [
            k for k in sorted(partition_values(files[0]))
            if k not in base.fieldNames()
        ]
        return PalletJackReader(self._paths(), schema, part_keys)


class PalletJackReader(DataSourceReader):
    def __init__(
        self,
        paths: list[str],
        schema: StructType,
        part_keys: list[str] | None = None,
    ) -> None:
        self._paths = paths
        self._schema = schema
        #: hive partition keys of the layout (may include keys the
        #: columns option dropped from the output schema)
        self._part_keys = list(part_keys or [])
        #: partition keys that ARE in the output schema, in schema order
        self._out_keys = [
            f.name for f in schema.fields if f.name in set(self._part_keys)
        ]
        self._predicate: list[tuple] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            conjunct = _translate(f)
            if conjunct is not None:
                self._predicate.append(conjunct)
            # EVERY filter stays residual: pruning is row-group-approximate
            yield f

    def partitions(self):
        # Driver-side plan: a fresh local SparkSession handle is not
        # available here, but the driver-local index path never needs
        # one past the build — parse footers directly.
        import re

        from palletjack_spark.index.builder import _extract_file_rows
        from palletjack_spark.index.dictprune import dict_prune_rows
        from palletjack_spark.index.metadata_index import MetadataIndex
        from palletjack_spark.sources.arrow_scan import (
            expand_paths,
            partition_values,
        )

        files = expand_paths(self._paths)
        # file-level partition pruning for SAFE equality conjuncts on a
        # partition key (same conservative charset gate as
        # MetadataIndex._partition_plan_filter; everything else stays
        # exact via Spark's residual evaluation of the original filters)
        pk = set(self._part_keys)
        for col_name, op, *vals in self._predicate:
            if (
                col_name in pk
                and op in ("=", "==")
                and vals
                and isinstance(vals[0], str)
                and re.fullmatch(r"[A-Za-z0-9._\-]+", vals[0])
            ):
                files = [
                    f
                    for f in files
                    if partition_values(f).get(col_name) == vals[0]
                ]
        rg_rows = []
        for p in files:
            _frow, rgs = _extract_file_rows(p)
            for r in rgs:
                r.pop("file_size", None)
                r.pop("mtime_ns", None)
            rg_rows.extend(rgs)
        if self._predicate:
            from palletjack_spark.index.bloomprune import bloom_prune_rows
            from palletjack_spark.index.pageprune import page_prune_rows

            rg_rows = [
                r
                for r in rg_rows
                if MetadataIndex._keep_local(r, self._predicate)
            ]
            rg_rows = dict_prune_rows(rg_rows, self._predicate)
            # bloom tier (q03g): point lookups on dict-overflow chunks
            rg_rows = bloom_prune_rows(rg_rows, self._predicate)
            # page-index tier (q03h): per-page envelope gaps, incl. the
            # range conjuncts the first two tiers can't probe
            rg_rows = page_prune_rows(rg_rows, self._predicate)
        sel = sorted(
            (r["file"], r["row_group"], r["total_byte_size"]) for r in rg_rows
        )
        parts: list[InputPartition] = []
        cur_file, span, span_bytes = None, [], 0
        for f, rg, nbytes in sel:
            if f != cur_file and span:
                parts.append(InputPartition((cur_file, span)))
                span, span_bytes = [], 0
            cur_file = f
            span.append(rg)
            span_bytes += nbytes or 0
            if span_bytes >= _TARGET_TASK_BYTES:
                parts.append(InputPartition((cur_file, span)))
                span, span_bytes = [], 0
        if span:
            parts.append(InputPartition((cur_file, span)))
        # Spark requires >= 1 partition; an empty selection reads nothing
        return parts or [InputPartition((None, []))]

    def read(self, partition: InputPartition) -> Iterator:
        from palletjack_spark.sources.arrow_scan import (
            _read_span_batches,
            normalize_arrow_schema,
        )
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        path, span = partition.value
        if path is None or not span:
            return
        # decode ONLY the file columns of the (possibly columns-pruned)
        # output schema; partition-key columns attach as constant strings
        out_keys = set(self._out_keys)
        file_fields = [f for f in self._schema.fields if f.name not in out_keys]
        cols = [f.name for f in file_fields]
        target = normalize_arrow_schema(to_arrow_schema(StructType(file_fields)))
        yield from _read_span_batches(
            path, list(span), cols, target, 65536,
            partition_keys=self._out_keys or None,
        )


def register_datasource(spark) -> None:
    """Arm ``format("palletjack")`` for this session (and enable Python
    data-source filter pushdown, which Spark 4.1 gates behind a conf —
    without it a reader implementing ``pushFilters`` refuses to plan)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PalletJackDataSource)
