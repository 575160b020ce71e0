"""Automatic scan+filter rewriting for plain ``spark.read.parquet`` users
— the SURVEY §4 stretch goal, at the session level.

``smart_read`` (index/smart.py) routes between the indexed mapInArrow scan
and the native parquet source, but the caller must invoke it explicitly
with the predicate mini-language.  This module closes the last gap: after

    register_index(spark, path)   # index the table
    enable_auto_routing()         # patch the reader (no arguments)

a completely ordinary

    spark.read.parquet(path).where("l_orderkey <= 100")

is intercepted at the DataFrame layer — the filter condition is parsed
back into the index predicate language and handed to ``smart_read``, which
consults the row-group stats and reroutes the scan through the index when
pruning pays.  Results are identical either way (pruning is a pure
optimization; the residual filter always applies), and anything the parser
or router cannot prove safe falls through to the untouched native path.

Mechanics and limits (all deliberate):

- Routing applies only to paths with a registered index
  (``register_index``); unregistered paths behave exactly as stock
  PySpark.  The interception is process-local and reversible
  (``disable_auto_routing``).
- The condition parser accepts conjunctions of simple comparisons
  (``col op numeric-literal``, plus BETWEEN) — the same subset the index
  stats can prune on.  Disjunctions, UDFs, expressions over multiple
  columns, or non-numeric literals fall back to the native filter.
- In production Spark this rewrite belongs in the optimizer: a
  ``SparkSessionExtensions`` ``injectOptimizerRule`` (Scala) matching
  Filter(ParquetScan) — the decision logic (stats lookup, keep-fraction
  threshold) is exactly what ``smart_read`` implements, and this module is
  its session-level stand-in for a pure-Python deployment: same inputs
  (path, parsed predicate), same routing decision, same plans out.

The reference has no analogue — its user must explicitly choose
``read_metadata`` vs a plain open per call (palletjack_cython.pyx:27);
auto-routing generalizes its value proposition ("consult the cheap index
first") to unmodified reader code.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import DataFrame, SparkSession

# RoutedDataFrame must subclass the CLASSIC DataFrame: the unified
# pyspark.sql.DataFrame.__new__ dispatches subclass construction back to
# the base class and would swallow our constructor arguments.
from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame
from pyspark.sql.readwriter import DataFrameReader

from palletjack_spark.index.builder import build_index
from palletjack_spark.index.metadata_index import MetadataIndex

#: canonical path -> MetadataIndex for routed reads
_INDEXES: dict[str, MetadataIndex] = {}

#: saved stock DataFrameReader.parquet while routing is enabled
_ORIG_PARQUET = None

#: (method name -> original) for the reader-configuration markers below
_ORIG_SETTERS: dict = {}

#: reader methods whose use marks the reader as CONFIGURED — a reroute
#: re-reads through smart_read's own default reader, so wrapped reads
#: only happen on pristine readers (round-13 review: mergeSchema /
#: explicit schemas were silently dropped by the reroute)
_SETTER_NAMES = ("option", "options", "schema", "format")


def _marking(orig):
    def wrapper(self, *a, **k):
        self._pj_configured = True
        return orig(self, *a, **k)

    wrapper.__name__ = orig.__name__
    wrapper.__doc__ = orig.__doc__
    return wrapper

#: reentrancy guard: smart_read's own native fallback reads the same path
#: with the same predicate — without this flag that inner read would be
#: re-intercepted and recurse forever
_IN_ROUTE = threading.local()


def _canon(path: str) -> str:
    return path.rstrip("/")


def register_index(
    spark: SparkSession, path: str, index: MetadataIndex | None = None
) -> MetadataIndex:
    """Register (building if needed) the metadata index that auto-routing
    consults for ``path``.  Paths without a registered index are never
    intercepted."""
    idx = index if index is not None else build_index(spark, path)
    _INDEXES[_canon(path)] = idx
    return idx


def unregister_index(path: str) -> None:
    _INDEXES.pop(_canon(path), None)


#: one comparison term: identifier op numeric literal (either direction)
_TERM = re.compile(
    r"^\(*\s*(?:(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?P<op>>=|<=|==?|>|<)\s*(?P<lit>-?\d+(?:\.\d+)?)"
    r"|(?P<lit2>-?\d+(?:\.\d+)?)\s*(?P<op2>>=|<=|==?|>|<)\s*"
    r"(?P<col2>[A-Za-z_][A-Za-z0-9_]*))\s*\)*$"
)

_FLIP = {">": "<", "<": ">", ">=": "<=", "<=": ">=", "=": "=", "==": "="}

_NULL_TERM = re.compile(
    r"^\(*\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)\s+IS\s+(?P<not>NOT\s+)?NULL\s*\)*$",
    re.IGNORECASE,
)

#: the AND inside "x BETWEEN a AND b" is part of the term, not a conjunction
_BETWEEN_SPAN = re.compile(
    r"\bBETWEEN\s+-?\d+(?:\.\d+)?\s+AND\b", re.IGNORECASE
)

_BETWEEN_TERM = re.compile(
    r"^\(*\s*([A-Za-z_][A-Za-z0-9_]*)\s+BETWEEN\s+(-?\d+(?:\.\d+)?)"
    r"\s+AND\s+(-?\d+(?:\.\d+)?)\s*\)*$",
    re.IGNORECASE,
)


def _split_conjuncts(text: str) -> list[str] | None:
    """Split a condition string on top-level AND; None if an OR/NOT (or
    unbalanced parens) makes the conjunction unsafe to decompose.  The AND
    belonging to a BETWEEN term never splits."""
    between_spans = [m.span() for m in _BETWEEN_SPAN.finditer(text)]

    def in_between(i: int) -> bool:
        return any(a <= i < b for a, b in between_spans)

    parts, depth, start = [], 0, 0
    upper = text.upper()
    i = 0
    while i < len(upper):
        c = upper[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return None
        elif depth <= 1 and upper[i : i + 4] == " OR ":
            return None
        elif (
            upper[i : i + 5] == " NOT " or upper.startswith("NOT ", i) and i == 0
        ) and (i < 3 or upper[i - 3 : i + 9] != " IS NOT NULL"):
            # the NOT inside "x IS NOT NULL" is a null predicate, not a
            # boolean negation; any other NOT stays unroutable
            return None
        elif depth <= 1 and upper[i : i + 5] == " AND " and not in_between(i + 1):
            parts.append(text[start:i])
            start = i + 5
            i += 4
        i += 1
    if depth != 0:
        # unbalanced parens: stock Spark raises ParseException for this
        # string — routing must not quietly "succeed" where the
        # unrouted path throws (round-13 review)
        return None
    parts.append(text[start:])
    return parts


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_NUM = re.compile(r"^-?\d+(?:\.\d+)?$")


def _split_args(text: str) -> list[str]:
    """Split on top-level commas (outside parentheses)."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(text):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return parts


def _parse_prefix(text: str) -> list[tuple] | None:
    """Parse Spark 4's prefix-form Column rendering — ``<(l_orderkey, 50)``,
    ``and(>(x, 45), <=(y, 2))`` — into predicate terms; None outside the
    routable subset (or/not/non-numeric/expression operands)."""
    text = text.strip()
    m = re.match(r"^([A-Za-z_]+|>=|<=|==?|>|<)\((.*)\)$", text, re.DOTALL)
    if not m:
        return None
    op, inner = m.group(1), m.group(2)
    args = _split_args(inner)
    if op == "and":
        terms: list[tuple] = []
        for a in args:
            part = _parse_prefix(a)
            if part is None:
                return None
            terms.extend(part)
        return terms or None
    if op in ("isNull", "isnull", "isNotNull", "isnotnull"):
        if len(args) != 1 or not _IDENT.match(args[0].strip()):
            return None
        kind = "is_null" if op.lower() == "isnull" else "not_null"
        return [(args[0].strip(), kind)]
    if op not in _FLIP:
        return None  # or/not/udf/... — not safely routable
    if len(args) != 2:
        return None
    a, b = args[0].strip(), args[1].strip()
    if _IDENT.match(a) and _NUM.match(b):
        col, lit = a, b
    elif _NUM.match(a) and _IDENT.match(b):
        col, lit, op = b, a, _FLIP[op]
    else:
        return None
    op = "=" if op in ("=", "==") else op
    return [(col, op, float(lit) if "." in lit else int(lit))]


def parse_condition(condition) -> list[tuple] | None:
    """Parse a filter condition (Column or SQL string) into the index
    predicate mini-language ``[(col, op, value), ...]``; None when the
    condition is outside the safely-routable subset."""
    if not isinstance(condition, str):
        try:
            return _parse_prefix(condition._jc.toString())
        except Exception:
            return None
    text = condition
    conjuncts = _split_conjuncts(text.strip())
    if not conjuncts:
        return None
    out: list[tuple] = []
    for part in conjuncts:
        b = _BETWEEN_TERM.match(part.strip())
        if b:
            col, lo, hi = b.group(1), b.group(2), b.group(3)
            out.append((
                col, "between",
                float(lo) if "." in lo else int(lo),
                float(hi) if "." in hi else int(hi),
            ))
            continue
        n = _NULL_TERM.match(part.strip())
        if n:
            out.append(
                (n.group("col"), "not_null" if n.group("not") else "is_null")
            )
            continue
        m = _TERM.match(part.strip())
        if not m:
            return None
        if m.group("col"):
            col, op, lit = m.group("col"), m.group("op"), m.group("lit")
        else:
            col, lit = m.group("col2"), m.group("lit2")
            op = _FLIP[m.group("op2")]
        op = "=" if op in ("=", "==") else op
        val = float(lit) if "." in lit else int(lit)
        out.append((col, op, val))
    return out or None


class RoutedDataFrame(ClassicDataFrame):
    """A DataFrame over a single registered parquet path whose FIRST
    ``filter``/``where`` may reroute through the metadata index —
    directly, or after a plain name-only ``select`` (the
    ``scan[+project]+filter`` pattern).  Every other operation behaves
    exactly like the stock DataFrame and returns stock DataFrames."""

    def __new__(cls, df: DataFrame, path: str, projection=None):
        # bypass ClassicDataFrame.__new__, which requires exactly
        # (jdf, sql_ctx) and self-invokes __init__ with them
        return object.__new__(cls)

    def __init__(self, df: DataFrame, path: str, projection=None):
        super().__init__(df._jdf, df.sparkSession)
        self._pj_path = path
        self._pj_projection = projection

    def select(self, *cols) -> DataFrame:
        out = super().select(*cols)
        # track name-only projections so a following filter still routes;
        # expressions/Columns fall back to a stock DataFrame
        if cols and all(isinstance(c, str) and _IDENT.match(c) for c in cols):
            return RoutedDataFrame(out, self._pj_path, projection=list(cols))
        return out

    def filter(self, condition) -> DataFrame:
        from palletjack_spark.index.smart import smart_read

        if getattr(_IN_ROUTE, "on", False):
            return super().filter(condition)
        idx = _INDEXES.get(self._pj_path)
        pred = parse_condition(condition) if idx is not None else None
        # under a projection, route only when the predicate references
        # projected columns — the native path would reject anything else,
        # and the rewrite must never widen what a query can see
        if pred is not None and self._pj_projection is not None:
            if not all(c in self._pj_projection for c, _op, *_ in pred):
                pred = None
        if pred is not None:
            # columns without stats are conservatively kept by the index
            # (MetadataIndex._keep_local), so any parsed predicate is safe
            _IN_ROUTE.on = True
            try:
                return smart_read(
                    self.sparkSession, self._pj_path,
                    columns=self._pj_projection,
                    predicate=pred, index=idx,
                )
            except Exception:
                pass  # anything unroutable falls back to the native path
            finally:
                _IN_ROUTE.on = False
        return super().filter(condition)

    where = filter


def _routed_parquet(self: DataFrameReader, *paths: str, **options):
    df = _ORIG_PARQUET(self, *paths, **options)
    # decline to wrap when the caller configured the reader (options
    # like mergeSchema/recursiveFileLookup, or an explicit .schema()):
    # a reroute re-reads through smart_read's own default reader and
    # would silently drop those semantics (round-13 review)
    configured = bool(options) or getattr(self, "_pj_configured", False)
    if not configured and len(paths) == 1 and _canon(paths[0]) in _INDEXES:
        return RoutedDataFrame(df, _canon(paths[0]))
    return df


#: nesting depth of enable_auto_routing() calls.  The interception is
#: PROCESS-GLOBAL (DataFrameReader.parquet is patched class-wide) and the
#: toggles assume a single-threaded driver: two threads racing
#: enable/disable would see each other's routing state.  Reference-counting
#: (round-3 ADVICE) at least makes nested enable/disable pairs — e.g. a
#: registered query toggling routing inside a session that already enabled
#: it — compose correctly instead of the inner disable stripping the
#: outer scope's routing.
_ROUTING_DEPTH = 0


def enable_auto_routing() -> None:
    """Intercept ``DataFrameReader.parquet`` so reads of registered paths
    return :class:`RoutedDataFrame`.  Reference-counted: each call must be
    paired with one :func:`disable_auto_routing`; the patch is removed when
    the count returns to zero.  Driver-side single-threaded use assumed
    (the patch is process-global)."""
    global _ORIG_PARQUET, _ROUTING_DEPTH
    _ROUTING_DEPTH += 1
    if _ORIG_PARQUET is None:
        _ORIG_PARQUET = DataFrameReader.parquet
        DataFrameReader.parquet = _routed_parquet
        for name in _SETTER_NAMES:
            orig = getattr(DataFrameReader, name, None)
            if orig is not None:
                _ORIG_SETTERS[name] = orig
                setattr(DataFrameReader, name, _marking(orig))


def disable_auto_routing(force: bool = False) -> None:
    """Undo one :func:`enable_auto_routing`; the stock
    ``DataFrameReader.parquet`` is restored when every enable has been
    released (or immediately with ``force=True``)."""
    global _ORIG_PARQUET, _ROUTING_DEPTH
    _ROUTING_DEPTH = 0 if force else max(0, _ROUTING_DEPTH - 1)
    if _ROUTING_DEPTH == 0 and _ORIG_PARQUET is not None:
        DataFrameReader.parquet = _ORIG_PARQUET
        _ORIG_PARQUET = None
        for name, orig in _ORIG_SETTERS.items():
            setattr(DataFrameReader, name, orig)
        _ORIG_SETTERS.clear()
