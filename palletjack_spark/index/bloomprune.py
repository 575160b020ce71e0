"""Split-block bloom-filter row-group pruning — and writing — for
equality predicates.

This is the pruning tier for the one layout neither stats nor
dictionaries can reach (round-10 verdict item 1): point lookups on
HIGH-CARDINALITY columns (IDs, URLs, content hashes) whose dictionaries
OVERFLOW to plain data pages.  There q03e's ``encoding_stats`` gate
correctly refuses to dictionary-prune, and [min, max] spans everything.
Parquet's split-block bloom filters (format spec ``BloomFilter.md``; the
reference's generated codec models the footer offsets at
parquet_types_palletjack.h:2012-2148, ``bloom_filter_offset`` /
``bloom_filter_length`` — present-but-unpruned in the reference, per
SURVEY §1.1) answer exactly this: a few KB per chunk, xxHash64 of the
plain-encoded value, one 32-byte block probed with 8 salted bits.

Layout (public parquet-format spec):

- ``ColumnMetaData.bloom_filter_offset`` (field 14, i64) points at a
  compact-thrift ``BloomFilterHeader`` — numBytes (1), algorithm union
  (2, BLOCK), hash union (3, XXHASH), compression union (4,
  UNCOMPRESSED) — followed by the raw bitset; ``bloom_filter_length``
  (field 15, i32) is header+bitset (optional: older writers omit it).
- The bitset is a power-of-two count of 32-byte blocks, each 8 little-
  endian 32-bit words.  ``h = xxh64(plain_bytes)``; the block index is
  ``((h >> 32) * nblocks) >> 32``; within the block, word ``i`` must
  have bit ``((h_low * SALT[i]) & 0xFFFFFFFF) >> 27`` set.

A hit is "maybe present" (false positives possible, bounded by the
writer's fpp); a MISS is a proof of absence — so pruning on a miss is
sound, and every parse/IO failure or ineligible type degrades to
"unknown → keep" (identical results either way; the residual filter
always applies downstream), the same contract as
:mod:`palletjack_spark.index.dictprune`.

The module also WRITES standard split-block bloom filters:
:func:`add_bloom_filters` enriches an existing parquet file in place by
appending bitsets after the data and splicing the offsets into the
footer — the same memcpy-splice discipline as the reference's footer
surgery (palletjack.cc:369-616), needed here because neither pyarrow 16
nor DuckDB 1.0 can write them.  Files stay fully standard: parquet-mr
(Spark) reads and bloom-filters them natively.

Scale shape: probe I/O is one footer (cached) plus one
``bloom_filter_length`` read (typically 8-32 KB) per surviving
(file, chunk) — no data pages; embarrassingly parallel per chunk, and
the catalog-scale plan variant probes executor-side
(:func:`bloom_prune_plan`), never materializing the selection on the
driver.
"""

from __future__ import annotations

import struct

from palletjack_spark.index.dictprune import (
    _IDENTITY_LOGICAL,
    _equality_conjuncts,
)
from palletjack_spark.index.footer_splice import (
    _decode_value,
    _encode_field_header,
    _list_elem_spans,
    _span_get,
    _struct_field_spans,
    _write_zigzag,
    footer_spans,
    read_footer_bytes,
)

__all__ = [
    "BloomProber",
    "add_bloom_filters",
    "add_bloom_filters_dataset",
    "bloom_prune_plan",
    "bloom_prune_rows",
    "value_prune_plan",
    "xxh64",
]

# --------------------------------------------------------------------------
# xxHash64 (XXH64) — the spec-mandated bloom hash, seed 0
# --------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-Python XXH64 (public reference algorithm; verified against
    the published test vectors in tests/test_bloomprune.py and against
    parquet-mr-written filters end-to-end).  Python int arithmetic is
    plenty for the handful of predicate literals probed per query."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# --------------------------------------------------------------------------
# split-block bitset
# --------------------------------------------------------------------------

#: the 8 salt constants of the split-block algorithm (format spec)
_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)


def _block_of(words, h: int) -> int:
    """Word index of the block ``h`` maps to (8 words per 32-byte block)."""
    nblocks = len(words) >> 3
    return (((h >> 32) * nblocks) >> 32) << 3


def _might_contain(words, h: int) -> bool:
    base = _block_of(words, h)
    hl = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((hl * _SALT[i]) & 0xFFFFFFFF) >> 27
        if not (words[base + i] >> bit) & 1:
            return False
    return True


def _insert(words, h: int) -> None:
    base = _block_of(words, h)
    hl = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((hl * _SALT[i]) & 0xFFFFFFFF) >> 27
        words[base + i] |= 1 << bit


# --------------------------------------------------------------------------
# footer + header parsing
# --------------------------------------------------------------------------


def _column_meta_spans(footer: bytes, rg_idx: int, col_idx: int):
    """(ColumnMetaData field spans, struct start, struct end) for one
    (row group, column), or None on any layout surprise."""
    try:
        _fields, rg_elems = footer_spans(footer)
        if not (0 <= rg_idx < len(rg_elems)):
            return None
        cols_span = _span_get(rg_elems[rg_idx], 1)  # RowGroup.columns
        if cols_span is None:
            return None
        _etype, spans, _ = _list_elem_spans(footer, cols_span[1])
        if not (0 <= col_idx < len(spans)):
            return None
        cc_fields, _ = _struct_field_spans(footer, spans[col_idx][0])
        md_span = _span_get(cc_fields, 3)  # ColumnChunk.meta_data
        if md_span is None:
            return None
        start = md_span[1]
        md_fields, end = _struct_field_spans(footer, start)
        return md_fields, start, end
    except Exception:
        return None


def bloom_offsets(
    footer: bytes, rg_idx: int, col_idx: int
) -> tuple[int, int | None] | None:
    """(bloom_filter_offset, bloom_filter_length|None) of a column chunk,
    or None when the chunk carries no bloom filter (the common case —
    absence must KEEP the row group)."""
    got = _column_meta_spans(footer, rg_idx, col_idx)
    if got is None:
        return None
    md_fields, _s, _e = got
    off = _span_get(md_fields, 14)  # ColumnMetaData.bloom_filter_offset
    if off is None:
        return None
    try:
        offset = _decode_value(footer, off[1], off[0])[0]
        ln_span = _span_get(md_fields, 15)  # bloom_filter_length
        length = (
            _decode_value(footer, ln_span[1], ln_span[0])[0]
            if ln_span is not None
            else None
        )
        if not isinstance(offset, int) or offset < 0:
            return None
        return offset, length if isinstance(length, int) and length > 0 else None
    except Exception:
        return None


#: sanity cap on a single bitset read (the spec's own maximum)
_MAX_BITSET = 128 * 1024 * 1024


def read_bloom(path: str, offset: int, length: int | None):
    """Parse one split-block bloom filter into its word tuple, or None
    when the header is missing/foreign (non-BLOCK algorithm, non-XXHASH,
    compressed — nothing standard writes those today) or anything fails:
    unknown always keeps."""
    try:
        if length is not None and length > _MAX_BITSET + 4096:
            # cap BEFORE the read: a corrupt/foreign footer declaring a
            # multi-GB bloom_filter_length must degrade to "unknown ->
            # keep", not allocate gigabytes on an executor (the
            # read_column_index pre-read discipline)
            return None
        with open(path, "rb") as fh:
            fh.seek(offset)
            raw = fh.read(length if length else 4096)
            header, payload = _struct_field_spans(raw, 0)
            num_bytes = _decode_value(raw, *_need(header, 1))[0]
            if (
                not isinstance(num_bytes, int)
                or num_bytes < 32
                or num_bytes > _MAX_BITSET
                or num_bytes & 31
            ):
                return None
            # the three unions must each hold their field-1 member:
            # BLOCK / XXHASH / UNCOMPRESSED
            for fid in (2, 3, 4):
                u_span = _span_get(header, fid)
                if u_span is None:
                    return None
                u_fields, _ = _struct_field_spans(raw, u_span[1])
                if len(u_fields) != 1 or u_fields[0][0] != 1:
                    return None
            if payload + num_bytes > len(raw):
                if length is not None:
                    return None  # declared length too short: foreign layout
                fh.seek(offset + payload)
                bits = fh.read(num_bytes)
            else:
                bits = raw[payload : payload + num_bytes]
        if len(bits) != num_bytes:
            return None
        return struct.unpack(f"<{num_bytes >> 2}I", bits)
    except Exception:
        return None


def _need(fields, fid):
    span = _span_get(fields, fid)
    if span is None:
        raise KeyError(fid)
    return span[1], span[0]


# --------------------------------------------------------------------------
# literal -> plain-encoded hash input
# --------------------------------------------------------------------------


def _probe_bytes(value, physical_type: str, logical_type: str | None):
    """The value's hash input per the spec (plain encoding; BYTE_ARRAY
    hashes the raw bytes WITHOUT the length prefix — verified against
    parquet-mr-written filters), or None when the literal's type can't
    be the column's value space.  The same identity-logical-type gate as
    the dictionary probe (round-10 ADVICE): DECIMAL-as-unscaled-INT,
    unsigned-as-signed, and date/time re-encodings never probe."""
    t = (physical_type or "").upper()
    if logical_type not in _IDENTITY_LOGICAL.get(t, ()):
        return None
    try:
        if t == "BYTE_ARRAY":
            if isinstance(value, str):
                return value.encode("utf-8")
            if isinstance(value, (bytes, bytearray)):
                return bytes(value)
            return None
        if t in ("INT32", "INT64"):
            if not isinstance(value, int) or isinstance(value, bool):
                return None
            return struct.pack("<i" if t == "INT32" else "<q", value)
        if t in ("FLOAT", "DOUBLE"):
            import math

            if not isinstance(value, (int, float)) or isinstance(value, bool):
                return None
            v = float(value)
            # NaN never probes (Spark NaN = NaN is true; writers hash a
            # canonical NaN we can't rely on) and ±0.0 hash differently
            # while comparing equal — both keep
            if math.isnan(v) or v == 0.0:
                return None
            packed = struct.pack("<f" if t == "FLOAT" else "<d", v)
            # FLOAT: a literal not exactly representable in float32 can
            # still be PROBED only if the round-trip is exact
            if t == "FLOAT" and struct.unpack("<f", packed)[0] != v:
                return None
            return packed
        return None  # BOOLEAN / INT96 / FIXED_LEN_BYTE_ARRAY: not probed
    except (struct.error, OverflowError):
        return None  # literal outside the physical range: stats' job


# --------------------------------------------------------------------------
# prober + pruning
# --------------------------------------------------------------------------


class BloomProber:
    """Memoizing prober for one planning pass: footers and parsed
    bitsets are each read at most once per (file, offset) — a
    multi-row-group file costs one footer read plus one small bitset
    read per probed chunk."""

    def __init__(self) -> None:
        self._footers: dict[str, bytes | None] = {}
        self._blooms: dict[tuple, object] = {}
        self._offsets: dict[tuple, tuple | None] = {}

    def _footer(self, path: str) -> bytes | None:
        if path not in self._footers:
            try:
                self._footers[path] = read_footer_bytes(path)
            except Exception:
                self._footers[path] = None
        return self._footers[path]

    def _bloom(self, path: str, rg_idx: int, col_idx: int):
        okey = (path, rg_idx, col_idx)
        if okey not in self._offsets:
            footer = self._footer(path)
            self._offsets[okey] = (
                bloom_offsets(footer, rg_idx, col_idx)
                if footer is not None
                else None
            )
        off = self._offsets[okey]
        if off is None:
            return None
        bkey = (path, off[0])
        if bkey not in self._blooms:
            self._blooms[bkey] = read_bloom(path, off[0], off[1])
        return self._blooms[bkey]

    def can_match(
        self, path: str, rg_idx: int, col_idx: int, col_meta: dict, value
    ) -> bool | None:
        """False = the bloom filter PROVES no row equals ``value`` (safe
        to skip the row group); True = maybe present; None = no
        filter / ineligible type (keep)."""
        probe = _probe_bytes(
            value, col_meta.get("physical_type"), col_meta.get("logical_type")
        )
        if probe is None:
            return None
        words = self._bloom(path, rg_idx, col_idx)
        if words is None:
            return None
        return _might_contain(words, xxh64(probe))


def _conjunct_prunes(prober, path, rg_idx, col_idx, col_meta, values) -> bool:
    """True when EVERY candidate of one =/IN conjunct is provably absent."""
    return all(
        prober.can_match(path, rg_idx, col_idx, col_meta, v) is False
        for v in values
    )


def bloom_prune_rows(
    rg_rows: list[dict], predicate, prober: BloomProber | None = None
) -> list[dict]:
    """Drop row-group rows whose bloom filters PROVE an equality/IN
    conjunct can't match.  Exclusions can't use blooms (a filter can
    never prove its column holds ONLY excluded values) — the dictionary
    tier owns those.  Unknown verdicts keep the row; results are
    identical either way."""
    conj = _equality_conjuncts(predicate)
    if not conj:
        return rg_rows
    prober = prober or BloomProber()
    out = []
    for r in rg_rows:
        keep = True
        for col_name, values in conj:
            col_idx = next(
                (
                    i
                    for i, c in enumerate(r["columns"])
                    if c["name"] == col_name
                ),
                None,
            )
            if col_idx is None:
                continue
            if _conjunct_prunes(
                prober, r["file"], r["row_group"], col_idx,
                r["columns"][col_idx], values,
            ):
                keep = False
                break
        if keep:
            out.append(r)
    return out


def bloom_prune_plan(plan, predicate):
    """Catalog-scale variant: filter a pruned PLAN DataFrame (file,
    row_group, total_byte_size, columns) by probing bloom filters
    EXECUTOR-side — same contract as ``dictprune.dict_prune_plan``: the
    selection never touches the driver, each task's prober memoizes
    footers/bitsets, and the scan that follows re-opens the same files.
    Without equality conjuncts the input returns untouched."""
    conj = _equality_conjuncts(predicate)
    if not conj:
        return plan

    import pyarrow as pa

    from palletjack_spark.index.dictprune import (
        _VALUE_META_FIELDS,
        meta_from_row,
        plan_meta_columns,
    )

    meta_cols = plan_meta_columns(
        plan, [c for c, _v in conj], "pj", _VALUE_META_FIELDS
    )
    sel = plan.select("file", "row_group", "total_byte_size", *meta_cols)
    out_schema = "file string, row_group int, total_byte_size long"
    out_arrow = pa.schema(
        [("file", pa.string()), ("row_group", pa.int32()),
         ("total_byte_size", pa.int64())]
    )
    values = [vs for _c, vs in conj]

    def probe(batches):
        prober = BloomProber()
        for b in batches:
            kept = []
            for r in b.to_pylist():
                keep = True
                for i, cand in enumerate(values):
                    cix = r[f"pj_cix_{i}"]
                    if cix is None or cix < 0:
                        continue
                    meta = meta_from_row(r, "pj", i, _VALUE_META_FIELDS)
                    if _conjunct_prunes(
                        prober, r["file"], r["row_group"], int(cix),
                        meta, cand,
                    ):
                        keep = False
                        break
                if keep:
                    kept.append(
                        {
                            "file": r["file"],
                            "row_group": r["row_group"],
                            "total_byte_size": r["total_byte_size"],
                        }
                    )
            yield pa.RecordBatch.from_pylist(kept, schema=out_arrow)

    return sel.mapInArrow(probe, out_schema)


def value_prune_plan(plan, predicate, explain: bool = False):
    """Combined executor-side value-level pruning in ONE mapInArrow pass:
    the dictionary tier (equality + exclusion —
    :mod:`palletjack_spark.index.dictprune`), the bloom tier (equality
    on dict-overflow chunks, this module), and the page-index tier
    (per-page min/max envelope gaps —
    :mod:`palletjack_spark.index.pageprune`, which also probes RANGE
    conjuncts the first two tiers can't).  One pass instead of three
    keeps the catalog plan a single pipelined stage, and the probers
    share the per-task footer reads through the footer cache.  Same
    contract as the single-tier variants: unknown keeps, the selection
    never touches the driver, output columns are (file, row_group,
    total_byte_size, pj_ranges).

    ``explain=True`` (round-12 observability,
    :func:`palletjack_spark.index.explain.prune_explain_counts`): keep
    EVERY input row and emit a ``pj_tier`` column instead — the deciding
    value tier ("dictionary" / "bloom" / "page") for rows the pass would
    have dropped, "kept" otherwise."""
    from pyspark.sql import functions as F

    from palletjack_spark.index.dictprune import (
        _DICT_META_FIELDS,
        _VALUE_META_FIELDS,
        DictionaryProber,
        _conjunct_prunes as _dict_conjunct_prunes,
        _dict_conjuncts,
        meta_from_row,
        plan_meta_columns,
    )
    from palletjack_spark.index.pageprune import (
        _EXCLUDE_OPS,
        _NULL_OPS,
        _VALUE_OPS,
        PageProber,
    )

    conj = _dict_conjuncts(predicate or ())
    page_ops = _VALUE_OPS | _EXCLUDE_OPS | _NULL_OPS
    page_cols: list[str] = []
    for col_name, op, *_vals in predicate or ():
        if op in page_ops and col_name not in page_cols:
            page_cols.append(col_name)
    if not conj and not page_cols:
        if explain:
            from pyspark.sql import functions as _F

            return plan.select(
                "file", "row_group", "total_byte_size"
            ).withColumn("pj_tier", _F.lit("kept"))
        return plan

    import pyarrow as pa

    meta_cols = plan_meta_columns(
        plan, [c for c, _v, _m in conj], "pj", _DICT_META_FIELDS
    ) + plan_meta_columns(plan, page_cols, "pg", _VALUE_META_FIELDS)
    has_nrows = "num_rows" in plan.columns
    nrows_col = (
        [F.col("num_rows").alias("pg_nrows")]
        if has_nrows
        else [F.lit(None).cast("long").alias("pg_nrows")]
    )
    sel = plan.select(
        "file", "row_group", "total_byte_size", *nrows_col, *meta_cols
    )
    if explain:
        out_schema = (
            "file string, row_group int, total_byte_size long,"
            " pj_tier string"
        )
        out_arrow = pa.schema(
            [("file", pa.string()), ("row_group", pa.int32()),
             ("total_byte_size", pa.int64()), ("pj_tier", pa.string())]
        )
    else:
        out_schema = (
            "file string, row_group int, total_byte_size long,"
            " pj_ranges array<array<bigint>>"
        )
        out_arrow = pa.schema(
            [("file", pa.string()), ("row_group", pa.int32()),
             ("total_byte_size", pa.int64()),
             ("pj_ranges", pa.list_(pa.list_(pa.int64())))]
        )
    values = [(vs, mode) for _c, vs, mode in conj]
    pred_list = [tuple(p) for p in predicate]

    def probe(batches):
        dict_prober = DictionaryProber()
        bloom_prober = BloomProber()
        page_prober = PageProber()
        for b in batches:
            kept = []
            for r in b.to_pylist():
                keep = True
                tier = None
                for i, (cand, mode) in enumerate(values):
                    cix = r[f"pj_cix_{i}"]
                    if cix is None or cix < 0:
                        continue
                    meta = meta_from_row(r, "pj", i, _DICT_META_FIELDS)
                    if _dict_conjunct_prunes(
                        dict_prober, r["file"], r["row_group"], int(cix),
                        meta, cand, mode,
                    ):
                        keep = False
                        tier = "dictionary"
                        break
                    if mode == "eq" and _conjunct_prunes(
                        bloom_prober, r["file"], r["row_group"], int(cix),
                        meta, cand,
                    ):
                        keep = False
                        tier = "bloom"
                        break
                ranges = None
                if keep and page_cols:
                    page_meta = {
                        c: (
                            r[f"pg_cix_{j}"],
                            meta_from_row(r, "pg", j, _VALUE_META_FIELDS),
                        )
                        for j, c in enumerate(page_cols)
                    }

                    def look(col_name):
                        got = page_meta.get(col_name)
                        if got is None or got[0] is None or got[0] < 0:
                            return None
                        return int(got[0]), got[1]

                    if not page_prober.rg_can_match(
                        r["file"], r["row_group"], r["pg_nrows"],
                        pred_list, look,
                    ):
                        keep = False
                        tier = "page"
                    elif r["pg_nrows"]:
                        # round-12: surviving page ROW RANGES ride the
                        # plan (same prober — the footer/index caches
                        # make this a re-read-free second pass), so the
                        # executor-side scan slices row groups exactly
                        # like the driver-local path.  None = no row
                        # granularity / no restriction; [] can't happen
                        # here (rg_can_match was True on the same masks).
                        nrows = int(r["pg_nrows"])
                        rngs = page_prober.surviving_ranges(
                            r["file"], r["row_group"], nrows,
                            pred_list, look,
                        )
                        if rngs and sum(e - s for s, e in rngs) < nrows:
                            ranges = [[int(s), int(e)] for s, e in rngs]
                if explain:
                    kept.append(
                        {
                            "file": r["file"],
                            "row_group": r["row_group"],
                            "total_byte_size": r["total_byte_size"],
                            "pj_tier": tier or "kept",
                        }
                    )
                elif keep:
                    kept.append(
                        {
                            "file": r["file"],
                            "row_group": r["row_group"],
                            "total_byte_size": r["total_byte_size"],
                            "pj_ranges": ranges,
                        }
                    )
            yield pa.RecordBatch.from_pylist(kept, schema=out_arrow)

    return sel.mapInArrow(probe, out_schema)


# --------------------------------------------------------------------------
# writer: enrich an existing file with standard bloom filters
# --------------------------------------------------------------------------


def _bitset_bytes(ndv: int, fpp: float) -> int:
    """Bitset size for a target false-positive rate: the split-block
    formula from the format spec (parquet-mr's ``optimalNumOfBits``),
    rounded up to a power of two, clamped to [32 B, 128 MB]."""
    import math

    ndv = max(1, int(ndv))
    fpp = min(max(fpp, 1e-9), 0.5)
    # bits/value for a blocked bloom at fpp (spec: m/n = c(e));
    # parquet-mr uses the closed form below
    bits = ndv * (-8.0 / math.log(1.0 - fpp ** (1.0 / 8.0)))
    nbytes = 1 << max(5, math.ceil(math.log2(max(bits, 256.0) / 8.0)))
    return min(nbytes, _MAX_BITSET)


def _bloom_blob(values_hashes, nbytes: int) -> bytes:
    """Header + bitset for one chunk's value-hash iterable."""
    words = [0] * (nbytes >> 2)
    for h in values_hashes:
        _insert(words, h)
    header = bytearray()
    # BloomFilterHeader {1: numBytes, 2: {1: BLOCK}, 3: {1: XXHASH},
    #                    4: {1: UNCOMPRESSED}} — all compact thrift
    _encode_field_header(header, 1, 5, 0)  # CT_I32
    _write_zigzag(header, nbytes)
    for fid in (2, 3, 4):
        _encode_field_header(header, fid, 12, fid - 1)  # CT_STRUCT
        _encode_field_header(header, 1, 12, 0)
        header.append(0)  # empty member struct STOP
        header.append(0)  # union STOP
    # trailing struct STOP emitted by caller? no — header IS the struct
    header.append(0)
    return bytes(header) + struct.pack(f"<{nbytes >> 2}I", *words)


def _chunk_hashes(path: str, rg_idx: int, col_name: str, physical_type: str):
    """xxh64 of every distinct value in one (row group, column), via
    pyarrow — build-time enrichment reads the column once, like any
    index build."""
    import pyarrow.parquet as pq

    t = (physical_type or "").upper()
    tbl = pq.ParquetFile(path).read_row_group(rg_idx, columns=[col_name])
    col = tbl.column(0)
    out = set()
    for v in col.to_pylist():
        if v is None:
            continue
        if t == "BYTE_ARRAY":
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        elif t in ("INT32", "INT64"):
            b = struct.pack("<i" if t == "INT32" else "<q", v)
        elif t in ("FLOAT", "DOUBLE"):
            f = float(v)
            if f == 0.0:
                f = 0.0  # normalize -0.0 to +0.0 (parquet-mr does too)
            b = struct.pack("<f" if t == "FLOAT" else "<d", f)
        else:
            raise InvalidSelectionError(
                f"bloom filters unsupported for physical type {t}"
            )
        out.add(xxh64(b))
    return out


def add_bloom_filters(
    path: str, columns: list[str], fpp: float = 0.01
) -> int:
    """Enrich an existing parquet file with standard split-block bloom
    filters for ``columns``, in place: bitsets append after the data
    (where writers put them), and the footer is rebuilt with
    ``bloom_filter_offset``/``length`` spliced into each enriched
    ColumnMetaData — the same compact-thrift memcpy splice as the PJ_2
    footer surgery.  Files stay fully standard; parquet-mr/Spark read
    (and bloom-filter) them natively.  Columns that already carry a
    filter are skipped.  Returns the number of (row group, column)
    chunks enriched.

    Exists because no in-container writer can produce bloom filters
    (pyarrow 16 / DuckDB 1.0 predate write support) — and as the
    production answer for data ALREADY at rest: a 100 TB catalog gets
    point-lookup pruning without rewriting a single data page."""
    import os

    from palletjack_spark.errors import InvalidSelectionError as _ISE

    footer = read_footer_bytes(path)
    file_size = os.path.getsize(path)
    footer_start = file_size - 8 - len(footer)
    _fields, rg_elems = footer_spans(footer)

    # column name -> leaf ordinal, physical type (from pyarrow: names in
    # footer schema order == chunk order)
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    if md.num_row_groups == 0:
        return 0  # an empty part file has nothing to enrich
    names = [
        md.row_group(0).column(j).path_in_schema
        for j in range(md.num_columns)
    ]
    ptypes = [
        md.row_group(0).column(j).physical_type
        for j in range(md.num_columns)
    ]
    import pyarrow as pa

    pf_schema = pq.ParquetFile(path).schema_arrow
    #: arrow types whose plain encoding IS the raw value space the
    #: probe hashes (the writer-side mirror of the probe's
    #: _IDENTITY_LOGICAL gate — round-13 review: DATE/TIMESTAMP/DECIMAL/
    #: unsigned columns previously crashed mid-enrichment with a raw
    #: struct.error instead of a typed rejection)
    _writer_ok = (
        pa.types.is_int32,
        pa.types.is_int64,
        pa.types.is_float32,
        pa.types.is_float64,
        pa.types.is_string,
        pa.types.is_large_string,
        pa.types.is_binary,
        pa.types.is_large_binary,
    )
    targets = []
    for c in columns:
        if c not in names:
            raise _ISE(f"Unknown column for bloom filter: {c!r}")
        try:
            ftype = pf_schema.field(c).type
        except KeyError:
            # a NESTED leaf ("s.x"): present in the chunk path names but
            # not an arrow top-level field — typed rejection, not a raw
            # KeyError mid-enrichment (round-16 sweep)
            raise _ISE(
                f"bloom filters unsupported for nested column {c!r}"
            ) from None
        if not any(ok(ftype) for ok in _writer_ok):
            raise _ISE(
                f"bloom filters unsupported for column {c!r} of type "
                f"{ftype} (non-identity logical types — date/timestamp/"
                "decimal/unsigned — have no raw-value bloom encoding)"
            )
        targets.append((names.index(c), c))

    # build blobs; record (rg, col) -> (offset-in-appendix, length)
    appendix = bytearray()
    placed: dict[tuple[int, int], tuple[int, int]] = {}
    for rg_idx in range(md.num_row_groups):
        for col_idx, col_name in targets:
            if bloom_offsets(footer, rg_idx, col_idx) is not None:
                continue  # already enriched
            hashes = _chunk_hashes(path, rg_idx, col_name, ptypes[col_idx])
            blob = _bloom_blob(hashes, _bitset_bytes(len(hashes), fpp))
            placed[(rg_idx, col_idx)] = (len(appendix), len(blob))
            appendix += blob
    if not placed:
        return 0

    # splice offsets into each enriched ColumnMetaData: re-emit the
    # struct's fields in order with 14/15 inserted (raw byte copy for
    # everything else — compact-thrift values are position-independent)
    edits = []  # (start, end, replacement) over the footer bytes
    for (rg_idx, col_idx), (rel, ln) in placed.items():
        got = _column_meta_spans(footer, rg_idx, col_idx)
        if got is None:
            raise _ISE("unparseable ColumnMetaData during bloom splice")
        md_fields, start, end = got
        new = bytearray()
        prev = 0
        emitted = False

        def _emit_bloom(out, prev_fid):
            _encode_field_header(out, 14, 6, prev_fid)  # CT_I64
            _write_zigzag(out, footer_start + rel)
            _encode_field_header(out, 15, 5, 14)  # CT_I32
            _write_zigzag(out, ln)
            return 15

        for fid, ctype, s, e in md_fields:
            if fid in (14, 15):
                continue  # replaced below (shouldn't exist: skipped above)
            if fid > 15 and not emitted:
                prev = _emit_bloom(new, prev)
                emitted = True
            _encode_field_header(new, fid, ctype, prev)
            if ctype not in (1, 2):  # bool fields carry value in header
                new += footer[s:e]
            prev = fid
        if not emitted:
            prev = _emit_bloom(new, prev)
        new.append(0)  # struct STOP
        edits.append((start, end, bytes(new)))

    edits.sort()
    out_footer = bytearray()
    pos = 0
    for s, e, rep in edits:
        out_footer += footer[pos:s]
        out_footer += rep
        pos = e
    out_footer += footer[pos:]

    # rewrite tail: data stays untouched; appendix lands where the old
    # footer began (exactly where bloom offsets point), then the new
    # footer + length + magic — via the crash-atomic temp-copy + rename
    # (safe under task retries / speculative re-runs, round-12 ADVICE)
    from palletjack_spark.index.footer_splice import atomic_tail_rewrite

    atomic_tail_rewrite(
        path,
        footer_start,
        bytes(appendix)
        + bytes(out_footer)
        + struct.pack("<I", len(out_footer))
        + b"PAR1",
    )
    return len(placed)


from palletjack_spark.errors import InvalidSelectionError  # noqa: E402


def add_bloom_filters_dataset(
    spark, paths, columns: list[str], fpp: float = 0.01
) -> int:
    """Distributed :func:`add_bloom_filters` over a whole dataset: ship
    the file list to executors and let each enrich its files in place —
    the 100 TB story for data at rest: every file gains point-lookup
    pruning without a single data page moving over the network or being
    rewritten.  (A rare legitimate RDD use: per-file imperative footer
    surgery, no dataframe semantics to express.)  Returns the total
    number of (row group, column) chunks enriched."""
    from palletjack_spark.sources.arrow_scan import expand_paths

    files = expand_paths(paths)
    if not files:
        return 0
    sc = spark.sparkContext
    cols = list(columns)
    return (
        sc.parallelize(files, min(len(files), sc.defaultParallelism))
        .map(lambda p: add_bloom_filters(p, cols, fpp))
        .sum()
    )
