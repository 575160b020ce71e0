"""Dictionary-page row-group pruning for equality predicates.

Min/max stats cannot prune an equality predicate on a high-cardinality
column whose values interleave across row groups — every row group's
[min, max] spans the literal even though most contain no matching row.
Parquet already stores the exact answer in a tiny place: the column
chunk's DICTIONARY PAGE.  When a chunk is *fully* dictionary-encoded,
the dictionary is the complete value set of the chunk, so
``literal not in dictionary`` is a PROOF the row group holds no match.

This module reads ONLY the dictionary-page bytes
(``[dictionary_page_offset, data_page_offset)`` — typically a few KB)
of row groups that survive stats pruning, using the same compact-thrift
span machinery as the footer splice (:mod:`footer_splice`):

1. *Soundness evidence*: ``ColumnMetaData.encoding_stats`` (field 13)
   must show every DATA_PAGE/DATA_PAGE_V2 encoded as
   PLAIN_DICTIONARY/RLE_DICTIONARY.  A chunk that fell back to PLAIN
   mid-write (dictionary overflow) holds values OUTSIDE the dictionary,
   so pruning would be wrong — such chunks, and writers that omit
   encoding_stats, conservatively return "unknown" and are kept.
2. *Probe*: parse the dictionary PageHeader (compact thrift), decompress
   the page with the chunk's codec, PLAIN-decode the values
   (length-prefixed for BYTE_ARRAY, fixed-width for INT32/INT64/
   FLOAT/DOUBLE), and test membership.

Every parse/IO failure degrades to "unknown" (keep) — pruning is a pure
optimization and must never change results; the residual filter always
applies downstream.

Scale shape: the probe I/O is bounded by (surviving row groups ×
dictionary page size), reads no data pages, and is embarrassingly
parallel per chunk.  The driver-local read path (≤ 32 files) probes on
the driver with per-(file, offset) memoization; catalog-scale plans can
ship the same probe into the scan tasks — the plan rows already carry
every offset it needs.
"""

from __future__ import annotations

import struct

from palletjack_spark.index.footer_splice import (
    _decode_value,
    _list_elem_spans,
    _span_get,
    _struct_field_spans,
    footer_spans,
    read_footer_bytes,
)

#: parquet PageType enum
_PAGE_DATA, _PAGE_INDEX, _PAGE_DICT, _PAGE_DATA_V2 = 0, 1, 2, 3
#: parquet Encoding enum members that mean "values live in the dictionary"
_ENC_PLAIN = 0
_ENC_PLAIN_DICT = 2
_ENC_RLE_DICT = 8
#: parquet CompressionCodec enum -> pyarrow codec name (None = uncompressed;
#: LZO (3) has no pyarrow codec and maps to unsupported)
_CODEC_NAMES = {1: "snappy", 2: "gzip", 4: "brotli", 5: "lz4", 6: "zstd", 7: "lz4_raw"}


def _column_meta_fields(footer: bytes, rg_idx: int, col_idx: int):
    """Span list of ColumnMetaData fields for (row group, column), or
    None when the ordinals are out of range or the layout is unexpected."""
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
        md_fields, _ = _struct_field_spans(footer, md_span[1])
        return md_fields
    except Exception:
        return None


def fully_dict_encoded(footer: bytes, rg_idx: int, col_idx: int) -> bool | None:
    """True when encoding_stats PROVES every data page of the chunk is
    dictionary-encoded; False when a data page provably is not; None when
    the writer omitted encoding_stats (or the footer doesn't parse) —
    callers must treat None as "cannot prune"."""
    md_fields = _column_meta_fields(footer, rg_idx, col_idx)
    if md_fields is None:
        return None
    es_span = _span_get(md_fields, 13)  # ColumnMetaData.encoding_stats
    if es_span is None:
        return None
    try:
        _etype, spans, _ = _list_elem_spans(footer, es_span[1])
        n_data_pages = 0
        for s, _e in spans:
            pes, _ = _struct_field_spans(footer, s)
            page_type = _decode_value(footer, *_need(pes, 1))[0]
            encoding = _decode_value(footer, *_need(pes, 2))[0]
            if page_type in (_PAGE_DATA, _PAGE_DATA_V2):
                n_data_pages += 1
                if encoding not in (_ENC_PLAIN_DICT, _ENC_RLE_DICT):
                    return False
        return True if n_data_pages > 0 else None
    except Exception:
        return None


def _need(fields, fid):
    span = _span_get(fields, fid)
    if span is None:
        raise KeyError(fid)
    return span[1], span[0]


def read_dictionary(
    path: str,
    dictionary_page_offset: int,
    data_page_offset: int,
    codec: str,
    physical_type: str,
) -> list | None:
    """Decode a column chunk's dictionary values, or None when the page
    is absent, the codec/type is unsupported, or anything fails to parse.

    The read is exactly ``data_page_offset - dictionary_page_offset``
    bytes — the dictionary page (header + payload) and nothing else.
    """
    if (
        dictionary_page_offset is None
        or data_page_offset is None
        or not (0 <= dictionary_page_offset < data_page_offset)
    ):
        return None
    try:
        with open(path, "rb") as f:
            f.seek(dictionary_page_offset)
            raw = f.read(data_page_offset - dictionary_page_offset)
        header, payload_start = _struct_field_spans(raw, 0)
        page_type = _decode_value(raw, *_need(header, 1))[0]
        uncompressed = _decode_value(raw, *_need(header, 2))[0]
        compressed = _decode_value(raw, *_need(header, 3))[0]
        if page_type != _PAGE_DICT:
            return None
        dph_span = _span_get(header, 7)  # PageHeader.dictionary_page_header
        if dph_span is None:
            return None
        dph, _ = _struct_field_spans(raw, dph_span[1])
        num_values = _decode_value(raw, *_need(dph, 1))[0]
        dict_encoding = _decode_value(raw, *_need(dph, 2))[0]
        if dict_encoding not in (_ENC_PLAIN, _ENC_PLAIN_DICT):
            return None
        page = raw[payload_start : payload_start + compressed]
        if len(page) != compressed:
            return None
        codec = (codec or "UNCOMPRESSED").upper()
        if codec == "UNCOMPRESSED":
            buf = bytes(page)
        else:
            import pyarrow as pa

            name = _CODEC_NAMES.get(
                {"SNAPPY": 1, "GZIP": 2, "BROTLI": 4, "LZ4": 5, "ZSTD": 6,
                 "LZ4_RAW": 7}.get(codec, -1)
            )
            if name is None:
                return None
            buf = pa.Codec(name).decompress(page, uncompressed)
            buf = buf.to_pybytes() if hasattr(buf, "to_pybytes") else bytes(buf)
        return _plain_decode(buf, num_values, physical_type)
    except Exception:
        return None


def _plain_decode(buf: bytes, n: int, physical_type: str) -> list | None:
    t = (physical_type or "").upper()
    try:
        if t == "BYTE_ARRAY":
            out, pos = [], 0
            for _ in range(n):
                (ln,) = struct.unpack_from("<I", buf, pos)
                pos += 4
                if pos + ln > len(buf):
                    return None
                out.append(buf[pos : pos + ln])
                pos += ln
            return out
        if t in ("INT32", "INT64", "FLOAT", "DOUBLE"):
            fmt = {"INT32": "<i", "INT64": "<q", "FLOAT": "<f", "DOUBLE": "<d"}[t]
            size = struct.calcsize(fmt)
            if size * n > len(buf):
                return None
            return [struct.unpack_from(fmt, buf, i * size)[0] for i in range(n)]
        return None  # FIXED_LEN_BYTE_ARRAY / INT96 / BOOLEAN: not worth probing
    except Exception:
        return None


#: logical-type tags (builder._logical_tag) under which the RAW decoded
#: dictionary value IS the predicate literal's value space, per physical
#: type.  Anything else — DECIMAL stored as INT32/INT64 unscaled (literal
#: 5.0, stored 500), unsigned ints reinterpreted as signed, DATE/TIME/
#: TIMESTAMP re-encodings, ENUM/JSON/BSON blobs — must NOT be probed:
#: the literal would never be found and the row group would be wrongly
#: pruned, silently losing rows (round-10 ADVICE, high).  A missing tag
#: (None: index built before the field existed, or pyarrow exposed no
#: logical type) is unknown → no pruning.
_IDENTITY_LOGICAL = {
    "BYTE_ARRAY": {"NONE", "STRING"},
    "INT32": {"NONE", "INT(32,true)"},
    "INT64": {"NONE", "INT(64,true)"},
    "FLOAT": {"NONE"},
    "DOUBLE": {"NONE"},
}


def _probe_value(value, physical_type: str, logical_type: str | None):
    """The dictionary-representation of a predicate literal, or None when
    the literal's type can't be compared against this physical type — or
    when the column's logical annotation means the raw physical values
    are NOT the literal's value space (``_IDENTITY_LOGICAL``)."""
    t = (physical_type or "").upper()
    if logical_type not in _IDENTITY_LOGICAL.get(t, ()):
        return None
    if t == "BYTE_ARRAY":
        if isinstance(value, str):
            return value.encode("utf-8")
        if isinstance(value, (bytes, bytearray)):
            return bytes(value)
        return None
    if t in ("INT32", "INT64"):
        # bool is an int subclass but BOOLEAN has its own physical type
        return value if isinstance(value, int) and not isinstance(value, bool) else None
    if t in ("FLOAT", "DOUBLE"):
        import math

        if not isinstance(value, (int, float)):
            return None
        # NaN never probes: Spark treats NaN = NaN as TRUE, but a Python
        # set-membership test says nan != nan — pruning on it would drop
        # row groups whose NaN rows DO match the predicate
        if isinstance(value, float) and math.isnan(value):
            return None
        return float(value)
    return None


class DictionaryProber:
    """Memoizing prober for one planning pass: footers, encoding
    verdicts, and decoded dictionaries are each read at most once per
    (file, chunk), so a multi-row-group file costs one footer read plus
    one tiny page read per surviving chunk."""

    def __init__(self) -> None:
        self._footers: dict[str, bytes | None] = {}
        self._dicts: dict[tuple, object] = {}
        self._complete: dict[tuple, bool | None] = {}

    def _footer(self, path: str) -> bytes | None:
        if path not in self._footers:
            try:
                self._footers[path] = read_footer_bytes(path)
            except Exception:
                self._footers[path] = None
        return self._footers[path]

    def can_match(
        self, path: str, rg_idx: int, col_idx: int, col_meta: dict, value
    ) -> bool | None:
        """False = the row group PROVABLY contains no row equal to
        ``value`` (safe to skip); True/None = keep."""
        probe = _probe_value(
            value, col_meta.get("physical_type"), col_meta.get("logical_type")
        )
        if probe is None:
            return None
        d = self._dictionary(path, rg_idx, col_idx, col_meta)
        if d is None:
            return None
        return probe in d

    def _dictionary(self, path: str, rg_idx: int, col_idx: int, col_meta: dict):
        """The chunk's decoded dictionary as a set, or None when the chunk
        isn't provably fully dictionary-encoded or the page can't be read."""
        ckey = (path, rg_idx, col_idx)
        if ckey not in self._complete:
            footer = self._footer(path)
            self._complete[ckey] = (
                fully_dict_encoded(footer, rg_idx, col_idx)
                if footer is not None
                else None
            )
        if self._complete[ckey] is not True:
            return None
        dkey = (path, col_meta.get("dictionary_page_offset"))
        if dkey not in self._dicts:
            self._dicts[dkey] = read_dictionary(
                path,
                col_meta.get("dictionary_page_offset"),
                col_meta.get("data_page_offset"),
                col_meta.get("codec"),
                col_meta.get("physical_type"),
            )
            if self._dicts[dkey] is not None:
                self._dicts[dkey] = set(self._dicts[dkey])
        return self._dicts[dkey]

    def all_excluded(
        self, path: str, rg_idx: int, col_idx: int, col_meta: dict, values
    ) -> bool | None:
        """True = EVERY value in the chunk's dictionary is in ``values``
        (so no row can satisfy ``!= v`` / ``NOT IN (values)`` — NULL rows
        don't satisfy them either); False/None = keep.

        Sound even with unused dictionary entries: every data value IS
        some dictionary entry, so "all entries excluded" covers every row
        a writer could have referenced."""
        probes = [
            _probe_value(
                v, col_meta.get("physical_type"), col_meta.get("logical_type")
            )
            for v in values
        ]
        if any(p is None for p in probes):
            return None
        d = self._dictionary(path, rg_idx, col_idx, col_meta)
        if d is None:
            return None
        return d.issubset(set(probes))


def _equality_conjuncts(predicate) -> list[tuple[str, list]]:
    """(column, candidate values) per conjunct the dictionary can decide:
    ``=`` has one candidate; ``in`` has its member list — the row group
    prunes only when EVERY candidate is provably absent."""
    eq: list[tuple[str, list]] = []
    for col, op, *vals in predicate:
        if op in ("=", "==") and vals:
            eq.append((col, [vals[0]]))
        elif op == "in" and vals and list(vals[0]):
            eq.append((col, list(vals[0])))
    return eq


def _exclusion_conjuncts(predicate) -> list[tuple[str, list]]:
    """(column, excluded values) per ``!=``/``<>``/``not_in`` conjunct —
    the row group prunes when the dictionary is provably a SUBSET of the
    excluded values (single-value dictionary chunks are common in log
    data, where a whole file carries one constant)."""
    ex: list[tuple[str, list]] = []
    for col, op, *vals in predicate:
        if op in ("!=", "<>") and vals:
            ex.append((col, [vals[0]]))
        elif op == "not_in" and vals and list(vals[0]):
            ex.append((col, list(vals[0])))
    return ex


def _dict_conjuncts(predicate) -> list[tuple[str, list, str]]:
    """All conjuncts the dictionary can decide, as (column, values, mode):
    mode ``'eq'`` prunes when EVERY candidate is provably absent; mode
    ``'ex'`` prunes when the dictionary is provably a subset of the
    excluded values."""
    return [(c, v, "eq") for c, v in _equality_conjuncts(predicate)] + [
        (c, v, "ex") for c, v in _exclusion_conjuncts(predicate)
    ]


def _conjunct_prunes(prober, path, rg_idx, col_idx, col_meta, values, mode):
    """True when this single conjunct PROVES the row group matchless."""
    if mode == "eq":
        return all(
            prober.can_match(path, rg_idx, col_idx, col_meta, v) is False
            for v in values
        )
    return prober.all_excluded(path, rg_idx, col_idx, col_meta, values) is True


def dict_prune_rows(
    rg_rows: list[dict], predicate, prober: DictionaryProber | None = None
) -> list[dict]:
    """Drop row-group rows whose dictionaries PROVE an equality/IN
    conjunct can't match, or an exclusion (!=/NOT IN) conjunct excludes
    the whole dictionary.  Other conjuncts, unknown columns, and every
    "unknown" verdict keep the row — identical results either way."""
    conj = _dict_conjuncts(predicate)
    if not conj:
        return rg_rows
    prober = prober or DictionaryProber()
    out = []
    for r in rg_rows:
        keep = True
        for col_name, values, mode in conj:
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
                r["columns"][col_idx], values, mode,
            ):
                keep = False
                break
        if keep:
            out.append(r)
    return out


#: column-chunk metadata the DICTIONARY tier's executor probe needs
_DICT_META_FIELDS = (
    "dictionary_page_offset",
    "data_page_offset",
    "codec",
    "physical_type",
    "logical_type",
)
#: the subset the bloom/page tiers need (offsets come from the footer)
_VALUE_META_FIELDS = ("physical_type", "logical_type")
_FIELD_SHORT = {
    "dictionary_page_offset": "dpo",
    "data_page_offset": "dao",
    "codec": "codec",
    "physical_type": "ptype",
    "logical_type": "ltype",
}


def plan_meta_columns(plan, col_names, prefix: str, fields) -> list:
    """Per-conjunct column-chunk metadata as FLAT plan columns — the
    shared builder behind every executor-side value-pruning plan
    (dict_prune_plan, bloom_prune_plan, value_prune_plan; previously
    triplicated, round-13 deferral).  For each probed column name the
    requested ``fields`` surface as ``{prefix}_{short}_{i}`` plus the
    chunk ordinal ``{prefix}_cix_{i}``;
    :func:`meta_from_row` reassembles the probe-side dict.

    F.get, not element_at: a conjunct on a PARTITION key (or any column
    absent from the file schema) filters to an EMPTY array, and ANSI
    element_at throws on it — get() yields NULL, which every probe
    treats as "unknown -> keep".  Sidecars written before the
    ``logical_type`` field existed can't prove the identity mapping —
    ship NULL, same conservative verdict."""
    from pyspark.sql import functions as F

    try:
        elem = plan.schema["columns"].dataType.elementType
        has_ltype = "logical_type" in elem.fieldNames()
    except Exception:
        has_ltype = False
    out = []
    for i, col_name in enumerate(col_names):
        match = F.get(
            F.filter("columns", lambda c: c["name"] == F.lit(col_name)), 0
        )
        for f in fields:
            col = (
                F.lit(None).cast("string")
                if f == "logical_type" and not has_ltype
                else match[f]
            )
            out.append(col.alias(f"{prefix}_{_FIELD_SHORT[f]}_{i}"))
        out.append(
            (
                F.array_position(
                    F.transform("columns", lambda c: c["name"]), col_name
                )
                - 1
            ).alias(f"{prefix}_cix_{i}")
        )
    return out


def meta_from_row(r: dict, prefix: str, i: int, fields) -> dict:
    """Probe-side inverse of :func:`plan_meta_columns`: the flat row's
    ``{prefix}_*_{i}`` values as the chunk-meta dict the probers take."""
    return {f: r[f"{prefix}_{_FIELD_SHORT[f]}_{i}"] for f in fields}


def dict_prune_plan(plan, predicate):
    """Catalog-scale variant: filter a pruned PLAN DataFrame (file,
    row_group, total_byte_size, columns) by probing dictionaries
    EXECUTOR-side — the selection never touches the driver, matching
    ``scan_plan``'s contract.  Each task's prober memoizes footers and
    dictionary pages, and the scan that follows re-opens the same files,
    so the probe's footer read is amortized against work the scan pays
    anyway; the page reads are the tiny price for skipping whole row
    groups.  Returns a plan with the same (file, row_group,
    total_byte_size) columns; without equality conjuncts it is the
    input, untouched."""
    conj = _dict_conjuncts(predicate)
    if not conj:
        return plan

    import pyarrow as pa

    meta_cols = plan_meta_columns(
        plan, [c for c, _v, _m in conj], "pj", _DICT_META_FIELDS
    )
    sel = plan.select("file", "row_group", "total_byte_size", *meta_cols)
    out_schema = "file string, row_group int, total_byte_size long"
    out_arrow = pa.schema(
        [("file", pa.string()), ("row_group", pa.int32()),
         ("total_byte_size", pa.int64())]
    )
    values = [(vs, mode) for _c, vs, mode in conj]

    def probe(batches):
        prober = DictionaryProber()
        for b in batches:
            rows = b.to_pylist()
            kept = []
            for r in rows:
                keep = True
                for i, (cand, mode) in enumerate(values):
                    cix = r[f"pj_cix_{i}"]
                    if cix is None or cix < 0:
                        continue
                    meta = meta_from_row(r, "pj", i, _DICT_META_FIELDS)
                    if _conjunct_prunes(
                        prober, r["file"], r["row_group"], int(cix),
                        meta, cand, mode,
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
