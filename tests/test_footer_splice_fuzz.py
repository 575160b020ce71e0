"""Property-based fuzz of the pruned-FileMetaData splice.

The fixed-shape permutation sweep (test_footer_splice.py) mirrors the
reference's differential; this extends it across WRITER VARIATIONS the
sweep can't cover — random schemas (nullable ints, strings, bools,
timestamps), row-group counts/sizes, compression codecs, dictionary
encoding, statistics on/off — because the splice walks real Thrift spans
and any layout assumption breaks on some writer configuration (the
reference guards this with a foreign-writer fixture, test_palletjack.py:
135-153; hypothesis explores the space instead of pinning one file).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from palletjack_spark.index.footer_splice import read_metadata

_COL_POOL = ("i64", "f64", "str", "bool", "ts", "i32_nulls")


def _make_column(kind: str, n: int, rng: np.random.Generator) -> pa.Array:
    if kind == "i64":
        return pa.array(rng.integers(-(2**40), 2**40, n), type=pa.int64())
    if kind == "f64":
        return pa.array(rng.random(n))
    if kind == "str":
        return pa.array(
            [f"v{int(x)}" * (int(x) % 3 + 1) for x in rng.integers(0, 99, n)]
        )
    if kind == "bool":
        return pa.array(rng.integers(0, 2, n).astype(bool))
    if kind == "ts":
        return pa.array(rng.integers(0, 2**45, n), type=pa.timestamp("us"))
    if kind == "i32_nulls":
        vals = rng.integers(0, 1000, n).astype(object)
        for i in range(0, n, 3):
            vals[i] = None
        return pa.array(vals, type=pa.int32())
    raise AssertionError(kind)


@st.composite
def _case(draw):
    n_rg = draw(st.integers(1, 5))
    chunk = draw(st.integers(1, 40))
    kinds = draw(
        st.lists(st.sampled_from(_COL_POOL), min_size=1, max_size=5)
    )
    codec = draw(st.sampled_from(["NONE", "snappy", "zstd"]))
    use_dict = draw(st.booleans())
    stats = draw(st.booleans())
    seed = draw(st.integers(0, 2**31 - 1))
    rgs = draw(
        st.lists(st.integers(0, n_rg - 1), min_size=1, max_size=n_rg, unique=True)
    )
    n_cols = len(kinds)
    cols = draw(
        st.lists(st.integers(0, n_cols - 1), min_size=0, max_size=n_cols, unique=True)
    )
    return n_rg, chunk, kinds, codec, use_dict, stats, seed, rgs, cols


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_case())
def test_spliced_read_equals_direct(case):
    import tempfile

    n_rg, chunk, kinds, codec, use_dict, stats, seed, rgs, col_idx = case
    rng = np.random.default_rng(seed)
    n = n_rg * chunk
    table = pa.table(
        {f"c{i}_{k}": _make_column(k, n, rng) for i, k in enumerate(kinds)}
    )
    path = os.path.join(tempfile.mkdtemp(prefix="pjs_fuzz_"), "fuzz.parquet")
    pq.write_table(
        table,
        path,
        row_group_size=chunk,
        compression=codec,
        use_dictionary=use_dict,
        write_statistics=stats,
    )

    md = read_metadata(
        parquet_path=path, row_groups=rgs, column_indices=col_idx or None
    )
    pr = pq.ParquetReader()
    pr.open(path, metadata=md)
    got = pr.read_all()
    pr.close()

    # the splice honors the REQUESTED column order (palletjack.cc:459-490)
    names = (
        [table.column_names[c] for c in col_idx]
        if col_idx
        else list(table.column_names)
    )
    want = pa.concat_tables(
        [table.select(names).slice(r * chunk, chunk) for r in rgs]
    )
    assert got.equals(want), (kinds, codec, use_dict, stats, rgs, col_idx)


def test_pjs1_corruption_never_crashes(tmp_path):
    """Round-9 deep fuzz: any byte corruption/truncation of a PJS1 blob
    — container fields OR the embedded footer the stored spans point
    into — must fail with the library's typed errors, never a raw
    struct.error / IndexError / pyarrow ArrowInvalid escaping through
    read_metadata.  (The PJ_2 path had this decode-cap contract from
    round 7; the PJS1 path and the splice layer gained it here after a
    2500-example sweep found six untyped crash classes.)"""
    from hypothesis import given

    from palletjack_spark.errors import IndexFormatError, InvalidSelectionError
    from palletjack_spark.index.footer_splice import (
        generate_metadata_index,
        read_metadata,
    )

    rng = np.random.default_rng(7)
    path = str(tmp_path / "f.parquet")
    pq.write_table(
        pa.table(
            {
                "a": pa.array(rng.integers(0, 2**40, 200), type=pa.int64()),
                "b": pa.array([f"s{i % 17}" for i in range(200)]),
                "c": pa.array(rng.random(200)),
            }
        ),
        path,
        row_group_size=40,
    )
    blob = bytes(generate_metadata_index(path))

    @settings(max_examples=150, deadline=None)
    @given(
        edits=st.lists(
            st.tuples(st.integers(0, len(blob) - 1), st.integers(0, 255)),
            min_size=1,
            max_size=12,
        ),
        truncate=st.integers(0, len(blob)),
        rgs=st.lists(st.integers(0, 4), max_size=5, unique=True),
        cols=st.lists(st.integers(0, 2), max_size=3, unique=True),
    )
    def check(edits, truncate, rgs, cols):
        b = bytearray(blob)
        for pos, val in edits:
            b[pos] = val
        b = bytes(b[:truncate]) if truncate < len(b) else bytes(b)
        try:
            read_metadata(index_data=b, row_groups=rgs, column_indices=cols)
        except (InvalidSelectionError, IndexFormatError):
            pass  # typed rejection is the contract

    check()

    # the six fuzz-found falsifying shapes, pinned as regressions
    import pytest

    for edits, truncate in [
        ([(4, 0)], 4),      # truncated footer-length field
        ([(4, 0)], 8),      # flen edit -> top-count read past the end
        ([(4, 0)], 1548),   # flen edit -> span table truncated
        ([(6, 0)], 1967),   # truncated row-group count
        ([(6, 0)], 1971),   # truncated span count
        ([(6, 0)], 1975),   # truncated span entry
    ]:
        b = bytearray(blob)
        for pos, val in edits:
            b[pos] = val
        with pytest.raises((InvalidSelectionError, IndexFormatError)):
            read_metadata(index_data=bytes(b[:truncate]))

    # a clean blob still reads exactly after the hardening
    md = read_metadata(index_data=blob, row_groups=[1], column_indices=[0, 2])
    assert md.num_rows == 40 and md.num_columns == 2
