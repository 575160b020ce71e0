"""Page-index (ColumnIndex/OffsetIndex) pruning (round 11, q03h): the
ENVELOPE-GAP layout — per-page value bands far apart inside a row group,
so the row-group [min, max] covers a literal no individual page holds.
Stats keep everything, plain-encoded chunks defeat the dictionary tier,
no blooms exist; only per-page envelopes prove row groups empty.  Every
unknown keeps, so results are identical with pruning on or off."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_DIR  # noqa: F401  (session fixture import)


def _gap_fixture(tmp_path, name="gap.parquet", bands=16, band_rows=1024):
    """4 row groups × (bands/4) pages: row group r holds value bands
    ``b ≡ r (mod 4)`` — every rg's envelope spans ~the whole domain
    while pages stay band-tight.  Pages are forced to band boundaries
    (write_batch_size == band size, 1-byte data_page_size)."""
    path = str(tmp_path / name)
    n = bands * band_rows
    vals = list(range(n))
    schema = pa.schema([("k", pa.int64()), ("tag", pa.string())])
    w = pq.ParquetWriter(
        path,
        schema,
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=band_rows,
    )
    for r in range(4):
        rows = []
        for b in range(r, bands, 4):
            rows.extend(vals[b * band_rows : (b + 1) * band_rows])
        w.write_table(
            pa.table(
                {
                    "k": pa.array(rows, type=pa.int64()),
                    "tag": pa.array([f"t{v:07d}" for v in rows]),
                },
                schema=schema,
            ),
            row_group_size=len(rows),
        )
    w.close()
    return path


def test_parse_pins_pyarrow_layout(tmp_path):
    """ColumnIndex/OffsetIndex parse must reproduce the writer's page
    bands exactly — bounds, null flags, first-row ordinals."""
    from palletjack_spark.index.footer_splice import read_footer_bytes
    from palletjack_spark.index.pageprune import (
        page_index_offsets,
        read_column_index,
        read_offset_index,
    )

    path = _gap_fixture(tmp_path)
    footer = read_footer_bytes(path)
    offs = page_index_offsets(footer, 0, 0)
    assert offs is not None
    ci = read_column_index(path, offs[0], offs[1], "INT64")
    # rg0 holds bands 0, 4, 8, 12
    assert ci["mins"] == [0, 4096, 8192, 12288]
    assert ci["maxs"] == [1023, 5119, 9215, 13311]
    assert ci["null_pages"] == [False] * 4
    assert ci["null_counts"] == [0] * 4
    oi = read_offset_index(path, offs[2], offs[3])
    assert oi == [0, 1024, 2048, 3072]
    # string column parses too (truncation-safe raw bytes)
    offs_s = page_index_offsets(footer, 0, 1)
    ci_s = read_column_index(path, offs_s[0], offs_s[1], "BYTE_ARRAY")
    assert ci_s["mins"][0] == b"t0000000"


def test_pinned_skip_counts(tmp_path):
    """The q03h contract: stats keep all 4 row groups (envelopes span
    the literal), the page tier keeps EXACTLY the owning one — for
    equality, IN, and pure ranges — and pins 1 of 4 surviving pages."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.metadata_index import MetadataIndex
    from palletjack_spark.index.pageprune import PageProber, page_prune_rows

    path = _gap_fixture(tmp_path)
    _f, rgs = _extract_file_rows(path)
    assert len(rgs) == 4
    # 5632 = band 5 center -> row group 1 (bands 1, 5, 9, 13), page 1
    for pred in (
        [("k", "=", 5632)],
        [("k", "in", [5632, 5633])],
        [("k", ">=", 5600), ("k", "<=", 5700)],
        [("tag", "=", "t0005632")],
    ):
        stats_kept = [r for r in rgs if MetadataIndex._keep_local(r, pred)]
        assert len(stats_kept) == 4, pred  # stats tier is blind here
        page_kept = page_prune_rows(stats_kept, pred)
        assert [r["row_group"] for r in page_kept] == [1], pred
    # the row-granular selection: 1 of 4 pages in the surviving rg
    prober = PageProber()
    meta = next(c for c in rgs[1]["columns"] if c["name"] == "k")
    look = lambda n: (0, meta) if n == "k" else None  # noqa: E731
    ranges = prober.surviving_ranges(
        path, 1, rgs[1]["num_rows"], [("k", "=", 5632)], look
    )
    assert ranges == [(1024, 2048)]
    # an absent-from-everywhere value prunes all four row groups
    assert page_prune_rows(rgs, [("k", "=", 10**9)]) == []
    # multi-column intersection: k's page 1 of rg1 vs tag range in a
    # DIFFERENT band of rg1 -> provably disjoint rows, rg pruned
    both = [("k", "=", 5632), ("tag", "<", "t0001000")]
    assert page_prune_rows(rgs, both) == []


def test_end_to_end_read_equals_pruning_off(spark, tmp_path):
    """Full read() equality with the tier on vs off — pruning is a pure
    optimization."""
    from palletjack_spark import build_index

    path = _gap_fixture(tmp_path)
    idx = build_index(spark, path)
    for pred in (
        [("k", "=", 5632)],
        [("k", ">=", 4100), ("k", "<=", 4200)],
        [("k", "!=", 0)],
        [("tag", "=", "t0005632")],
    ):
        on = idx.read(columns=["k", "tag"], predicate=pred)
        off = idx.read(
            columns=["k", "tag"], predicate=pred, dictionary_prune=False
        )
        assert sorted(map(tuple, on.collect())) == sorted(
            map(tuple, off.collect())
        ), pred


def test_plan_variant_prunes_executor_side(spark, tmp_path):
    """value_prune_plan's page leg: the catalog-scale path reaches the
    same verdicts — including a PURE-RANGE predicate, which the dict
    and bloom tiers can't probe at all."""
    from palletjack_spark import build_index
    from palletjack_spark.index.bloomprune import value_prune_plan

    path = _gap_fixture(tmp_path)
    idx = build_index(spark, path)
    for pred, survivors in (
        ([("k", "=", 5632)], [1]),
        ([("k", ">=", 4100), ("k", "<=", 4200)], [0]),
        ([("k", ">=", 0)], [0, 1, 2, 3]),
    ):
        plan = idx.prune(predicate=pred)
        got = sorted(
            r["row_group"] for r in value_prune_plan(plan, pred).collect()
        )
        assert got == survivors, pred


def test_null_page_and_null_count_semantics(tmp_path):
    """An all-NULL page fails every value conjunct (and not_null) but
    passes is_null; zero-null pages fail is_null."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.pageprune import page_prune_rows

    path = str(tmp_path / "nulls.parquet")
    # page 0: values, page 1: all NULL, page 2: values
    col = list(range(1024)) + [None] * 1024 + list(range(4096, 5120))
    w = pq.ParquetWriter(
        path,
        pa.schema([("k", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    w.write_table(
        pa.table({"k": pa.array(col, pa.int64())}), row_group_size=len(col)
    )
    w.close()
    _f, rgs = _extract_file_rows(path)
    # 2000 sits between page 0's and page 2's bands; the NULL page can't
    # hold it either -> the whole row group is provably empty
    assert page_prune_rows(rgs, [("k", "=", 2000)]) == []
    # values present in real pages keep
    assert len(page_prune_rows(rgs, [("k", "=", 100)])) == 1
    # is_null keeps (the NULL page exists); not_null keeps (value pages)
    assert len(page_prune_rows(rgs, [("k", "is_null")])) == 1
    assert len(page_prune_rows(rgs, [("k", "not_null")])) == 1


def test_no_nulls_fails_is_null(tmp_path):
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.pageprune import page_prune_rows

    path = _gap_fixture(tmp_path, name="nonull.parquet")
    _f, rgs = _extract_file_rows(path)
    assert page_prune_rows(rgs, [("k", "is_null")]) == []


def test_truncated_byte_array_bounds_stay_sound(tmp_path):
    """Strings past the writer's 64-byte column-index truncation: the
    prefix-min / incremented-max remain valid envelope bounds — present
    values keep, far-outside values prune."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.pageprune import page_prune_rows

    path = str(tmp_path / "trunc.parquet")
    prefix = "p" * 70  # > 64-byte truncation window
    vals = [f"{prefix}{i:05d}" for i in range(2048)]
    w = pq.ParquetWriter(
        path,
        pa.schema([("s", pa.string())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    w.write_table(pa.table({"s": pa.array(vals)}), row_group_size=2048)
    w.close()
    _f, rgs = _extract_file_rows(path)
    # every stored value must keep (truncation can't fake a miss)
    for probe in (vals[0], vals[1024], vals[2047]):
        assert len(page_prune_rows(rgs, [("s", "=", probe)])) == 1
    # a value before every prefix prunes; one after the incremented
    # max prunes too
    assert page_prune_rows(rgs, [("s", "=", "a")]) == []
    assert page_prune_rows(rgs, [("s", "=", "q")]) == []
    # exclusion on a truncated single-page bound must NOT fire a fake
    # single-valued proof (min != incremented max)
    assert len(page_prune_rows(rgs, [("s", "!=", vals[0])])) == 1


def test_identity_logical_gate_and_float_rules(tmp_path):
    """Non-identity logical re-encodings never probe; float pages never
    exclusion-prune; NaN literals keep."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.pageprune import page_prune_rows

    path = str(tmp_path / "types.parquet")
    import decimal

    n = 2048
    w = pq.ParquetWriter(
        path,
        pa.schema(
            [
                ("d", pa.decimal128(9, 2)),  # INT32-backed, non-identity
                ("f", pa.float64()),
                ("u", pa.uint32()),  # unsigned-as-signed, non-identity
            ]
        ),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    w.write_table(
        pa.table(
            {
                "d": pa.array(
                    [decimal.Decimal(i) / 100 for i in range(n)],
                    pa.decimal128(9, 2),
                ),
                "f": pa.array([float(i) for i in range(n)], pa.float64()),
                "u": pa.array(range(n), pa.uint32()),
            }
        ),
        row_group_size=n,
    )
    w.close()
    _f, rgs = _extract_file_rows(path)
    # decimal + unsigned: the gate refuses, absurd literals still keep
    assert len(page_prune_rows(rgs, [("d", "=", 10**9)])) == 1
    assert len(page_prune_rows(rgs, [("u", "=", -5)])) == 1
    # float ranges DO prune (engine-parity doctrine)...
    assert page_prune_rows(rgs, [("f", ">", 1e9)]) == []
    # ...but exclusion and NaN literals never do
    assert len(page_prune_rows(rgs, [("f", "!=", 0.0)])) == 1
    assert len(page_prune_rows(rgs, [("f", "=", float("nan"))])) == 1


def test_single_valued_page_exclusion(tmp_path):
    """!=/NOT IN prune a row group whose every page is provably
    single-valued and excluded — the page-granular mirror of the stats
    tier's lo == hi proof."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.pageprune import page_prune_rows

    path = str(tmp_path / "const.parquet")
    w = pq.ParquetWriter(
        path,
        pa.schema([("c", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    # rg0: pages of constant 7 and constant 9; rg1: constant 11
    w.write_table(
        pa.table({"c": pa.array([7] * 1024 + [9] * 1024, pa.int64())}),
        row_group_size=2048,
    )
    w.write_table(
        pa.table({"c": pa.array([11] * 1024, pa.int64())}),
        row_group_size=1024,
    )
    w.close()
    _f, rgs = _extract_file_rows(path)
    kept = page_prune_rows(rgs, [("c", "not_in", [7, 9])])
    assert [r["row_group"] for r in kept] == [1]
    assert len(page_prune_rows(rgs, [("c", "!=", 11)])) == 1


def test_absent_index_keeps(tmp_path):
    """Files written without a page index are untouched — absence is
    unknown, unknown keeps."""
    from palletjack_spark.index.builder import _extract_file_rows
    from palletjack_spark.index.footer_splice import read_footer_bytes
    from palletjack_spark.index.pageprune import (
        page_index_offsets,
        page_prune_rows,
    )

    path = str(tmp_path / "noidx.parquet")
    pq.write_table(
        pa.table({"k": pa.array(range(4096), pa.int64())}),
        path,
        row_group_size=1024,
        write_page_index=False,
    )
    assert page_index_offsets(read_footer_bytes(path), 0, 0) is None
    _f, rgs = _extract_file_rows(path)
    assert len(page_prune_rows(rgs, [("k", "=", 10**9)])) == len(rgs)


def test_corruption_fuzz_never_crashes(tmp_path):
    """Random byte damage across the page-index region: every probe
    must either parse or degrade to keep — never raise."""
    from palletjack_spark.index.footer_splice import read_footer_bytes
    from palletjack_spark.index.pageprune import (
        PageProber,
        page_index_offsets,
    )

    path = _gap_fixture(tmp_path, name="fuzz.parquet", bands=8)
    footer = read_footer_bytes(path)
    offs = page_index_offsets(footer, 0, 0)
    raw = bytearray(open(path, "rb").read())
    rng = random.Random(11)
    meta = {"physical_type": "INT64", "logical_type": "NONE"}
    look = lambda n: (0, meta)  # noqa: E731
    lo = offs[0]
    hi = (offs[2] or offs[0]) + (offs[3] or offs[1])
    for _ in range(120):
        dmg = bytearray(raw)
        for _k in range(rng.randint(1, 6)):
            pos = rng.randrange(lo, hi)
            dmg[pos] = rng.randrange(256)
        p = str(tmp_path / "dmg.parquet")
        with open(p, "wb") as fh:
            fh.write(dmg)
        prober = PageProber()
        # must not raise, whatever the verdict
        prober.rg_can_match(p, 0, 2048, [("k", "=", 123)], look)
        prober.surviving_ranges(p, 0, 2048, [("k", "=", 123)], look)


def test_datasource_plans_through_page_tier(spark, tmp_path):
    """format("palletjack") planning reaches the page tier: a pushed
    range filter inside an envelope gap plans only the owning row
    group — granularity the dictionary/bloom legs can't provide."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from palletjack_spark.sources.python_datasource import (
        PalletJackReader,
        register_datasource,
    )

    register_datasource(spark)
    path = _gap_fixture(tmp_path, name="ds.parquet")
    df = spark.read.format("palletjack").load(path)
    r = PalletJackReader([path], df.schema)
    list(r.pushFilters([EqualTo(("k",), 5632)]))
    assert [p.value for p in r.partitions()] == [(path, [1])]
    got = df.where(F.col("k") == 5632).collect()
    assert [(x["k"], x["tag"]) for x in got] == [(5632, "t0005632")]


def test_smart_read_routes_through_page_tier(spark, tmp_path):
    """The auto-routed surface reaches the page tier: a smart_read
    point lookup over the gap fixture returns exactly the true rows."""
    from palletjack_spark import build_index
    from palletjack_spark.index.smart import smart_read

    path = _gap_fixture(tmp_path, name="route.parquet")
    build_index(spark, path)
    got = smart_read(
        spark, path, columns=["k", "tag"], predicate=[("k", "=", 5632)]
    ).collect()
    assert [(r["k"], r["tag"]) for r in got] == [(5632, "t0005632")]
