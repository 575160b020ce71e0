"""Metadata-index tests mirroring the reference's strategy (SURVEY §5):
permutation differential (indexed read == native read for every small
row-group × column selection — test_palletjack.py:58-107), round-trip
identity (:109-133), golden index-content regression (:210-248), error
paths (:155-208), and schema API (:251-318)."""

from __future__ import annotations

import itertools
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palletjack_spark import build_index, load_index, read_parquet_arrow
from palletjack_spark.errors import IndexFormatError, InvalidSelectionError
from palletjack_spark.sources.arrow_scan import read_schema_arrow
from tests.conftest import SF_DIR

N_ROW_GROUPS = 5
N_COLUMNS = 7


@pytest.fixture(scope="module")
def perm_file(tmp_path_factory):
    """Reference permutation fixture: 5 row groups x 7 double columns,
    one row per row group (test_palletjack.py:14-16,42-54)."""
    path = str(tmp_path_factory.mktemp("perm") / "perm.parquet")
    cols = {
        f"column_{c}": [float(rg * 10 + c) for rg in range(N_ROW_GROUPS)]
        for c in range(N_COLUMNS)
    }
    table = pa.table(cols)
    pq.write_table(
        table,
        path,
        row_group_size=1,
        use_dictionary=False,
        write_statistics=True,
        store_schema=False,
    )
    return path


@pytest.fixture(scope="module")
def perm_index(spark, perm_file):
    return build_index(spark, perm_file)


def _native(perm_file, row_groups, columns):
    pf = pq.ParquetFile(perm_file)
    tbl = pf.read_row_groups(row_groups, columns=columns)
    return tbl.to_pandas()


def test_permutation_differential(spark, perm_file, perm_index):
    """Every permutation of <=2 row groups x <=2 columns (bounded like the
    reference's <=3 sweep, :101-107): indexed read equals native pyarrow."""
    rg_perms = [
        list(p)
        for n in (1, 2)
        for p in itertools.permutations(range(N_ROW_GROUPS), n)
    ]
    col_perms = [
        [f"column_{i}" for i in p]
        for n in (1, 2)
        for p in itertools.permutations(range(N_COLUMNS), n)
    ]
    # sample the cross product to keep runtime sane but deterministic
    cases = [
        (rgs, cols)
        for i, rgs in enumerate(rg_perms)
        for j, cols in enumerate(col_perms)
        if (i + j) % 7 == 0
    ]
    assert len(cases) > 50
    for rgs, cols in cases:
        got = (
            perm_index.read(row_groups=rgs, columns=cols)
            .toPandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        want = (
            _native(perm_file, rgs, cols).sort_values(cols).reset_index(drop=True)
        )
        assert got.equals(want), (rgs, cols, got, want)
        assert list(got.columns) == cols  # request order preserved (cc:459-490)


def test_roundtrip_identity(spark, perm_file, perm_index):
    """Select-everything == native full read (test_palletjack.py:109-133)."""
    got = perm_index.read().toPandas().sort_values("column_0").reset_index(drop=True)
    want = pq.read_table(perm_file).to_pandas()
    assert got.equals(want)


def test_column_indices_selection(spark, perm_file, perm_index):
    got = perm_index.read(row_groups=[1, 3], column_indices=[6, 0]).toPandas()
    assert list(got.columns) == ["column_6", "column_0"]
    assert sorted(got["column_0"].tolist()) == [10.0, 30.0]


def test_error_paths(spark, perm_index, perm_file):
    """Reference error semantics (test_palletjack.py:155-208)."""
    with pytest.raises(InvalidSelectionError, match="out of range"):
        perm_index.read(row_groups=[N_ROW_GROUPS])
    with pytest.raises(InvalidSelectionError, match="out of range"):
        perm_index.read(column_indices=[N_COLUMNS])
    with pytest.raises(InvalidSelectionError, match="Unknown column"):
        perm_index.read(columns=["nope"])
    with pytest.raises(InvalidSelectionError, match="both"):
        perm_index.read(columns=["column_0"], column_indices=[0])
    with pytest.raises(InvalidSelectionError, match="out of range"):
        perm_index.read(row_groups=[-1])


def test_not_an_index_dir(spark, tmp_path):
    with pytest.raises(IndexFormatError):
        load_index(spark, str(tmp_path))


def test_schema_api(spark, perm_index, perm_file):
    """Schema reads from index == pyarrow schema (test_palletjack.py:251-318)."""
    full = perm_index.read_schema()
    assert [f.name for f in full.fields] == [f"column_{i}" for i in range(N_COLUMNS)]
    pruned = perm_index.read_schema(columns=["column_3", "column_1"])
    assert [f.name for f in pruned.fields] == ["column_3", "column_1"]
    by_idx = perm_index.read_schema(column_indices=[2])
    assert [f.name for f in by_idx.fields] == ["column_2"]
    assert read_schema_arrow(perm_file).fieldNames() == full.fieldNames()


def test_persisted_index_roundtrip(spark, perm_file, tmp_path):
    """File-form index == in-memory index (test_palletjack.py:320-332)."""
    index_dir = str(tmp_path / "idx")
    idx = build_index(spark, perm_file, index_dir=index_dir)
    assert os.path.exists(os.path.join(index_dir, "row_groups"))
    mem = build_index(spark, perm_file)
    a = idx.row_groups.orderBy("file", "row_group").toPandas()
    b = mem.row_groups.orderBy("file", "row_group").toPandas()
    assert a.equals(b)


def test_golden_index_content(spark, perm_file, perm_index):
    """Golden-master analogue (test_palletjack.py:210-248): the index rows
    for a fixed input are value-stable."""
    rows = perm_index.row_groups.orderBy("row_group").collect()
    assert [r["num_rows"] for r in rows] == [1] * N_ROW_GROUPS
    first_cols = rows[0]["columns"]
    assert [c["name"] for c in first_cols] == [
        f"column_{i}" for i in range(N_COLUMNS)
    ]
    assert all(c["physical_type"] == "DOUBLE" for c in first_cols)
    assert [c["min_num"] for c in first_cols] == [float(c) for c in range(N_COLUMNS)]
    files = perm_index.files.collect()
    assert files[0]["num_row_groups"] == N_ROW_GROUPS
    assert files[0]["num_rows"] == N_ROW_GROUPS


def test_stats_pruning_skips_row_groups(spark, perm_index):
    """Predicate pruning touches only matching row groups (R4 semantics)."""
    plan = perm_index.prune(predicate=[("column_0", "between", 10.0, 30.0)])
    assert plan.count() == 3  # row groups 1..3
    df = perm_index.read(predicate=[("column_0", "between", 10.0, 30.0)])
    assert sorted(r["column_0"] for r in df.collect()) == [10.0, 20.0, 30.0]


def test_count_rows_metadata_only(spark, perm_index):
    got = perm_index.count_rows().collect()[0]
    assert got["num_rows"] == N_ROW_GROUPS and got["num_row_groups"] == N_ROW_GROUPS


def test_read_parquet_arrow_direct(spark, perm_file):
    """Ad-hoc arrow scan without an index (R12 path)."""
    df = read_parquet_arrow(spark, perm_file, row_groups=[0, 4], columns=["column_2"])
    assert sorted(r["column_2"] for r in df.collect()) == [2.0, 42.0]


def test_incremental_build_indexes_new_files_only(spark, tmp_path):
    """incremental=True re-indexes only files absent from the sidecar
    (the nightly-ingest path at 100 TB)."""
    import shutil

    from palletjack_spark.index.builder import build_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(f"{SF_DIR}/nation.parquet", f"{data}/nation.parquet")
    idx_dir = str(tmp_path / "idx")
    idx1 = build_index(spark, data, index_dir=idx_dir)
    assert idx1.files.count() == 1
    shutil.copy(f"{SF_DIR}/region.parquet", f"{data}/region.parquet")
    idx2 = build_index(spark, data, index_dir=idx_dir, incremental=True)
    files = sorted(r["file"] for r in idx2.files.select("file").collect())
    assert len(files) == 2 and files[0].endswith("nation.parquet")
    # re-running with nothing new is a no-op returning the loaded index
    idx3 = build_index(spark, data, index_dir=idx_dir, incremental=True)
    assert idx3.files.count() == 2


def test_incremental_build_refreshes_rewritten_file(spark, tmp_path):
    """Round-6 verdict "What's missing" 1: a file rewritten IN PLACE
    (q09b compaction / q09c upsert / q09d overwrite all do this — same
    path, new content) must be re-extracted by an incremental build, not
    skipped as already-indexed with silently stale row-group stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index.builder import build_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    path = f"{data}/part.parquet"
    pq.write_table(
        pa.table({"v": pa.array(range(100), type=pa.int64())}),
        path,
        row_group_size=50,
    )
    idx_dir = str(tmp_path / "idx")
    idx1 = build_index(spark, data, index_dir=idx_dir)
    # stale check would prune everything for v >= 150 (old max is 99)
    assert idx1.prune(predicate=[("v", ">=", 150)]).count() == 0

    # q09b-style rewrite in place: same path, entirely new value range
    pq.write_table(
        pa.table({"v": pa.array(range(100, 200), type=pa.int64())}),
        path,
        row_group_size=50,
    )
    idx2 = build_index(spark, data, index_dir=idx_dir, incremental=True)
    assert idx2.files.count() == 1
    # the refreshed stats route the predicate to exactly one row group,
    # and the indexed read matches a native read of the rewritten data
    assert idx2.prune(predicate=[("v", ">=", 150)]).count() == 1
    got = sorted(r["v"] for r in idx2.read(predicate=[("v", ">=", 150)]).collect())
    want = sorted(
        r["v"]
        for r in spark.read.parquet(path).where("v >= 150").collect()
    )
    assert got == want and len(got) == 50


def test_extract_detects_rewrite_during_footer_parse(tmp_path, monkeypatch):
    """Round-8 ADVICE (medium): the file identity (size, mtime_ns) must be
    stat'ed BEFORE the footer parse, and a rewrite that lands DURING the
    parse must fail loudly instead of committing torn stats under the new
    identity (which _stale_and_deleted would then never flag)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.index import builder

    path = str(tmp_path / "part.parquet")
    pq.write_table(pa.table({"v": pa.array(range(10), type=pa.int64())}), path)
    st_orig = os.stat(path)

    real_open = builder._open_footer

    def rewrite_then_open(p):
        pf = real_open(p)
        pq.write_table(
            pa.table({"v": pa.array(range(100, 120), type=pa.int64())}), p
        )
        os.utime(p, ns=(st_orig.st_atime_ns, st_orig.st_mtime_ns + 7))
        return pf

    monkeypatch.setattr(builder, "_open_footer", rewrite_then_open)
    with pytest.raises(IndexFormatError, match="rewritten during"):
        builder._extract_file_rows(path)

    # sanity: without the concurrent rewrite the recorded identity is the
    # pre-parse stat (the safe direction for _stale_and_deleted)
    monkeypatch.setattr(builder, "_open_footer", real_open)
    file_row, _ = builder._extract_file_rows(path)
    st_now = os.stat(path)
    assert file_row["file_size"] == st_now.st_size
    assert file_row["mtime_ns"] == st_now.st_mtime_ns


def test_chunked_extract_detects_rewrites(spark, tmp_path, monkeypatch):
    """Round-9 ADVICE (medium): with n_chunks > 1 EVERY chunk must guard
    its own parse (pre/post stat), and a rewrite landing BETWEEN two
    chunks' parses — each individually clean — must be caught by the
    driver-side cross-chunk identity compare before rows are committed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.index import builder

    path = str(tmp_path / "multi.parquet")

    def write_orig():
        pq.write_table(
            pa.table({"v": pa.array(range(100), type=pa.int64())}),
            path,
            row_group_size=25,
        )

    write_orig()
    st_orig = os.stat(path)
    real_open = builder._open_footer

    def rewrite_then_open(p):
        pf = real_open(p)
        pq.write_table(
            pa.table({"v": pa.array(range(50), type=pa.int64())}),
            p,
            row_group_size=25,
        )
        os.utime(p, ns=(st_orig.st_atime_ns, st_orig.st_mtime_ns + 7))
        return pf

    # (a) a rewrite during a NON-ZERO chunk's parse fails that task loudly
    # (pre-fix only chunk 0 carried the guard)
    monkeypatch.setattr(builder, "_open_footer", rewrite_then_open)
    with pytest.raises(IndexFormatError, match="rewritten during"):
        builder._extract_file_rows(path, chunk=1, n_chunks=4)
    monkeypatch.setattr(builder, "_open_footer", real_open)

    # (b) a rewrite BETWEEN chunk parses: both tasks pass their own
    # pre/post guard but observe different identities — _validate_combined
    # must reject the mixed-version rows
    write_orig()
    frow, rgs0 = builder._extract_file_rows(path, chunk=0, n_chunks=2)
    _, rgs1 = builder._extract_file_rows(path, chunk=1, n_chunks=2)
    frow["kind"] = "file"
    rows = [frow]
    for r in rgs0 + rgs1:
        r["kind"] = "rg"
        rows.append(r)
    for r in rgs1:  # as if chunk 1 parsed a version rewritten in place
        r["mtime_ns"] += 99
    combined = spark.createDataFrame(rows, builder._COMBINED_SCHEMA)
    with pytest.raises(IndexFormatError, match="different file versions"):
        builder._validate_combined(combined)
    # same rows with agreeing identities validate clean
    for r in rgs1:
        r["mtime_ns"] -= 99
    builder._validate_combined(
        spark.createDataFrame(rows, builder._COMBINED_SCHEMA)
    )


def test_incremental_build_purges_deleted_file(spark, tmp_path):
    """A file deleted since indexing must have its rows purged from both
    sidecar datasets by the next incremental build (round-6 verdict)."""
    import shutil

    from palletjack_spark.index.builder import build_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(f"{SF_DIR}/nation.parquet", f"{data}/nation.parquet")
    shutil.copy(f"{SF_DIR}/region.parquet", f"{data}/region.parquet")
    idx_dir = str(tmp_path / "idx")
    idx1 = build_index(spark, data, index_dir=idx_dir)
    assert idx1.files.count() == 2

    os.remove(f"{data}/region.parquet")
    idx2 = build_index(spark, data, index_dir=idx_dir, incremental=True)
    files = [r["file"] for r in idx2.files.select("file").collect()]
    assert files == [f"{data}/nation.parquet"]
    rg_files = {
        r["file"] for r in idx2.row_groups.select("file").collect()
    }
    assert rg_files == {f"{data}/nation.parquet"}


def test_incremental_listing_is_not_driver_materialized(spark, tmp_path):
    """Round-3 verdict item 5: the incremental build must not collect the
    persisted file list to the driver.  The plan shape is a broadcast
    semi-join with the CANDIDATES on the broadcast side, so driver memory
    is bounded by the candidate list, never by the index catalog size."""
    import shutil

    from palletjack_spark.index.builder import _already_indexed, build_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(f"{SF_DIR}/nation.parquet", f"{data}/nation.parquet")
    idx_dir = str(tmp_path / "idx")
    build_index(spark, data, index_dir=idx_dir)

    cands = [f"{data}/nation.parquet", f"{data}/other.parquet"]
    got = _already_indexed(spark, cands, idx_dir)
    assert got == {f"{data}/nation.parquet"}

    # plan assertion: files/ is probed through a broadcast semi-join
    existing = spark.read.parquet(os.path.join(idx_dir, "files")).select("file")
    from pyspark.sql import functions as F

    cand = spark.createDataFrame([(f,) for f in cands], "file string")
    plan = (
        existing.join(F.broadcast(cand), "file", "left_semi")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_distributed_read_plan_not_driver_materialized(spark, monkeypatch):
    """Round-4 verdict item 5: a distributed index read must not collect
    the pruned (file, row_group) task list to the driver — the plan
    DataFrame drives the scan executor-side, and the only driver read
    during planning is a single two-scalar aggregate row (via toArrow).
    DataFrame.collect is poisoned for the duration of the read to prove
    no O(selected) materialization happens."""
    from pyspark.sql import DataFrame as SparkDataFrame

    from palletjack_spark.index.builder import build_index

    path = f"{SF_DIR}/lineitem.parquet"
    idx = build_index(spark, path, use_cache=False, driver_fast_path=False)
    idx._file_rows()  # pre-warm the (bounded) files cache

    native = spark.read.parquet(path)
    expected_rows = native.count()
    expected_sum = native.groupBy().sum("l_quantity").collect()[0][0]

    def poisoned(self, *a, **k):
        raise AssertionError(
            "DataFrame.collect during distributed index read planning — "
            "the row-group list must stay executor-side"
        )

    monkeypatch.setattr(SparkDataFrame, "collect", poisoned)
    try:
        df = idx.read(columns=["l_quantity"])
        got = df.groupBy().sum("l_quantity").toArrow().to_pylist()[0]
    finally:
        monkeypatch.undo()
    assert abs(got["sum(l_quantity)"] - expected_sum) < 1e-6
    assert idx.read().count() == expected_rows
    idx.unpersist()


def test_driver_and_executor_builds_agree(spark):
    """The driver fast path and the distributed path produce identical
    index content (same differential guarantee as the reference's
    file/in-memory index forms, test_palletjack.py:73-80)."""
    from palletjack_spark.index.builder import build_index

    path = f"{SF_DIR}/lineitem.parquet"
    a = build_index(spark, path, use_cache=False, driver_fast_path=True)
    b = build_index(spark, path, use_cache=False, driver_fast_path=False)
    pa_ = a.row_groups.orderBy("file", "row_group").toPandas()
    pb = b.row_groups.orderBy("file", "row_group").toPandas()
    assert pa_.drop(columns=["columns"]).equals(pb.drop(columns=["columns"]))
    assert pa_["columns"].apply(len).equals(pb["columns"].apply(len))
    fa = a.files.toPandas().drop(columns=["arrow_schema"])
    fb = b.files.toPandas().drop(columns=["arrow_schema"])
    assert fa.equals(fb)


def test_mixed_schema_index_requires_file_selection(spark):
    """One index over two tables with different schemas: schema-dependent
    reads must name their files instead of silently using the first
    file's schema."""
    li, od = f"{SF_DIR}/lineitem.parquet", f"{SF_DIR}/orders.parquet"
    idx = build_index(spark, [li, od], use_cache=False)
    # metadata-only ops work across schemas
    assert idx.count_rows().count() == 2
    with pytest.raises(InvalidSelectionError, match="distinct schemas"):
        idx.read()
    with pytest.raises(InvalidSelectionError, match="distinct schemas"):
        idx.read_schema()
    # restricted to one file, reads work
    got = idx.read(files=[od], columns=["o_orderkey"]).count()
    want = spark.read.parquet(od).count()
    assert got == want
    assert idx.read_schema(files=[li]).fieldNames()[0] == "l_orderkey"


def test_compaction_reduces_file_count(spark):
    """q09b: the 4-file staged events dir compacts to ceil(bytes/64MB)
    files (1 at test scale) with a lossless checksum."""
    import glob
    import os
    import tempfile

    from palletjack_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    REGISTRY["q09b_compaction"].fn(spark, SF_DIR).collect()
    key = SF_DIR.strip("/").replace("/", "_")
    out = os.path.join(tempfile.gettempdir(), f"pjspark_{key}_q09b_compacted")
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) == 1, files


def test_smart_read_routes_by_selectivity(spark, tmp_path):
    """smart_read: a stats-selective predicate over a sorted multi-row-group
    file routes to the indexed mapInArrow scan; a keep-everything predicate
    routes to the native parquet source.  Both return exactly the rows a
    plain scan+filter would."""
    from palletjack_spark.index import smart_read
    from palletjack_spark.tables import load_table

    out = str(tmp_path / "li_sorted")
    (
        load_table(spark, SF_DIR, "lineitem")
        .orderBy("l_orderkey")
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .parquet(out)
    )
    idx = build_index(spark, out)
    n_rgs = len(idx._local[0])
    assert n_rgs > 4, f"fixture produced only {n_rgs} row groups"

    tight = [("l_orderkey", "<=", 100)]
    broad = [("l_orderkey", ">=", 0)]
    d_tight = smart_read(spark, out, predicate=tight, index=idx)
    d_broad = smart_read(spark, out, predicate=broad, index=idx)
    plan_tight = d_tight._sc._jvm.PythonSQLUtils.explainString(
        d_tight._jdf.queryExecution(), "simple"
    )
    plan_broad = d_broad._sc._jvm.PythonSQLUtils.explainString(
        d_broad._jdf.queryExecution(), "simple"
    )
    assert "MapInArrow" in plan_tight and "Scan parquet" not in plan_tight
    assert "Scan parquet" in plan_broad and "MapInArrow" not in plan_broad

    expect_tight = (
        load_table(spark, SF_DIR, "lineitem").where("l_orderkey <= 100").count()
    )
    assert d_tight.count() == expect_tight
    assert d_broad.count() == load_table(spark, SF_DIR, "lineitem").count()


def test_smart_read_routing_stats_are_aggregate_only(spark, tmp_path, monkeypatch):
    """Round-5 verdict item 3: for a catalog-scale (distributed) index the
    smart_read ROUTING decision must be a one-row aggregate over the index
    DataFrame — never a per-file or per-row-group driver collect.  Spy on
    DataFrame.collect/first: every driver read during routing must return
    O(1) rows regardless of file count, and ``_file_rows`` (full files/
    rows including arrow-schema blobs) must never be touched."""
    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from palletjack_spark.index import smart_read
    from palletjack_spark.index.metadata_index import MetadataIndex

    out = str(tmp_path / "many_files")
    (
        spark.range(0, 240)
        .withColumn("val", F.col("id") * 2)
        .repartition(24)
        .write.parquet(out)
    )
    idx = build_index(spark, out, driver_fast_path=False, use_cache=False)
    assert idx._local is None, "fixture must exercise the distributed form"

    collected: list[int] = []
    orig_collect = _DF.collect

    def spy_collect(self):
        rows = orig_collect(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(_DF, "collect", spy_collect)
    monkeypatch.setattr(
        MetadataIndex,
        "_file_rows",
        lambda self: (_ for _ in ()).throw(
            AssertionError("smart_read must not collect O(files) rows")
        ),
    )

    # selective predicate -> indexed route; keep-all predicate -> native
    # fallback (which may list O(files) PATH STRINGS via toArrow, but no
    # full rows and no unbounded collect)
    d_tight = smart_read(spark, out, predicate=[("id", "<", 3)], index=idx)
    d_broad = smart_read(spark, out, predicate=[("id", ">=", 0)], index=idx)
    assert all(n <= 1 for n in collected), collected
    monkeypatch.undo()
    assert d_tight.count() == 3
    assert d_broad.count() == 240
    idx.unpersist()


# ---------------------------------------------------------------------------
# encrypted parquet (reference test_palletjack.py:334-364) and golden master
# (:210-248)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def encrypted_file(tmp_path_factory):
    """A REAL encrypted parquet file via pyarrow's modular encryption —
    end-to-end analogue of the reference's KMS-stub test."""
    import base64

    pe = pytest.importorskip("pyarrow.parquet.encryption")

    class _Kms(pe.KmsClient):
        def __init__(self, config):
            super().__init__()

        def wrap_key(self, key_bytes, master_key_identifier):
            return base64.b64encode(key_bytes).decode()

        def unwrap_key(self, wrapped_key, master_key_identifier):
            return base64.b64decode(wrapped_key)

    factory = pe.CryptoFactory(lambda cfg: _Kms(cfg))
    kms_cfg = pe.KmsConnectionConfig(
        custom_kms_conf={"footer": "f", "col": "c"}
    )
    enc_cfg = pe.EncryptionConfiguration(
        footer_key="footer", column_keys={"col": ["a"]}
    )
    props = factory.file_encryption_properties(kms_cfg, enc_cfg)
    path = str(tmp_path_factory.mktemp("enc") / "encrypted.parquet")
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    with pq.ParquetWriter(path, t.schema, encryption_properties=props) as w:
        w.write_table(t)
    return path


def test_encrypted_parquet_rejected_by_build_index(spark, encrypted_file):
    from palletjack_spark.errors import EncryptedParquetError

    with pytest.raises(EncryptedParquetError):
        build_index(spark, encrypted_file)


def test_encrypted_parquet_rejected_by_arrow_scan(spark, encrypted_file):
    from palletjack_spark.errors import EncryptedParquetError

    with pytest.raises(EncryptedParquetError):
        read_parquet_arrow(spark, encrypted_file).collect()


def test_encrypted_parquet_rejected_by_footer_splice(encrypted_file):
    from palletjack_spark.errors import EncryptedParquetError
    from palletjack_spark.index.footer_splice import (
        generate_metadata_index,
        read_footer_bytes,
    )

    with pytest.raises(EncryptedParquetError):
        read_footer_bytes(encrypted_file)
    with pytest.raises(EncryptedParquetError):
        generate_metadata_index(encrypted_file)


_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data")


def test_golden_sidecar_bytes_stable():
    """Reference golden master (test_palletjack.py:210-248): the PJS1 index
    generated for the committed fixture must be byte-identical to the
    committed artifact — pins the sidecar format across refactors."""
    from palletjack_spark.index.footer_splice import generate_metadata_index

    golden_pq = os.path.join(_GOLDEN_DIR, "golden.parquet")
    golden_idx = os.path.join(_GOLDEN_DIR, "golden.parquet.index")
    with open(golden_idx, "rb") as f:
        committed = f.read()
    regenerated = generate_metadata_index(golden_pq)
    assert bytes(regenerated) == committed, (
        "PJS1 sidecar bytes changed — if intentional, regenerate "
        "tests/data/golden.parquet.index and document the format bump"
    )


def test_golden_sidecar_reads_correctly():
    """The committed index must still splice valid pruned metadata."""
    from palletjack_spark.index.footer_splice import read_metadata

    golden_pq = os.path.join(_GOLDEN_DIR, "golden.parquet")
    golden_idx = os.path.join(_GOLDEN_DIR, "golden.parquet.index")
    full = pq.ParquetFile(golden_pq).read()
    md = read_metadata(golden_idx, row_groups=[1, 3], column_indices=[0, 2])
    got = pq.ParquetFile(golden_pq, metadata=md).read()
    want = pa.concat_tables(
        [
            full.select(["g_int", "g_str"]).slice(12, 12),
            full.select(["g_int", "g_str"]).slice(36, 12),
        ]
    )
    assert got.equals(want)
    assert md.num_rows == 24


def test_clustered_write_produces_disjoint_key_ranges(spark):
    """Q07b: after repartitionByRange + sortWithinPartitions, every output
    file covers a disjoint l_orderkey range — the property that lets a
    key-range read prune to ~1 file from footer stats alone."""
    import glob as _g

    import pyarrow.parquet as pq

    from palletjack_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    REGISTRY["q07b_clustered_write"].fn(spark, SF_DIR).collect()
    out = None
    import tempfile, os
    for d in _g.glob(os.path.join(tempfile.gettempdir(), "pjspark_*q07b_clustered*")):
        out = d
    assert out, "clustered output dir not found"
    ranges = []
    for f in sorted(_g.glob(os.path.join(out, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "l_orderkey"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (ranges, "overlapping file key ranges")


def test_zorder_write_skips_on_secondary_column(spark):
    """Q07c: after z-ordering on (orderkey, partkey), each file covers a
    compact RECTANGLE — its partkey span must be well under the full
    domain (linear orderkey clustering leaves every file spanning ~all
    partkeys, skipping nothing on the secondary column)."""
    import glob as _g
    import os
    import tempfile

    import pyarrow.parquet as pq

    from palletjack_spark.queries import REGISTRY
    from tests.conftest import SF_DIR

    REGISTRY["q07c_zorder_write"].fn(spark, SF_DIR).collect()
    out = None
    for d in _g.glob(os.path.join(tempfile.gettempdir(), "pjspark_*q07c_zorder*")):
        out = d
    assert out, "z-order output dir not found"
    spans, lo_all, hi_all = [], float("inf"), 0
    for f in sorted(_g.glob(os.path.join(out, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "l_partkey":
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
        lo_all = min(lo_all, min(mins))
        hi_all = max(hi_all, max(maxs))
    assert len(spans) >= 8
    domain = hi_all - lo_all
    avg_span = sum(hi - lo for lo, hi in spans) / len(spans)
    # 16 z-range files over 2 dims → each file covers ~1/4 of each dim;
    # assert comfortably under the linear-clustering span (~domain)
    assert avg_span < 0.6 * domain, (avg_span, domain, spans)


def test_empty_row_group_selection_distributed(spark):
    """Explicit row_groups=[] on a distributed index: empty result (the
    pre-round-5 behavior), not a ValueError from the bounds check."""
    from palletjack_spark.index.builder import build_index

    idx = build_index(
        spark, f"{SF_DIR}/nation.parquet", use_cache=False,
        driver_fast_path=False,
    )
    assert idx.read(row_groups=[]).count() == 0
    idx.unpersist()


def test_pick_chunks_probes_largest_file(tmp_path):
    """Fan-out sizing probes the LARGEST file: a small first file must not
    serialize the footer walk of a big sibling (round-5 review fix), and
    the stride floor keeps tiny footers from over-fanning."""
    import numpy as np

    from palletjack_spark.index.builder import (
        _FOOTER_CHUNKS,
        _MIN_RGS_PER_CHUNK,
        _pick_chunks,
    )

    small = str(tmp_path / "small.parquet")
    big = str(tmp_path / "big.parquet")
    t1 = pa.table({"x": np.arange(8.0)})
    pq.write_table(t1, small, row_group_size=8)  # 1 row group
    t2 = pa.table({"x": np.arange(4096.0)})
    pq.write_table(t2, big, row_group_size=16)  # 256 row groups
    # small listed FIRST: probe must still find big's 256 row groups
    assert _pick_chunks([small, big], par=64) == min(
        _FOOTER_CHUNKS, 64 // 2, -(-256 // _MIN_RGS_PER_CHUNK)
    )
    # single tiny footer: no fan-out beyond its row-group count
    assert _pick_chunks([small], par=64) == 1
    # many files: one unit per file, no fan-out
    assert _pick_chunks([small] * 100, par=32) == 1


def test_catalog_bucketed_sidecar_prunes_partitions(spark, tmp_path):
    """catalog_buckets > 0: the persisted sidecar partitions by
    file_bucket = hash60(file) % N, a point-file selection partition-
    prunes the sidecar scan (PartitionFilters on file_bucket), reads
    stay correct, and an incremental append inherits the layout."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from palletjack_spark.index.builder import build_index, load_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    for t in ("nation", "region", "supplier"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{data}/{t}.parquet")
    idx_dir = str(tmp_path / "idx")
    idx = build_index(spark, data, index_dir=idx_dir, catalog_buckets=4)
    assert idx.catalog_buckets == 4
    assert "file_bucket" in idx.row_groups.columns

    target = f"{data}/nation.parquet"
    want_bucket = int(hashlib.md5(target.encode()).hexdigest()[:15], 16) % 4
    # spark-side bucket must equal the driver-side portable hash
    got_bucket = (
        idx.files.where(F.col("file") == target)
        .select("file_bucket")
        .collect()[0][0]
    )
    assert got_bucket == want_bucket

    # partition pruning reaches the sidecar scan
    plan = idx.prune(files=[target])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "file_bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan

    # correctness: bucketed read == native read
    native = spark.read.parquet(target)
    got = idx.read(files=[target])
    assert got.count() == native.count()
    assert idx.read_schema(files=[target]).fieldNames() == native.columns

    # incremental append keeps the layout without re-passing the arg
    shutil.copy(f"{SF_DIR}/customer.parquet", f"{data}/customer.parquet")
    idx2 = build_index(spark, data, index_dir=idx_dir, incremental=True)
    assert idx2.catalog_buckets == 4
    assert idx2.files.count() == 4
    idx3 = load_index(spark, idx_dir)
    assert idx3.catalog_buckets == 4


def test_bucketed_sidecar_write_is_clustered(spark, tmp_path):
    """The bucketed sidecar write clusters rows by file_bucket first, so
    each bucket directory holds ONE parquet file per build — not one per
    (extract task × bucket), which fanned a 32-task build × 16 buckets
    into ~512 tiny files per dataset (guide §6 small-files: parquet
    writer setup per file on write, per-file open on every load)."""
    import glob as _glob
    import shutil

    data = str(tmp_path / "data")
    os.makedirs(data)
    for t in ("nation", "region", "supplier", "customer"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{data}/{t}.parquet")
    idx_dir = str(tmp_path / "idx")
    idx = build_index(
        spark, data, index_dir=idx_dir, use_cache=False, catalog_buckets=4
    )
    for ds in ("row_groups", "files"):
        for bdir in _glob.glob(os.path.join(idx_dir, ds, "file_bucket=*")):
            parts = _glob.glob(os.path.join(bdir, "*.parquet"))
            assert len(parts) == 1, (ds, bdir, parts)
    # the churn-refresh rewrite keeps the clustered layout too
    shutil.copy(f"{SF_DIR}/part.parquet", f"{data}/nation.parquet")
    idx = build_index(spark, data, index_dir=idx_dir, incremental=True)
    for ds in ("row_groups", "files"):
        for bdir in _glob.glob(os.path.join(idx_dir, ds, "file_bucket=*")):
            parts = _glob.glob(os.path.join(bdir, "*.parquet"))
            assert len(parts) == 1, (ds, bdir, parts)
    assert idx.files.count() == 4


def test_string_predicate_prunes_row_groups(spark, tmp_path):
    """Round-5: string predicates prune via min_repr/max_repr when the
    stats_kind tag says the reprs are lexicographic text — on a file
    sorted by a string key, an equality keeps only the overlapping
    group(s), and results still equal scan+filter (residual applies)."""
    import numpy as np

    path = str(tmp_path / "sorted_str.parquet")
    keys = [f"k{i:04d}" for i in range(100)]
    t = pa.table({"k": keys, "v": np.arange(100.0)})
    pq.write_table(t, path, row_group_size=20)  # 5 groups, disjoint k ranges

    idx = build_index(spark, path, use_cache=False)
    # equality: exactly one of five groups can contain k0042
    plan = idx.prune(predicate=[("k", "=", "k0042")])
    assert plan.count() == 1
    df = idx.read(predicate=[("k", "=", "k0042")])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["v"] == 42.0
    # range: k0040..k0059 span exactly one group boundary
    plan2 = idx.prune(predicate=[("k", "between", "k0035", "k0059")])
    assert plan2.count() == 2
    got = sorted(
        r["k"] for r in idx.read(
            predicate=[("k", "between", "k0035", "k0059")]
        ).collect()
    )
    assert got == [f"k{i:04d}" for i in range(35, 60)]
    # non-ASCII value: conservative, keeps every group, still correct
    assert idx.prune(predicate=[("k", "<", "k00é")]).count() == 5
    # distributed (non-local) index prunes identically
    idx2 = build_index(
        spark, path, use_cache=False, driver_fast_path=False
    )
    assert idx2.prune(predicate=[("k", "=", "k0042")]).count() == 1
    assert idx2.read(predicate=[("k", "=", "k0042")]).count() == 1
    idx2.unpersist()


def test_hive_partitioned_dataset_indexed_reads(spark, tmp_path):
    """Round-5 partition awareness: a hive-partitioned layout indexes
    through the recursive lister, reads re-attach the key=value columns
    (string-typed, Spark's inference-off semantics), partition-key
    equality prunes at FILE level, and all results equal the native
    partitioned read."""
    from pyspark.sql import functions as F

    from palletjack_spark.index.builder import build_index
    from palletjack_spark.sources.arrow_scan import partition_values

    data = str(tmp_path / "part_ds")
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "opri", F.substring("o_orderpriority", 1, 1)
    )
    src.write.partitionBy("opri").mode("overwrite").parquet(data)

    assert partition_values(f"{data}/opri=1/x.parquet") == {"opri": "1"}

    native = spark.read.parquet(data)
    n_all = native.count()

    for fast in (True, False):
        idx = build_index(
            spark, data, use_cache=False, driver_fast_path=fast
        )
        assert idx.partition_keys() == ["opri"]
        got = idx.read()
        assert "opri" in got.columns
        assert got.count() == n_all
        # equality on the partition key: file-level pruning + exact rows
        sub = idx.read(predicate=[("opri", "=", "1")])
        want = native.where(F.col("opri") == "1")
        assert sub.count() == want.count() > 0
        # value equality row-by-row on a checksum
        a = sub.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
        b = want.agg(F.sum("o_orderkey").alias("s")).collect()[0]["s"]
        assert a == b
        # data-column predicate still prunes by stats and matches
        sub2 = idx.read(predicate=[("o_orderkey", "<=", 100.0)])
        assert sub2.count() == native.where("o_orderkey <= 100").count()
        idx.unpersist()

    # distributed path: partition equality filters the PLAN to one
    # partition's files before any footer is opened
    idx = build_index(spark, data, use_cache=False, driver_fast_path=False)
    plan = idx.prune()
    total_files = plan.select("file").distinct().count()
    filtered = idx._partition_plan_filter(plan, [("opri", "=", "1")])
    kept_files = filtered.select("file").distinct().count()
    assert 0 < kept_files < total_files
    for r in filtered.select("file").distinct().collect():
        assert "/opri=1/" in r["file"]
    idx.unpersist()


def test_read_parquet_arrow_partitioned(spark, tmp_path):
    """Ad-hoc arrow reads of a partitioned tree re-attach partition
    columns, matching the indexed read path's behavior."""
    from pyspark.sql import functions as F

    data = str(tmp_path / "padhoc")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").withColumn(
        "rk", F.col("n_regionkey").cast("string")
    ).write.partitionBy("rk").mode("overwrite").parquet(data)
    df = read_parquet_arrow(spark, data)
    assert "rk" in df.columns
    native = spark.read.parquet(data)
    assert df.count() == native.count() == 25
    a = sorted((r["n_nationkey"], r["rk"]) for r in df.collect())
    b = sorted((r["n_nationkey"], str(r["rk"])) for r in native.collect())
    assert a == b


def test_snapshot_commit_conflict_and_idempotency(tmp_path):
    """Round-5 snapshot log semantics: same-version re-commit of identical
    content is a no-op; a conflicting data_dir for an already-committed
    version raises instead of silently losing either write."""
    from palletjack_spark.queries.scans import _snapshot_commit

    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _snapshot_commit(table, 1, "/data/v1")
    _snapshot_commit(table, 1, "/data/v1")  # idempotent retry
    with pytest.raises(RuntimeError, match="conflict"):
        _snapshot_commit(table, 1, "/data/other")
    _snapshot_commit(table, 2, "/data/v2")
    entries = sorted(os.listdir(os.path.join(table, "_versions")))
    assert len(entries) == 2


def test_bucketed_catalog_unknown_file_errors(spark, tmp_path):
    """A bucketed catalog still reports unknown files / out-of-range
    ordinals through the executor-side bounds check."""
    import shutil

    from palletjack_spark.index.builder import build_index

    data = str(tmp_path / "d")
    os.makedirs(data)
    shutil.copy(f"{SF_DIR}/nation.parquet", f"{data}/nation.parquet")
    idx = build_index(
        spark, data, index_dir=str(tmp_path / "i"), catalog_buckets=4
    )
    with pytest.raises(InvalidSelectionError, match="None of the selected"):
        idx.read(files=[f"{data}/missing.parquet"], row_groups=[0]).count()
    with pytest.raises(InvalidSelectionError, match="out of range"):
        idx.read(row_groups=[99]).count()


def test_null_count_pruning(spark, tmp_path):
    """is_null / not_null predicates prune on the per-chunk null_count:
    a row group with zero nulls is skipped for IS NULL, an all-null row
    group is skipped for IS NOT NULL, and reads equal the native
    filtered scan either way."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index.builder import build_index

    data = str(tmp_path / "data")
    os.makedirs(data)
    # rg0: no nulls; rg1: mixed; rg2: all null  (row_group_size=50)
    v = list(range(50)) + [None if i % 2 else 100 + i for i in range(50)] + [None] * 50
    k = list(range(150))
    pq.write_table(
        pa.table({"k": pa.array(k, type=pa.int64()), "v": pa.array(v, type=pa.int64())}),
        f"{data}/part.parquet",
        row_group_size=50,
    )
    idx = build_index(spark, data)

    assert idx.prune(predicate=[("v", "is_null")]).count() == 2  # rg1, rg2
    assert idx.prune(predicate=[("v", "not_null")]).count() == 2  # rg0, rg1

    native = spark.read.parquet(f"{data}/part.parquet")
    got = sorted(r["k"] for r in idx.read(predicate=[("v", "is_null")]).collect())
    want = sorted(r["k"] for r in native.where("v IS NULL").collect())
    assert got == want and len(got) == 75
    got = sorted(r["k"] for r in idx.read(predicate=[("v", "not_null")]).collect())
    want = sorted(r["k"] for r in native.where("v IS NOT NULL").collect())
    assert got == want and len(got) == 75
    # combined with a stats predicate: nulls never satisfy v >= 100, and
    # the conjunction prunes to the single mixed row group
    assert (
        idx.prune(predicate=[("v", "not_null"), ("v", ">=", 100)]).count() == 1
    )


def test_incremental_rebuild_sees_rewrite_outside_candidate_roots(spark, tmp_path):
    """Round-7 review finding (confirmed by repro): the incremental-build
    memo must not bypass the stale/deleted reconciliation — a file
    rewritten in place OUTSIDE the candidate roots, with the sidecar and
    candidate stats unchanged, must still be re-extracted on the next
    incremental build of a sibling root."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index.builder import build_index

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a_dir)
    os.makedirs(b_dir)
    pq.write_table(
        pa.table({"v": pa.array(range(50), type=pa.int64())}),
        f"{a_dir}/a.parquet",
    )
    pq.write_table(
        pa.table({"v": pa.array(range(50), type=pa.int64())}),
        f"{b_dir}/b.parquet",
    )
    idx_dir = str(tmp_path / "idx")
    build_index(spark, [a_dir, b_dir], index_dir=idx_dir)
    # warm the incremental memo for candidate root A alone
    build_index(spark, a_dir, index_dir=idx_dir, incremental=True)

    # rewrite B in place: new value range, sidecar and A untouched
    pq.write_table(
        pa.table({"v": pa.array(range(100, 150), type=pa.int64())}),
        f"{b_dir}/b.parquet",
    )
    idx = build_index(spark, a_dir, index_dir=idx_dir, incremental=True)
    got = sorted(r["v"] for r in idx.read(predicate=[("v", ">=", 100)]).collect())
    assert got == list(range(100, 150)), got[:5]


def test_stat_superset_rounding_above_2_53(spark, tmp_path):
    """int64 stats above 2^53 round to-nearest under float(); mins must
    round DOWN and maxes UP (and predicate literals the opposite way) so
    strict </> pruning stays a superset of the true range (round-10
    ADVICE, medium).  Both hazards below wrongly pruned before the fix."""
    from palletjack_spark.index.builder import build_index
    from palletjack_spark.index.metadata_index import MetadataIndex

    big = 2**53
    # hazard 1: true max big+1 used to STORE as big -> ('x','>',big) pruned
    p1 = str(tmp_path / "b1.parquet")
    pq.write_table(pa.table({"x": pa.array([big + 1], pa.int64())}), p1)
    idx1 = build_index(spark, p1)
    col = idx1._local[0][0]["columns"][0]
    assert col["min_num"] <= big + 1 <= col["max_num"]
    assert MetadataIndex._keep_local(idx1._local[0][0], [("x", ">", big)])
    assert [r["x"] for r in idx1.read(predicate=[("x", ">", big)]).collect()] == [big + 1]

    # hazard 2: the LITERAL big+3 rounds UP to big+4 == the true max ->
    # ('x','>',big+3) used to prune the group holding big+4
    p2 = str(tmp_path / "b2.parquet")
    pq.write_table(pa.table({"x": pa.array([big + 4], pa.int64())}), p2)
    idx2 = build_index(spark, p2)
    assert MetadataIndex._keep_local(idx2._local[0][0], [("x", ">", big + 3)])
    assert [r["x"] for r in idx2.read(predicate=[("x", ">", big + 3)]).collect()] == [big + 4]

    # the distributed condition agrees with the local mirror
    pruned = idx2.prune(predicate=[("x", ">", big + 3)])
    assert pruned.count() == 1


def test_old_sidecar_layout_append_and_refresh(spark, tmp_path):
    """Sidecars written before the logical_type field existed must stay
    readable: an incremental append adopts the OLD nested layout (one
    schema per dataset), and a refresh (file rewritten in place) UPGRADES
    every surviving row to the new layout — either way reads stay exact
    and dictionary pruning simply stays off for legacy rows (NULL tag)."""
    from pyspark.sql import functions as F

    from palletjack_spark.index.builder import (
        _COLUMN_STAT,
        _align_columns_struct,
        build_index,
        load_index,
    )

    root = str(tmp_path / "data")
    os.makedirs(root)
    pq.write_table(
        pa.table({"v": pa.array(range(50), pa.int64())}), f"{root}/a.parquet"
    )
    idx_dir = str(tmp_path / "idx")
    build_index(spark, root, index_dir=idx_dir)

    # simulate a pre-round-10 sidecar: rewrite row_groups/ without the
    # logical_type field
    rg_path = os.path.join(idx_dir, "row_groups")
    old_fields = [f for f in _COLUMN_STAT.fields if f.name != "logical_type"]
    old = _align_columns_struct(spark.read.parquet(rg_path), old_fields)
    old.write.mode("overwrite").parquet(rg_path + "__old")
    import shutil

    shutil.rmtree(rg_path)
    os.rename(rg_path + "__old", rg_path)

    # append a new file incrementally: the OLD layout must win (one
    # nested schema in the dataset), and the loaded index reads both
    pq.write_table(
        pa.table({"v": pa.array(range(50, 100), pa.int64())}),
        f"{root}/b.parquet",
    )
    idx = build_index(spark, root, index_dir=idx_dir, incremental=True)
    elem = idx.row_groups.schema["columns"].dataType.elementType
    assert "logical_type" not in elem.fieldNames()
    got = sorted(r["v"] for r in idx.read(predicate=[("v", ">=", 40)]).collect())
    assert got == list(range(40, 100))

    # rewrite a file in place -> the refresh path upgrades the layout
    pq.write_table(
        pa.table({"v": pa.array(range(200, 250), pa.int64())}),
        f"{root}/a.parquet",
    )
    idx = build_index(spark, root, index_dir=idx_dir, incremental=True)
    elem = idx.row_groups.schema["columns"].dataType.elementType
    assert "logical_type" in elem.fieldNames()
    # legacy-surviving rows carry NULL tags; refreshed rows carry real ones
    tags = {
        r["t"]
        for r in idx.row_groups.select(
            F.explode("columns").alias("c")
        ).select(F.col("c.logical_type").alias("t")).collect()
    }
    assert tags == {None, "NONE"}
    got = sorted(r["v"] for r in idx.read(predicate=[("v", ">=", 60)]).collect())
    assert got == list(range(60, 100)) + list(range(200, 250))


def test_q03e_fixture_gc_unlinks_stale_fingerprints(spark):
    """The q03e derived fixture is fingerprint-keyed to its source; a
    create must garbage-collect fixtures keyed to SUPERSEDED fingerprints
    so a long-lived host holds exactly one (round-9 verdict)."""
    import glob

    from palletjack_spark.queries import REGISTRY
    from palletjack_spark.queries.scans import _tmp

    prefix = _tmp("q03e_dictfix", SF_DIR)
    for f in glob.glob(prefix + "_*.parquet"):
        os.unlink(f)  # force a create
    stale = prefix + "_1_1.parquet"
    with open(stale, "wb") as fh:
        fh.write(b"not a fixture")
    REGISTRY["q03e_dictionary_pruned_scan"].fn(spark, SF_DIR).collect()
    left = glob.glob(prefix + "_*.parquet")
    assert len(left) == 1 and left[0] != stale


def test_timestamp_and_date_predicates_prune_and_return_exact_rows(
    spark, tmp_path
):
    """Round-13 review: the builder indexes timestamp/date stats as
    epoch micros/days precisely so predicates can prune on them, but a
    datetime literal crashed float() with a raw TypeError — now the
    literal normalizes to the numeric projection for every pruning
    tier while the residual keeps Spark's own timestamp semantics."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "ts")
    os.makedirs(out)
    base = datetime.datetime(2024, 1, 1)
    for i in range(4):
        ts = [base + datetime.timedelta(hours=i * 100 + j) for j in range(100)]
        pq.write_table(
            pa.table(
                {
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "d": pa.array([t.date() for t in ts], pa.date32()),
                    "v": pa.array(range(i * 100, i * 100 + 100), pa.int64()),
                }
            ),
            os.path.join(out, f"part-{i}.parquet"),
        )
    for fast in (True, False):
        idx = build_index(
            spark, out, use_cache=False, driver_fast_path=fast
        )
        cut = base + datetime.timedelta(hours=350)
        df = idx.read(predicate=[("ts", ">=", cut)])
        assert df.count() == 50  # hours 350..399
        # pruning actually happened: only file 3 overlaps
        kept = {
            r["file"]
            for r in idx.prune().where(
                idx._prune_condition([("ts", ">=", cut)])
            ).select("file").collect()
        }
        assert len(kept) == 1
        dcut = (base + datetime.timedelta(hours=250)).date()
        ddf = idx.read(predicate=[("d", ">", dcut)])
        # days strictly after day 10 (hour 250 ≈ day 10.4): hours >= 264
        assert ddf.count() == 400 - 264


def test_predicate_on_projected_out_column(spark, tmp_path):
    """Round-13 review: SELECT a WHERE b — a residual predicate on a
    column outside the projection scans it transparently and drops it
    after filtering, instead of UNRESOLVED_COLUMN."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "proj.parquet")
    pq.write_table(
        pa.table(
            {
                "a": pa.array(range(100), pa.int64()),
                "b": pa.array([i % 10 for i in range(100)], pa.int64()),
            }
        ),
        p,
    )
    for fast in (True, False):
        idx = build_index(spark, p, use_cache=False, driver_fast_path=fast)
        df = idx.read(columns=["a"], predicate=[("b", "=", 3)])
        assert df.columns == ["a"]
        assert sorted(r["a"] for r in df.collect()) == list(range(3, 100, 10))


def test_read_unknown_files_raise_typed(spark, tmp_path):
    """Round-13 review: a typo'd files= entry raises instead of silently
    vanishing from the result."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from palletjack_spark.errors import InvalidSelectionError

    out = str(tmp_path / "f")
    os.makedirs(out)
    for i in range(2):
        pq.write_table(
            pa.table({"v": pa.array([i], pa.int64())}),
            os.path.join(out, f"part-{i}.parquet"),
        )
    for fast in (True, False):
        idx = build_index(spark, out, use_cache=False, driver_fast_path=fast)
        good = os.path.join(out, "part-0.parquet")
        with pytest.raises(InvalidSelectionError, match="not present"):
            idx.read(files=[good, os.path.join(out, "part-9.parqet")])
        assert idx.read(files=[good]).count() == 1


def test_partitioned_dup_data_column_and_encoded_segments(spark, tmp_path):
    """Round-13 review, two partition-layout edge cases: (a) a data
    column sharing a partition key's name must not produce a
    duplicate-name schema (the data column wins; path-segment pruning
    for that key is disabled); (b) percent-encoded segments compare
    DECODED in the distributed gate, like partition_values and the
    attached column — k=a%2Db must match predicate 'a-b'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "dup")
    for i, reg in enumerate(["apac", "emea"]):
        os.makedirs(os.path.join(out, f"region={reg}"))
        pq.write_table(
            pa.table(
                {
                    "v": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
                    "region": pa.array([reg] * 10),  # dup of the key!
                }
            ),
            os.path.join(out, f"region={reg}", "part-0.parquet"),
        )
    for fast in (True, False):
        idx = build_index(spark, out, use_cache=False, driver_fast_path=fast)
        df = idx.read(predicate=[("region", "=", "apac")])
        assert df.columns.count("region") == 1
        rows = df.collect()
        assert sorted(r["v"] for r in rows) == list(range(10))
        assert all(r["region"] == "apac" for r in rows)

    enc = str(tmp_path / "enc")
    for seg, lo in (("k=a%2Db", 0), ("k=plain", 100)):
        os.makedirs(os.path.join(enc, seg))
        pq.write_table(
            pa.table({"v": pa.array(range(lo, lo + 10), pa.int64())}),
            os.path.join(enc, seg, "part-0.parquet"),
        )
    for fast in (True, False):
        idx = build_index(spark, enc, use_cache=False, driver_fast_path=fast)
        got = idx.read(predicate=[("k", "=", "a-b")]).collect()
        assert sorted(r["v"] for r in got) == list(range(10))
        assert all(r["k"] == "a-b" for r in got)


def test_unsigned_columns_scan_with_declared_types(spark, tmp_path):
    """Round-13 review: uint8/16/32 batches must widen to the Spark
    types the schema declares (previously only uint64 normalized, so
    the batch schema never matched the mapInArrow returnType), and a
    uint64 past 2**63 errors loudly instead of wrapping negative."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "u.parquet")
    pq.write_table(
        pa.table(
            {
                "u8": pa.array([0, 200], pa.uint8()),
                "u16": pa.array([0, 60000], pa.uint16()),
                "u32": pa.array([0, 4_000_000_000], pa.uint32()),
                "u64": pa.array([0, 2**62], pa.uint64()),
            }
        ),
        p,
    )
    idx = build_index(spark, p, use_cache=False)
    rows = idx.read().orderBy("u8").collect()
    assert [r["u16"] for r in rows] == [0, 60000]
    assert [r["u32"] for r in rows] == [0, 4_000_000_000]
    assert [r["u64"] for r in rows] == [0, 2**62]

    p2 = str(tmp_path / "uo.parquet")
    pq.write_table(
        pa.table({"u64": pa.array([2**63 + 1], pa.uint64())}), p2
    )
    idx2 = build_index(spark, p2, use_cache=False)
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        idx2.read().collect()
    assert "overflow" in str(ei.value).lower() or "cast" in str(
        ei.value
    ).lower() or "invalid" in str(ei.value).lower()


def test_bracket_named_file_reads_literally(spark, tmp_path):
    """Round-13 review: an existing literal path containing '[' must not
    be glob-interpreted onto a different file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.sources.arrow_scan import expand_paths

    good = str(tmp_path / "part[1].parquet")
    decoy = str(tmp_path / "part1.parquet")
    pq.write_table(pa.table({"v": pa.array([42], pa.int64())}), good)
    pq.write_table(pa.table({"v": pa.array([7], pa.int64())}), decoy)
    assert expand_paths(good) == [good]


def test_overwrite_rebuild_honors_new_catalog_buckets(spark, tmp_path):
    """Round-13 review: a NON-incremental rebuild replaces the sidecar,
    so the caller's catalog_buckets must be honored — re-bucketing was
    previously a silent no-op forever (the old sidecar's layout won
    unconditionally)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "d")
    os.makedirs(out)
    for i in range(3):
        pq.write_table(
            pa.table({"v": pa.array(range(i * 10, i * 10 + 10), "int64")}),
            os.path.join(out, f"p{i}.parquet"),
        )
    idx_dir = str(tmp_path / "sidecar")
    build_index(spark, out, index_dir=idx_dir, use_cache=False)
    assert "file_bucket" not in spark.read.parquet(
        os.path.join(idx_dir, "files")
    ).columns
    # overwrite rebuild WITH buckets: the new layout must land
    idx = build_index(
        spark, out, index_dir=idx_dir, use_cache=False, catalog_buckets=4
    )
    assert "file_bucket" in spark.read.parquet(
        os.path.join(idx_dir, "files")
    ).columns
    assert idx.read(predicate=[("v", "=", 15)]).count() == 1
    # incremental appends still inherit the (new) existing layout
    pq.write_table(
        pa.table({"v": pa.array(range(30, 40), "int64")}),
        os.path.join(out, "p3.parquet"),
    )
    idx2 = build_index(
        spark, out, index_dir=idx_dir, incremental=True, use_cache=False
    )
    assert idx2.read(predicate=[("v", "=", 35)]).count() == 1


def test_incremental_append_aligns_files_dataset_schema(spark, tmp_path):
    """Round-13 review: appending file rows that carry a newer top-level
    field (mtime_ns) into a sidecar written without it must align to the
    EXISTING files/ layout instead of creating a mixed-schema dataset
    whose reads depend on footer sampling."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    out = str(tmp_path / "d")
    os.makedirs(out)
    pq.write_table(
        pa.table({"v": pa.array(range(10), "int64")}),
        os.path.join(out, "a.parquet"),
    )
    idx_dir = str(tmp_path / "sidecar")
    build_index(spark, out, index_dir=idx_dir, use_cache=False)
    files_dir = os.path.join(idx_dir, "files")
    # simulate a pre-mtime_ns sidecar: rewrite files/ without the column
    legacy = spark.read.parquet(files_dir).drop("mtime_ns")
    staged = str(tmp_path / "legacy_files")
    legacy.write.mode("overwrite").parquet(staged)
    import shutil

    shutil.rmtree(files_dir)
    shutil.move(staged, files_dir)
    assert "mtime_ns" not in spark.read.parquet(files_dir).columns

    pq.write_table(
        pa.table({"v": pa.array(range(10, 20), "int64")}),
        os.path.join(out, "b.parquet"),
    )
    idx = build_index(
        spark, out, index_dir=idx_dir, incremental=True, use_cache=False
    )
    # one consistent layout (no mtime_ns anywhere), both files indexed
    fdf = spark.read.parquet(files_dir)
    assert "mtime_ns" not in fdf.columns
    assert fdf.count() == 2
    assert idx.read().count() == 20


def test_index_cache_is_bounded(spark, tmp_path):
    """Round-13 review: the build memo must not grow without bound
    (superseded entries pinned cached DataFrames for the app lifetime)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index import builder as B

    before = dict(B._INDEX_CACHE)
    try:
        B._INDEX_CACHE.clear()
        for i in range(B._INDEX_CACHE_MAX + 5):
            p = str(tmp_path / f"c{i}.parquet")
            pq.write_table(pa.table({"v": pa.array([i], "int64")}), p)
            build_index(spark, p)
        assert len(B._INDEX_CACHE) <= B._INDEX_CACHE_MAX
    finally:
        B._INDEX_CACHE.clear()
        B._INDEX_CACHE.update(before)


def test_staged_query_fixtures_invalidate_on_source_regeneration(
    spark, tmp_path
):
    """Round-14 sweep (the q92g round-8 lesson, applied to queries/
    scans.py): staged /tmp fixtures were keyed by sf_dir PATH only, so a
    regenerated source table silently served stale rows while the
    oracle read the new data.  Rebuild q04b's staged evolution layout
    from a tiny synthetic sf_dir, regenerate the source with different
    rows, and assert the query reflects the NEW rows."""
    import time

    from palletjack_spark.queries.registry import REGISTRY

    sf = str(tmp_path / "sfx")
    os.makedirs(sf)

    def write_nation(keys):
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array(keys, "int32"),
                    "n_name": pa.array([f"N{k}" for k in keys]),
                    "n_regionkey": pa.array([k % 3 for k in keys], "int32"),
                }
            ),
            os.path.join(sf, "nation.parquet"),
        )

    write_nation([0, 1, 2])
    q = REGISTRY["q04b_schema_evolution"].fn
    first = sorted(
        (r["n_nationkey"], r["batch"]) for r in q(spark, sf).collect()
    )
    assert first == sorted([(k, b) for k in (0, 1, 2) for b in (1, 2)])
    # regenerate the source with DIFFERENT rows (ensure a new mtime_ns)
    time.sleep(0.01)
    write_nation([5, 6])
    second = sorted(
        (r["n_nationkey"], r["batch"]) for r in q(spark, sf).collect()
    )
    assert second == sorted([(k, b) for k in (5, 6) for b in (1, 2)])


def test_load_table_memoizes_plan_and_invalidates_on_rewrite(spark, tmp_path):
    """load_table serves repeated reads of an UNCHANGED fixture from the
    session-scoped relation memo (identical DataFrame handle — schema
    inference and listing run once), but a rewrite of the file must be
    picked up on the next call (stat-keyed invalidation), and the data
    read through a memoized handle is always the CURRENT bytes on disk —
    the memo holds a plan, never results."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.tables import load_table

    sf = str(tmp_path / "sfm")
    os.makedirs(sf)
    path = os.path.join(sf, "nation.parquet")

    def write_nation(keys):
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array(keys, "int32"),
                    "n_name": pa.array([f"N{k}" for k in keys]),
                    "n_regionkey": pa.array([k % 3 for k in keys], "int32"),
                }
            ),
            path,
        )

    write_nation([0, 1, 2])
    a = load_table(spark, sf, "nation")
    b = load_table(spark, sf, "nation")
    assert a is b, "unchanged fixture must reuse the memoized relation"
    assert a.count() == 3

    # rewrite with different rows -> new mtime/size -> fresh relation
    time.sleep(0.01)
    write_nation([5, 6, 7, 8])
    c = load_table(spark, sf, "nation")
    assert c is not a, "rewritten fixture must invalidate the memo"
    assert c.count() == 4
    assert sorted(r["n_nationkey"] for r in c.collect()) == [5, 6, 7, 8]


def test_load_table_events_routing_follows_footer_type(spark, tmp_path):
    """The events route is decided from the ACTUAL footer: timestamp[ns]
    (Spark-unrepresentable) goes through the arrow source with documented
    µs truncation; an already-µs generation scans natively so Catalyst
    keeps pruning/pushdown.  Values are identical either way."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.tables import load_table

    base = datetime.datetime(2031, 3, 1)
    rows = {
        "event_id": pa.array([1, 2, 3], "int64"),
        "user_id": pa.array([10, 10, 11], "int64"),
        "event_type": pa.array(["a", "b", "a"]),
        "value": pa.array([1.5, 2.5, 3.5], "float64"),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    ts = [base + datetime.timedelta(microseconds=i) for i in (1, 2, 3)]

    def write_events(sf, unit, extra_ns=0):
        os.makedirs(sf, exist_ok=True)
        t = pa.table(
            {**rows, "ts": pa.array(ts, pa.timestamp(unit))}
        )
        if extra_ns:
            # push sub-µs precision into the ns column so truncation is
            # actually exercised
            t = t.set_column(
                t.schema.get_field_index("ts"), "ts",
                pa.compute.add(
                    t["ts"].cast(pa.int64()), extra_ns
                ).cast(pa.timestamp("ns")),
            )
        pq.write_table(t, os.path.join(sf, "events.parquet"))

    sf_us = str(tmp_path / "sf_us")
    sf_ns = str(tmp_path / "sf_ns")
    write_events(sf_us, "us")
    write_events(sf_ns, "ns", extra_ns=750)  # 0.75 µs of sub-µs precision

    d_us = load_table(spark, sf_us, "events")
    d_ns = load_table(spark, sf_ns, "events")
    p_us = d_us._jdf.queryExecution().executedPlan().toString()
    p_ns = d_ns._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in p_us and "MapInArrow" not in p_us, p_us
    assert "MapInArrow" in p_ns, p_ns

    us_rows = sorted(
        (r["event_id"], r["ts"]) for r in d_us.select("event_id", "ts").collect()
    )
    ns_rows = sorted(
        (r["event_id"], r["ts"]) for r in d_ns.select("event_id", "ts").collect()
    )
    # ns generation truncates its 750ns of sub-µs precision to the same µs
    assert us_rows == ns_rows, (us_rows, ns_rows)
