"""10k-file catalog scale proof (round-5 verdict item 5).

The bucketed sidecar (builder.py catalog_buckets) and executor-side scan
planning are 100 TB designs that until this round were only exercised at
3-4 files.  These tests build a real 10,000-file catalog (tiny files,
generated once into the system tempdir) and pin the properties that make
the design survive a million-file catalog:

- point-file selection partition-prunes the sidecar to 1 of 16 buckets,
- incremental append rewrites ONLY the buckets of the appended files,
- build wall-time stays ~linear in file count.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import time

import pytest

from palletjack_spark import build_index

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_for_catalog", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def catalog_10k():
    return _bench()._ensure_catalog_fixture(10_000)


@pytest.fixture(scope="module")
def catalog_1k():
    return _bench()._ensure_catalog_fixture(1_000)


def _bucket(path: str, n: int = 16) -> int:
    """Driver-side portable mirror of functions.dedup.hash60 % n."""
    return int(hashlib.md5(path.encode()).hexdigest()[:15], 16) % n


def _bucket_listing(idx_dir: str) -> dict[str, frozenset]:
    """bucket dir -> frozenset of (name, size) for every sidecar part."""
    out = {}
    for sub in ("row_groups", "files"):
        base = os.path.join(idx_dir, sub)
        for b in os.listdir(base):
            if not b.startswith("file_bucket="):
                continue
            d = os.path.join(base, b)
            out[f"{sub}/{b}"] = frozenset(
                (f, os.path.getsize(os.path.join(d, f)))
                for f in os.listdir(d)
                if not f.startswith(("_", "."))
            )
    return out


def test_catalog_10k_point_select_prunes_to_one_bucket(
    spark, catalog_10k, tmp_path
):
    idx_dir = str(tmp_path / "idx10k")
    t0 = time.perf_counter()
    idx = build_index(
        spark, catalog_10k, index_dir=idx_dir, use_cache=False,
        catalog_buckets=16,
    )
    build_10k = time.perf_counter() - t0
    assert idx.files.count() == 10_000

    # all 16 bucket partitions exist on disk
    buckets_on_disk = {
        b for b in os.listdir(os.path.join(idx_dir, "row_groups"))
        if b.startswith("file_bucket=")
    }
    assert len(buckets_on_disk) == 16

    target = os.path.join(catalog_10k, "part-04321.parquet")
    sel = idx.prune(files=[target])
    plan = sel._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "file_bucket" in part_filters, plan
    assert sel.count() == 1

    # the pruned scan reads 1/16 of the sidecar: the file-source relation
    # selects exactly the target's bucket partition
    want = _bucket(target)
    assert f"file_bucket = {want}" in part_filters or str(want) in part_filters

    # ~linear build wall-time: 10x the files must cost well under the
    # superlinear regime (an O(files^2) or driver-loop build would blow
    # past this by orders of magnitude; generous bound absorbs host noise)
    idx1_dir = str(tmp_path / "idx1k")
    cat_1k = _bench()._ensure_catalog_fixture(1_000)
    t0 = time.perf_counter()
    build_index(
        spark, cat_1k, index_dir=idx1_dir, use_cache=False, catalog_buckets=16
    )
    build_1k = time.perf_counter() - t0
    assert build_10k / build_1k < 30, (build_10k, build_1k)


def test_smart_read_routes_over_10k_catalog(spark, catalog_1k, tmp_path):
    """smart_read's routing decision must stay a one-row aggregate at
    catalog scale too: route a selective and a keep-all predicate over
    the 1k-file bucketed index and verify both return exact rows (the
    O(1)-collect property is spied in test_index.py; here the point is
    that the decision itself completes fast over a real catalog)."""
    import time as _time

    from palletjack_spark.index import smart_read

    idx_dir = str(tmp_path / "idx")
    idx = build_index(
        spark, catalog_1k, index_dir=idx_dir, use_cache=False,
        catalog_buckets=16,
    )
    t0 = _time.perf_counter()
    d_tight = smart_read(
        spark, catalog_1k, predicate=[("id", "<", 5)], index=idx
    )
    routing_s = _time.perf_counter() - t0
    assert d_tight.count() == 5
    assert routing_s < 30, routing_s
    idx.unpersist()


def test_catalog_incremental_append_touches_only_new_buckets(
    spark, catalog_1k, tmp_path
):
    import shutil

    data = str(tmp_path / "data")
    shutil.copytree(catalog_1k, data)
    idx_dir = str(tmp_path / "idx")
    build_index(
        spark, data, index_dir=idx_dir, use_cache=False, catalog_buckets=16
    )
    before = _bucket_listing(idx_dir)

    # append 5 new files; only their buckets may change
    new_paths = []
    for i in range(5):
        p = os.path.join(data, f"appended-{i:02d}.parquet")
        shutil.copy(os.path.join(data, "part-00000.parquet"), p)
        new_paths.append(p)
    expected_touched = {_bucket(p) for p in new_paths}

    idx2 = build_index(
        spark, data, index_dir=idx_dir, incremental=True, use_cache=False
    )
    assert idx2.files.count() == 1_005
    after = _bucket_listing(idx_dir)

    touched = set()
    for key in after:
        if before.get(key) != after[key]:
            touched.add(int(key.rsplit("=", 1)[1]))
    assert touched == expected_touched, (touched, expected_touched)
    idx2.unpersist()
