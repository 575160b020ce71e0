"""Round-12 VERDICT item 3: pruning observability.  Each evidence tier's
signature fixture must attribute its prune to the RIGHT tier, on the
driver-local verdict API, the executor-side counts API, and smart_read's
routing decision."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palletjack_spark import build_index, prune_explain, prune_explain_counts
from palletjack_spark.errors import InvalidSelectionError
from palletjack_spark.index.smart import smart_read


def _stats_fixture(tmp_path):
    d = tmp_path / "stats"
    d.mkdir()
    for i in range(4):
        pq.write_table(
            pa.table({"k": pa.array(range(i * 100, i * 100 + 100), pa.int64())}),
            str(d / f"part-{i}.parquet"),
        )
    return str(d)


def _interleaved_fixture(tmp_path, name, use_dictionary):
    d = tmp_path / name
    d.mkdir()
    for i in range(4):
        keys = [k for k in range(400) if k % 4 == i]
        pq.write_table(
            pa.table({"k": pa.array(keys, pa.int64())}),
            str(d / f"part-{i}.parquet"),
            use_dictionary=use_dictionary,
        )
    return str(d)


def _page_fixture(tmp_path):
    # 4 row groups x 4 band-aligned pages; every rg's envelope spans the
    # domain, pages stay band-tight (the q03h shape)
    path = str(tmp_path / "gaps.parquet")
    w = pq.ParquetWriter(
        path,
        pa.schema([("k", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    allv = list(range(16 * 1024))
    for r in range(4):
        rows = []
        for b in range(r, 16, 4):
            rows.extend(allv[b * 1024 : (b + 1) * 1024])
        w.write_table(
            pa.table({"k": pa.array(rows, pa.int64())}),
            row_group_size=len(rows),
        )
    w.close()
    return path


def _by_rg(verdicts):
    return {(v["file"].rsplit("/", 1)[-1], v["row_group"]): v for v in verdicts}


def test_stats_tier_attribution(spark, tmp_path):
    idx = build_index(spark, _stats_fixture(tmp_path))
    verdicts = prune_explain(idx, [("k", "=", 123)])
    got = _by_rg(verdicts)
    assert len(got) == 4
    for (fname, _rg), v in got.items():
        if fname == "part-1.parquet":
            assert v["verdict"] == "kept" and v["tier"] is None
        else:
            assert v["verdict"] == "pruned" and v["tier"] == "stats"
            assert "cannot match stats" in v["evidence"]
    counts = prune_explain_counts(idx, [("k", "=", 123)])
    assert counts == {
        "total": 4,
        "kept": 1,
        "pruned": {"stats": 3, "partition": 0, "dictionary": 0,
                   "bloom": 0, "page": 0},
    }


def test_dictionary_tier_attribution(spark, tmp_path):
    # q03e layout: every file's [min, max] spans the literal; only the
    # dictionary proves ownership
    root = _interleaved_fixture(tmp_path, "dict", use_dictionary=True)
    idx = build_index(spark, root)
    verdicts = prune_explain(idx, [("k", "=", 123)])
    tiers = {v["file"].rsplit("/", 1)[-1]: v["tier"] for v in verdicts}
    assert tiers["part-3.parquet"] is None  # 123 % 4 == 3
    assert all(
        t == "dictionary" for f, t in tiers.items() if f != "part-3.parquet"
    )
    pruned = [v for v in verdicts if v["tier"]]
    assert all("dictionary proves" in v["evidence"] for v in pruned)


def test_bloom_tier_attribution(spark, tmp_path):
    # q03g layout: PLAIN chunks (no dictionaries), enriched blooms
    from palletjack_spark import add_bloom_filters

    root = _interleaved_fixture(tmp_path, "bloom", use_dictionary=False)
    import os

    for f in sorted(os.listdir(root)):
        add_bloom_filters(os.path.join(root, f), ["k"], fpp=1e-4)
    idx = build_index(spark, root)
    verdicts = prune_explain(idx, [("k", "=", 123)])
    tiers = {v["file"].rsplit("/", 1)[-1]: v["tier"] for v in verdicts}
    assert tiers["part-3.parquet"] is None
    assert all(
        t == "bloom" for f, t in tiers.items() if f != "part-3.parquet"
    )
    counts = prune_explain_counts(idx, [("k", "=", 123)])
    assert counts["kept"] == 1 and counts["pruned"]["bloom"] == 3


def test_page_tier_attribution_and_row_ranges(spark, tmp_path):
    path = _page_fixture(tmp_path)
    idx = build_index(spark, path)
    # k=5632 lives in band 5 -> row group 1; other rgs' envelopes span it
    verdicts = prune_explain(idx, [("k", "=", 5632)])
    by = {v["row_group"]: v for v in verdicts}
    assert len(by) == 4
    for rg in (0, 2, 3):
        assert by[rg]["tier"] == "page"
        assert "page envelopes" in by[rg]["evidence"]
    kept = by[1]
    assert kept["verdict"] == "kept" and kept["tier"] is None
    # the kept row group is restricted to the surviving page
    assert kept["row_ranges"] == [[1024, 2048]]
    assert "keeps 1024 of 4096" in kept["evidence"]


def test_partition_tier_attribution(spark, tmp_path):
    root = tmp_path / "part"
    for i in range(3):
        (root / f"p={i}").mkdir(parents=True)
        pq.write_table(
            pa.table({"v": pa.array(range(100), pa.int64())}),
            str(root / f"p={i}" / "part-0.parquet"),
        )
    idx = build_index(spark, str(root))
    verdicts = prune_explain(idx, [("p", "=", "1"), ("v", ">=", 0)])
    tiers = {v["file"]: (v["tier"], v["evidence"]) for v in verdicts}
    pruned = {f: t for f, (t, _e) in tiers.items() if t}
    assert len(pruned) == 2 and set(pruned.values()) == {"partition"}
    assert any(
        "partition p=" in e for _t, e in tiers.values() if _t == "partition"
    )


def test_counts_catalog_path_matches_local(spark, tmp_path):
    """The executor-side counts (catalog index, value_prune_plan
    explain=True) agree with the driver-local verdict aggregation on the
    same files and predicate."""
    path = _page_fixture(tmp_path)
    local = build_index(spark, path)
    catalog = build_index(
        spark, path, driver_fast_path=False, use_cache=False
    )
    assert catalog._local is None
    pred = [("k", "=", 5632)]
    want = prune_explain_counts(local, pred)
    got = prune_explain_counts(catalog, pred)
    assert got == want
    assert got["pruned"]["page"] == 3 and got["kept"] == 1


def test_explain_requires_local_and_predicate(spark, tmp_path):
    path = _page_fixture(tmp_path)
    catalog = build_index(
        spark, path, driver_fast_path=False, use_cache=False
    )
    with pytest.raises(InvalidSelectionError, match="driver-local"):
        prune_explain(catalog, [("k", "=", 1)])
    local = build_index(spark, path)
    with pytest.raises(InvalidSelectionError, match="predicate"):
        prune_explain(local, [])


def test_smart_read_explain_decision(spark, tmp_path):
    root = _stats_fixture(tmp_path)
    df, decision = smart_read(
        spark, root, predicate=[("k", "=", 123)], explain=True
    )
    assert decision["route"] == "indexed"
    assert decision["total"] == 4 and decision["kept"] == 1
    assert decision["tier_kept"]["stats"] == 1
    assert df.count() == 1
    # an unprunable predicate routes native, decision says why
    df2, d2 = smart_read(
        spark, root, predicate=[("k", ">=", 0)], explain=True
    )
    assert d2["route"] == "native" and d2["kept"] == d2["total"] == 4
    assert df2.count() == 400
    # the page tier shows up in the probed estimate (q03h routing shape)
    gap = _page_fixture(tmp_path)
    df3, d3 = smart_read(spark, gap, predicate=[("k", "=", 5632)], explain=True)
    assert d3["route"] == "indexed"
    assert d3["tier_kept"]["page"] == 1
    assert df3.count() == 1
    # without explain, the return shape is unchanged
    assert smart_read(
        spark, root, predicate=[("k", "=", 123)]
    ).count() == 1
