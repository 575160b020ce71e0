"""Per-query perf floors (round-5 verdict item 9): the bench harness
self-flags any headline query slower than FLOOR_FACTOR x its best-known
committed time, so a regression block like round 5's q29/q30/q43 episode
is visible in the run that produced it."""

from __future__ import annotations

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_ROOT, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_floor_flag_fires_on_artificial_slowdown():
    b = _bench()
    floors = {"q30_hash_agg": 0.4, "q29_star_join": 1.0}
    warnings = b._check_floors(
        {"q30_hash_agg": 1.61, "q29_star_join": 1.0}, floors
    )
    assert len(warnings) == 1
    assert "q30_hash_agg" in warnings[0] and "4.0x" in warnings[0]


def test_floor_flag_silent_on_clean_run():
    b = _bench()
    floors = {"q30_hash_agg": 0.4}
    # at exactly the factor boundary and below: silent
    assert b._check_floors({"q30_hash_agg": 0.4 * b.FLOOR_FACTOR}, floors) == []
    assert b._check_floors({"q30_hash_agg": 0.31}, floors) == []
    # queries without a recorded floor (new this round) never flag
    assert b._check_floors({"q999_new": 99.0}, floors) == []


def test_floor_flag_ignores_subsecond_jitter():
    """A sub-second query exceeding its floor by ratio but by <0.15s
    absolute is scheduler jitter, not a regression (the q13 0.325s vs
    0.209s false positive from the round-6 capture)."""
    b = _bench()
    floors = {"q13_pushdown_prune": 0.209}
    assert b._check_floors({"q13_pushdown_prune": 0.325}, floors) == []
    # but a real multi-second blowup on the same floor still flags
    assert len(b._check_floors({"q13_pushdown_prune": 0.9}, floors)) == 1


def test_headline_names_all_registered():
    """Every bench HEADLINE entry must be a registered QID — a typo here
    would crash the driver's per-round bench run at query time."""
    import sys

    sys.path.insert(0, _ROOT)
    from palletjack_spark.queries import REGISTRY

    b = _bench()
    missing = [q for q in b.HEADLINE if q not in REGISTRY]
    assert missing == [], missing
    assert len(set(b.HEADLINE)) == len(b.HEADLINE), "duplicate headline"


def test_floors_scoped_to_their_capture_sf(tmp_path):
    """Floors captured at sf0.1 must not apply to an sf0.01 smoke run —
    fixed-overhead-dominated queries flag spuriously there (q30 at
    0.456s vs its 0.275s sf0.1 floor in the round-7 smoke run)."""
    import json

    b = _bench()
    p = tmp_path / "BENCH_BASELINE.json"
    p.write_text(json.dumps({"sf": 0.1, "floors": {"q30_hash_agg": 0.275}}))
    assert b._load_floors(str(p), sf=0.1) == {"q30_hash_agg": 0.275}
    assert b._load_floors(str(p), sf=0.01) == {}
    # legacy file without an sf field keeps working at any sf
    p.write_text(json.dumps({"floors": {"q30_hash_agg": 0.275}}))
    assert b._load_floors(str(p), sf=0.01) == {"q30_hash_agg": 0.275}
    # meta_floors guard SF-INDEPENDENT microbench workloads: merged in
    # regardless of sf, while headline floors stay sf-scoped (round-10)
    p.write_text(
        json.dumps(
            {
                "sf": 0.1,
                "floors": {"q30_hash_agg": 0.275},
                "meta_floors": {"meta_catalog_10k_build": 8.6},
            }
        )
    )
    assert b._load_floors(str(p), sf=0.1) == {
        "q30_hash_agg": 0.275,
        "meta_catalog_10k_build": 8.6,
    }
    assert b._load_floors(str(p), sf=0.01) == {"meta_catalog_10k_build": 8.6}
    # the committed file declares its capture sf
    assert b._load_floors(sf=0.1) != {}
    assert all(k.startswith("meta_") for k in b._load_floors(sf=0.01))


def test_round10_floor_coverage_and_meta_gate():
    """Round-9 verdict item 1: the 4 round-9 headline queries and the
    flagship meta_* workloads all have committed floors; a contended-run
    swing like r9's catalog build (8.6s -> 28.6s) or indexed e2e read
    (25ms -> 43ms) now fires a warning."""
    b = _bench()
    floors = b._load_floors(sf=0.1)
    for q in (
        "q151_rrf_fusion",
        "q152_dup_span_excise",
        "q153_cluster_representative",
        "q154_fuzzy_decontaminate",
        "meta_catalog_10k_build",
        "meta_e2e_rg0_read_indexed",
        "meta_index_build_spark",
    ):
        assert q in floors and floors[q] > 0, q
    # every headline query is now floored — no number a regression could
    # hide in (floors may cover more than the current headline list).
    # Queries INTRODUCED in the current round are exempt until their first
    # parsed bench lands a committed floor; q94h (PNG) and q94i
    # (progressive JPEG), both round 17, await their first gate-clean
    # capture — floor them from that capture (the q94g/q92p precedent)
    # and empty this set.
    new_this_round: set = {"q94h_image_png", "q94i_image_jpeg_progressive"}
    assert set(b.HEADLINE) - new_this_round <= set(floors)
    # the r9 contended values flag against the committed floors
    warnings = b._check_floors(
        {"meta_catalog_10k_build": 28.6, "meta_e2e_rg0_read_indexed": 0.043},
        floors,
    )
    assert len(warnings) == 2, warnings
    # ...but per-call ms jitter under the 10ms meta gate stays silent
    assert (
        b._check_floors({"meta_e2e_rg0_read_indexed": 0.034}, floors) == []
    )


def test_final_line_carries_host_degraded_flag():
    """Round-9 verdict item 2: the parsed line carries a machine-readable
    degraded flag so a cross-round comparer can skip contaminated
    captures (BENCH_r09 recorded 68.9s for a 53.0s engine)."""
    import json

    b = _bench()
    line = b._final_line(9.87, 0.1, {"meta_x": 1.0}, "d.json", host_degraded=True)
    assert json.loads(line)["host_degraded"] is True
    line = b._final_line(9.87, 0.1, {"meta_x": 1.0}, "d.json")
    assert json.loads(line)["host_degraded"] is False
    # survives even the minimal oversized-detail fallback
    line = b._final_line(9.87, 0.1, {}, "x" * 1700, host_degraded=True)
    assert len(line) <= b.FINAL_LINE_MAX
    assert json.loads(line)["host_degraded"] is True


def test_steal_burst_probe_returns_percentage():
    b = _bench()
    pct = b._steal_burst_pct(seconds=0.2, threads=2)
    if pct is None:  # non-Linux
        return
    assert 0.0 <= pct <= 100.0


def test_final_line_fits_driver_tail_capture():
    """Round-6 verdict item 1: BENCH_r06.json recorded parsed:null
    because the final stdout JSON line outgrew the driver's ~2000-char
    tail capture.  The compact line must stay under FINAL_LINE_MAX even
    with a 60-query registry's worth of per-query times (which now live
    in the detail sidecar, not on the line) plus every meta_*/sweep_*
    float."""
    b = _bench()
    times = {f"q{i:02d}_some_longish_query_name_{i}": 12.3456 for i in range(60)}
    for i in range(17):
        times[f"meta_workload_number_{i:02d}_pool2"] = 0.123456
    for i in range(6):
        times[f"sweep_sf0.01_q{i:02d}_indexed_rowgroup_scan"] = 1.2345
    line = b._final_line(555.1234, 0.1, times, "BENCH_DETAIL_r07.json")
    assert len(line) < b.FINAL_LINE_MAX <= 1800

    import json

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_wall"
    assert parsed["value"] == 555.1234
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # every meta_* float is on the line (the BASELINE.md acceptance
    # numbers must be in the parsed artifact, not only the sidecar)
    assert sum(k.startswith("meta_") for k in parsed["meta"]) == 17
    assert parsed["detail"] == "BENCH_DETAIL_r07.json"


def test_final_line_cap_is_unconditional():
    """Round-8 ADVICE: even if the meta_* family alone outgrows the cap,
    _final_line must still emit a parseable line under FINAL_LINE_MAX
    (progressively dropping meta entries, minimal payload as last
    resort) — never re-introduce the round-6 truncated-tail failure."""
    import json

    b = _bench()
    # pathological: thousands of meta_* keys, far beyond any sweep-drop
    times = {f"meta_family_that_keeps_growing_{i:04d}": 1.234567 for i in range(3000)}
    line = b._final_line(9.87, 0.1, times, "BENCH_DETAIL_r99.json")
    assert len(line) <= b.FINAL_LINE_MAX
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_wall"
    assert parsed["value"] == 9.87
    assert parsed["detail"] == "BENCH_DETAIL_r99.json"
    # absolute worst case: even an empty meta can't save an oversized
    # detail name -> minimal payload truncates detail and STILL fits
    # (round-9 ADVICE: the cap is unconditional, no escape hatch)
    line2 = b._final_line(9.87, 0.1, times, "x" * 1700)
    assert len(line2) <= b.FINAL_LINE_MAX
    json.loads(line2)
    # and a detail whose JSON escaping inflates it (quotes/backslashes)
    line3 = b._final_line(9.87, 0.1, times, '"\\' * 1200)
    assert len(line3) <= b.FINAL_LINE_MAX
    json.loads(line3)


def test_detail_round_is_max_committed_plus_one(tmp_path, monkeypatch):
    b = _bench()
    assert b._detail_round(str(tmp_path)) == 1
    (tmp_path / "BENCH_r03.json").write_text("{}")
    (tmp_path / "BENCH_r11.json").write_text("{}")
    assert b._detail_round(str(tmp_path)) == 12
    # an intended capture (SPARK_GRAFT_CAPTURE set) writes the
    # round-numbered repo sidecar
    monkeypatch.setenv("SPARK_GRAFT_CAPTURE", "1")
    name = b._write_detail({"queries": {"q": 1.0}}, str(tmp_path))
    assert name == "BENCH_DETAIL_r12.json"
    import json

    assert json.loads((tmp_path / name).read_text())["queries"] == {"q": 1.0}


def test_non_capture_run_leaves_committed_sidecar_untouched(
    tmp_path, monkeypatch
):
    """Round-12 hygiene (VERDICT item 6, recurring since round 10): the
    driver's end-of-round bench run must NOT overwrite the committed
    BENCH_DETAIL_rNN.json — without the capture flag, detail goes to a
    scratch path under /tmp."""
    import json
    import os

    b = _bench()
    (tmp_path / "BENCH_r11.json").write_text("{}")
    committed = tmp_path / "BENCH_DETAIL_r12.json"
    committed.write_text('{"queries": {"committed": 1.0}}\n')
    monkeypatch.delenv("SPARK_GRAFT_CAPTURE", raising=False)
    name = b._write_detail({"queries": {"q": 2.0}}, str(tmp_path))
    assert name.startswith("/tmp/")
    assert json.loads(committed.read_text())["queries"] == {"committed": 1.0}
    assert json.loads(open(name).read())["queries"] == {"q": 2.0}
    os.unlink(name)


def test_committed_floors_cover_the_regression_block():
    b = _bench()
    floors = b._load_floors()
    for q in ("q29_star_join", "q30_hash_agg", "q43_topk_per_group"):
        assert q in floors and floors[q] > 0
    # the committed floors are the r3-r5 minimums, so the round-5
    # regression values must flag against them
    warnings = b._check_floors(
        {"q29_star_join": 2.43, "q30_hash_agg": 1.61, "q43_topk_per_group": 1.66},
        floors,
    )
    assert len(warnings) == 3


def test_steal_jiffies_readable_on_linux():
    """The /proc/stat sampler returns (steal, total) with total
    monotonically increasing — the host-contention control the round-7
    steal episode (2-10x on parallel stages, quiet single-thread
    controls, 21.7% measured steal) motivated."""
    b = _bench()
    s1 = b._steal_jiffies()
    if s1 is None:  # non-Linux
        return
    steal, total = s1
    assert steal >= 0 and total > 0
    import time

    time.sleep(0.05)
    s2 = b._steal_jiffies()
    assert s2[1] >= total


def test_driver_memory_derivation(monkeypatch):
    """driver_memory sizes the local JVM heap from physical RAM (~1/16,
    clamped to [1g, 8g] — Spark's default heap is the floor, so small
    boxes are never configured BELOW stock), and the env override wins."""
    from palletjack_spark.session import driver_memory

    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert driver_memory() == "3g"
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM")

    mem = driver_memory()
    if mem is None:  # platform without sysconf: stock default kept
        return
    assert mem.endswith("m")
    mb = int(mem[:-1])
    assert 1024 <= mb <= 8192
