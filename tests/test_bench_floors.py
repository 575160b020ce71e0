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
