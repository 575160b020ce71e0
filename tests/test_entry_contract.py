"""Driver-contract checks for __spark_entry__.py: full registry exposure,
alias round-trip, and the sort-first rotation that works around the driver's
~50-entry CORRECTNESS cap (see README "Driver correctness coverage")."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from palletjack_spark.queries import REGISTRY


def test_every_registry_query_exposed_once():
    qs = entrymod.queries()
    assert len(qs) == len(REGISTRY)
    canon = {entrymod._canonical(k) for k in qs}
    assert canon == set(REGISTRY)


def test_alias_roundtrip():
    for name in REGISTRY:
        assert entrymod._canonical(entrymod._alias(name)) == name
        # aliases sort before every canonical two-digit qid
        assert entrymod._alias(name) <= name


def test_unverified_queries_fill_the_checked_window():
    """Every QID lacking a green row in committed CORRECTNESS files must sort
    within the driver's first-50 window."""
    verified = entrymod._verified_qids()
    unverified = sorted(set(REGISTRY) - verified)
    keys = sorted(entrymod.queries().keys())
    window = set(keys[:50])
    missing = [
        q for q in unverified if entrymod._alias(q) not in window and q not in window
    ]
    assert not missing, f"unverified queries outside checked window: {missing}"


def test_oracles_follow_aliasing():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for key, sql in oracles.items():
        assert sql == REGISTRY[entrymod._canonical(key)].oracle


def test_round1_verified_set_parsed():
    path = os.path.join(os.path.dirname(entrymod.__file__), "CORRECTNESS_r01.json")
    with open(path) as f:
        rows = json.load(f)
    verified = entrymod._verified_qids()
    assert "q01_full_scan" in verified
    # q32's round-1 row was "no_oracle", but it now registers a
    # tolerance-boolean oracle — so it re-enters the unverified window
    # until a hash-checked row lands.
    assert "q32_approx_count_distinct" not in verified
    assert "q0032_approx_count_distinct" in entrymod.queries()
    assert "q61_datetime_funcs" not in verified
