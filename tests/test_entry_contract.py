"""Driver-contract checks for __spark_entry__.py: full registry exposure,
alias round-trip, and the staleness-aware sort-first rotation that works
around the driver's ~50-entry CORRECTNESS cap (see README "Driver
correctness coverage").

The rotation *rule* is tested against synthetic round files in a tmp dir
(not the live repo's CORRECTNESS_r*.json) so committing a new round
snapshot can never invalidate these assertions.
"""

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


def test_entry_no_install_fallback(monkeypatch):
    """Round-5 verdict item 6: the entry module prefers the installed
    package but must fall back to the in-repo checkout when the install
    is absent or resolves elsewhere (e.g. a stale `pip install .`
    snapshot).  Simulate the stale-install case with a dummy module whose
    __file__ lives outside the repo and re-exec the entry module: it must
    discard the dummy and import the checkout."""
    import importlib.util
    import types

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    saved = {
        m: sys.modules[m]
        for m in list(sys.modules)
        if m.startswith("palletjack_spark")
    }
    try:
        for m in saved:
            del sys.modules[m]
        dummy = types.ModuleType("palletjack_spark")
        dummy.__file__ = "/nonexistent/site-packages/palletjack_spark/__init__.py"
        sys.modules["palletjack_spark"] = dummy
        spec = importlib.util.spec_from_file_location(
            "entry_no_install", os.path.join(repo, "__spark_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        import palletjack_spark as pj

        assert os.path.abspath(os.path.dirname(pj.__file__)).startswith(repo)
        assert len(mod.queries()) == len(mod.REGISTRY)
    finally:
        for m in [m for m in sys.modules if m.startswith("palletjack_spark")]:
            del sys.modules[m]
        sys.modules.update(saved)


def test_alias_roundtrip():
    for name in REGISTRY:
        assert entrymod._canonical(entrymod._alias(name)) == name
        # aliases sort before every canonical two-digit qid
        assert entrymod._alias(name) <= name


def test_aliases_sort_before_all_canonical_names():
    """Every alias must land inside the driver's first-N window regardless of
    which canonical names remain: q0NNN... < q0X_... for X >= 1."""
    aliases = sorted(entrymod._alias(n) for n in REGISTRY)
    canonical = sorted(REGISTRY)
    assert aliases[-1] < canonical[0]


def test_window_holds_the_stalest_queries():
    """The first 50 driver keys must be exactly the 50 QIDs with the oldest
    (or absent) green rows, per the live repo's committed round files."""
    newest = entrymod._green_rounds()
    prio = sorted(REGISTRY, key=lambda n: (newest.get(n, 0), n))
    expected = {entrymod._alias(n) for n in prio[:50]}
    keys = sorted(entrymod.queries().keys())
    assert set(keys[:50]) == expected


def test_oracles_follow_aliasing():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for key, sql in oracles.items():
        assert sql == REGISTRY[entrymod._canonical(key)].oracle


def _write_round(tmpdir, rnd: int, rows: dict) -> None:
    with open(os.path.join(tmpdir, f"CORRECTNESS_r{rnd:02d}.json"), "w") as f:
        json.dump(rows, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
NO_ORACLE = {"rows_match": True, "schema_match": True, "hash_match": False,
             "err": "no_oracle"}


def test_rotation_rule_green_row_in_any_round_verifies(tmp_path):
    """A hash-checked green row in ANY committed round file verifies a QID;
    red / absent rows do not; newest round wins for staleness."""
    _write_round(tmp_path, 1, {"q01_full_scan": GREEN, "q02_pruned_scan": RED})
    _write_round(tmp_path, 2, {"q0002_pruned_scan": GREEN})
    newest = entrymod._green_rounds(root=str(tmp_path))
    assert newest.get("q01_full_scan") == 1
    assert newest.get("q02_pruned_scan") == 2  # alias rows attribute canonically
    assert "q03_indexed_scan" not in newest


def test_rotation_rule_no_oracle_counts_only_without_registered_oracle(tmp_path):
    """A rows-only "no_oracle" row verifies a QID only while the registry has
    no oracle for it — once an oracle registers, the QID must re-rotate."""
    with_oracle = next(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    without = [n for n in REGISTRY if REGISTRY[n].oracle is None]
    _write_round(tmp_path, 1, {with_oracle: NO_ORACLE})
    newest = entrymod._green_rounds(root=str(tmp_path))
    assert with_oracle not in newest
    if without:  # currently every op registers an oracle; guard if one drops
        _write_round(tmp_path, 2, {without[0]: NO_ORACLE})
        newest = entrymod._green_rounds(root=str(tmp_path))
        assert without[0] in newest


def test_rotation_rule_oracle_change_invalidates_old_rows(tmp_path):
    """Round-3 ADVICE: a green row older than the QID's current oracle text
    verified a DIFFERENT oracle — an oracle rewrite resets verification."""
    import hashlib

    name = next(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    h = hashlib.sha256(REGISTRY[name].oracle.encode()).hexdigest()[:16]
    _write_round(tmp_path, 1, {name: GREEN})
    # stored fingerprint: the current oracle text dates from round 2
    with open(tmp_path / "ORACLE_HASHES.json", "w") as f:
        json.dump({name: {"hash": h, "round": 2}}, f)
    newest = entrymod._green_rounds(root=str(tmp_path))
    assert name not in newest  # the r1 row predates the oracle
    _write_round(tmp_path, 2, {name: GREEN})
    newest = entrymod._green_rounds(root=str(tmp_path))
    assert newest.get(name) == 2  # re-verified after the rewrite


def test_rotation_rule_hash_mismatch_stamps_upcoming_round(tmp_path):
    """A stored fingerprint that doesn't match the live oracle bumps the
    QID's intro round to max-committed-round + 1 and rewrites the file."""
    name = next(n for n in REGISTRY if REGISTRY[n].oracle is not None)
    _write_round(tmp_path, 3, {name: GREEN})
    with open(tmp_path / "ORACLE_HASHES.json", "w") as f:
        json.dump({name: {"hash": "0" * 16, "round": 1}}, f)
    intro = entrymod._oracle_rounds(root=str(tmp_path))
    assert intro[name] == 4
    with open(tmp_path / "ORACLE_HASHES.json") as f:
        stored = json.load(f)
    assert stored[name]["round"] == 4
    assert stored[name]["hash"] != "0" * 16
    assert name not in entrymod._green_rounds(root=str(tmp_path))
    # first-seen QIDs get round 0 (nothing to misattribute on cold start)
    other = next(
        n for n in REGISTRY if n != name and REGISTRY[n].oracle is not None
    )
    assert intro[other] == 0


def test_live_fingerprints_match_registry():
    """The committed ORACLE_HASHES.json must stay in sync with the live
    registry — _oracle_rounds must not rewrite it during a driver run."""
    import hashlib

    path = os.path.join(os.path.dirname(entrymod.__file__), "ORACLE_HASHES.json")
    with open(path) as f:
        stored = json.load(f)
    for name, q in REGISTRY.items():
        h = hashlib.sha256((q.oracle or "").encode()).hexdigest()[:16]
        assert stored.get(name, {}).get("hash") == h, (
            f"{name}: oracle changed — rerun _oracle_rounds() and commit "
            "the updated ORACLE_HASHES.json"
        )


def test_window_contains_stalest_qids():
    """Round-4 verdict item 2: the rotation window must always contain the
    QIDs whose green evidence is currently stalest — computed dynamically
    from _green_rounds(), never pinned to one round's answer (the round-4
    pinned variant of this test self-expired the moment CORRECTNESS_r04
    landed and the cohort rotated out)."""
    keys = entrymod._driver_keys()
    aliased = {canon for key, canon in keys.items() if key != canon}
    newest = entrymod._green_rounds()
    stalest = sorted(REGISTRY, key=lambda n: (newest.get(n, 0), n))
    for q in stalest[: entrymod._DRIVER_WINDOW]:
        assert q in aliased, q
    # the freshest cohort must NOT be aliased (the window is bounded)
    for q in stalest[entrymod._DRIVER_WINDOW :][-5:]:
        assert q not in aliased, q


def test_rotation_rule_oldest_green_first_window():
    """_driver_keys aliases exactly the `window` stalest QIDs."""
    keys = entrymod._driver_keys(window=7)
    aliased = {canon for key, canon in keys.items() if key != canon}
    newest = entrymod._green_rounds()
    prio = sorted(REGISTRY, key=lambda n: (newest.get(n, 0), n))
    assert aliased == set(prio[:7])
    # and every canonical name is present exactly once as a value
    assert sorted(keys.values()) == sorted(REGISTRY)
