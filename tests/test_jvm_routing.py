"""SURVEY §4's JVM production routing vehicle (round-8 verdict item 6):
a SparkSessionExtensions optimizer rule (Java, compiled on demand against
the installed Spark's jars) that file-prunes scans over index-registered
roots from PURE SQL — no Python DataFrameReader involved — with identical
results to smart_read.

The extension and its classpath bind at JVM launch, so the scenario runs
in a child process (tests/jvm_routing_child.py) with PYSPARK_SUBMIT_ARGS;
this parent asserts on its observations."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from palletjack_spark.index.jvm_routing import (
    EXTENSION_CLASS,
    jvm_classes_dir,
    pyspark_submit_args,
)

_CHILD = os.path.join(os.path.dirname(__file__), "jvm_routing_child.py")


def test_java_sources_compile():
    out = jvm_classes_dir()
    names = os.listdir(os.path.join(out, "io", "palletjack", "spark"))
    assert "PalletJackFilePruneRule.class" in names
    assert "PalletJackSparkSessionExtensions.class" in names
    assert EXTENSION_CLASS.endswith("PalletJackSparkSessionExtensions")


def test_submit_args_shape():
    args = pyspark_submit_args()
    assert "--driver-class-path" in args
    assert f"spark.sql.extensions={EXTENSION_CLASS}" in args
    assert args.endswith("pyspark-shell")


@pytest.mark.slow
def test_pure_sql_scan_is_file_pruned_and_hash_equal(tmp_path):
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = pyspark_submit_args()
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        [sys.executable, _CHILD, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    out = json.loads(line[-1][len("RESULT:"):])

    assert out["available"] is True
    assert out["n_registered"] == 4
    # plain SQL over an unregistered root scans every file...
    assert out["files_before"] == 4
    # ...and over the registered root, the optimizer rule drops the two
    # files whose max(v) < 250 — from pure spark.sql, no Python reader
    assert out["files_after"] == 2
    assert out["kept_files"] == ["part-2.parquet", "part-3.parquet"]
    # identical results, equal to smart_read on the same inputs
    assert out["n_rows"] == 150
    assert out["smart_read_equal"] is True
    # a disjunction with an unprovable branch: conservatively unpruned,
    # still correct
    assert out["files_disjunction"] == 4
    assert out["n_rows_disjunction"] == 250
    # round 13: every-branch-provable disjunctions prune to the UNION
    # of the branches' surviving files (v<100 -> file 0, v>=300 -> file 3)
    assert out["files_or"] == 2
    assert out["n_rows_or"] == 200
    ev = out["explain_or"]
    assert (ev["total"], ev["kept"]) == (4, 2)
    assert ev["pruned"] == {"stats": 2, "dictionary": 0, "bloom": 0, "page": 0}
    # an unprovable conjunct inside one branch drops out; both branches
    # still prune (file 0 survives via v<100, file 3 via v>=300)
    assert out["files_or_nested"] == 2
    assert out["n_rows_or_nested"] == 200
    # point predicate routes to exactly one file
    assert out["files_eq"] == 1
    assert out["n_rows_eq"] == 1
    # IN over literals keeps exactly the member files (round 9)
    assert out["files_in"] == 2
    assert out["n_rows_in"] == 2

    # round-9 ADVICE (high): date col vs TIMESTAMP literal.  This
    # Spark's optimizer normalizes the comparison into day units before
    # our rule runs (so pruning stays sound AND effective: 2 files),
    # but the bar is correctness of the ROWS — the pre-fix rule risked
    # comparing micros against day-unit stats and returning 0 rows on
    # any Spark that delivers the raw Cast(d AS timestamp) form.
    assert out["files_date_ts"] <= 4
    assert out["n_rows_date_ts"] == 155
    # native date literal: same units, pruning still works
    assert out["files_date_lit"] == 2
    assert out["n_rows_date_lit"] == 156
    # narrowing cast (reaches the rule un-rewritten): non-injective,
    # never unwrapped — all 4 files survive.  Pre-fix this pruned to 2,
    # so this case pins the fall-through behavior directly.
    assert out["files_narrowing"] == 4
    assert out["n_rows_narrowing"] == 150
    # exact widening cast: still unwrapped, still pruned
    assert out["files_widening"] == 2
    assert out["n_rows_widening"] == 150

    # round-8 verdict item 3: hive-partitioned roots are index-routed
    # from pure SQL too — stats prune files within partitions while the
    # rebuilt index keeps the partition spec (values survive intact)
    assert out["files_partitioned"] == 2
    assert out["kept_partitions"] == ["p=2", "p=3"]
    assert out["n_rows_partitioned"] == 150
    assert out["partitioned_values_ok"] is True
    assert out["n_rows_part_conj"] == 100
    assert out["smart_read_partitioned_equal"] is True

    # round-10 verdict item 5: membership digests give pure-SQL point
    # lookups the pruning tier min/max can't reach — the interleaved
    # layout keeps 4/4 by stats, the dictionary digests prove ownership
    assert out["files_digest_int"] == 1
    assert out["rows_digest_int"] == [[123, "u0123"]]
    assert out["files_digest_str"] == 1
    assert out["n_rows_digest_str"] == 1
    assert out["files_digest_in"] == 2
    assert out["n_rows_digest_in"] == 2
    assert out["files_digest_none"] == 0
    assert out["n_rows_digest_none"] == 0
    assert out["digest_smart_equal"] is True
    # round 13: cross-column OR where both branches prune via the
    # dictionary tier (stats keep 4/4 on the interleaved layout) — the
    # union of the two owning files survives, attributed to dictionary
    assert out["files_digest_or"] == 2
    assert out["n_rows_digest_or"] == 2
    ev = out["explain_digest_or"]
    assert (ev["total"], ev["kept"]) == (4, 2)
    assert ev["pruned"] == {"stats": 0, "dictionary": 2, "bloom": 0, "page": 0}

    # round-11 verdict item 3: exclusion (!=/NOT IN) and IS [NOT] NULL
    # now prune from pure SQL.  != on an int prunes the single-valued
    # file by stats; != / NOT IN on strings prunes via digest subset
    # (strings have no numeric stats at all)
    assert out["files_ne_int"] == 3
    assert out["n_rows_ne_int"] == 300
    assert out["files_ne_str"] == 3
    assert out["n_rows_ne_str"] == 300
    assert out["files_notin_str"] == 2
    assert out["n_rows_notin_str"] == 200
    assert out["excl_smart_equal"] is True
    # round 13: long IN / NOT IN lists (Catalyst's InSet form past the
    # 10-member conversion threshold) prune too — previously a 12-key
    # point lookup fell through unpruned from pure SQL
    assert out["files_inset"] == 1
    assert out["n_rows_inset"] == 12
    assert out["files_notinset"] == 2
    assert out["n_rows_notinset"] == 200
    # IS NULL prunes the null-free file; IS NOT NULL prunes the all-null
    assert out["files_is_null"] == 3
    assert out["n_rows_is_null"] == 200
    assert out["files_not_null"] == 3
    assert out["n_rows_not_null"] == 200

    # round-10 ADVICE: re-registering after a rewrite (without
    # digest_columns) must clear the old digests — the rewritten file's
    # NEW values were not in the old dictionary set and a stale digest
    # would wrongly prune them (silent missing rows)
    assert out["n_rows_fresh"] == 100
    assert out["digests_cleared"] is True

    # round-11: bloom-filter file pruning for dict-OVERFLOW columns —
    # the layout where the digest builder provably has nothing (no
    # dictionary pages), pure-SQL point lookups prune via the pushed
    # standard bloom filters (Java XXH64 probe)
    assert out["blooms_pushed"] is True
    assert out["digests_empty_on_overflow"] is True
    assert out["files_bloom_int"] == 1
    assert out["rows_bloom_int"] == [[123, "b0123"]]
    assert out["files_bloom_str"] == 1
    assert out["n_rows_bloom_str"] == 1
    assert out["files_bloom_in"] == 2
    assert out["n_rows_bloom_in"] == 2
    assert out["files_bloom_none"] == 0
    assert out["n_rows_bloom_none"] == 0
    assert out["bloom_smart_equal"] is True

    # round-11 q03h at file scope: page-envelope interval sets prune
    # the ENVELOPE-GAP layout from pure SQL — every file's [min, max]
    # spans the literal, chunks are PLAIN (no digests), no blooms; only
    # the pushed intervals prove three files empty, including for a
    # two-sided RANGE (which digests and blooms can't probe at all)
    assert out["intervals_pushed"] is True
    assert out["files_interval_eq"] == 1
    assert out["n_rows_interval_eq"] == 1
    assert out["files_interval_range"] == 1
    assert out["n_rows_interval_range"] == 61
    assert out["files_interval_in"] == 2
    assert out["n_rows_interval_in"] == 2
    assert out["files_interval_none"] == 0
    assert out["n_rows_interval_none"] == 0
    assert out["interval_smart_equal"] is True
    # re-registration without page_columns clears stale intervals (the
    # same staleness contract as digests/blooms)
    assert out["intervals_cleared"] is True

    # round-12 ADVICE (high): exclusion literals beyond 2^53 compare as
    # EXACT longs — `!= 2^53+1` must keep the file single-valued at 2^53
    # (pre-fix litValue() rounded the literal onto the stored double and
    # both the stats and interval tiers wrongly pruned all 100 rows)
    assert out["n_rows_huge_ne"] == 200
    assert out["n_rows_huge_notin"] == 200
    # at the boundary the stored double no longer proves single-valued:
    # conservative keep, rows exact via the residual
    assert out["n_rows_huge_exact"] == 100

    # round-12 ADVICE (low) + stats-tier parity: NaN literals never
    # prune — NaN rows satisfy =, >=, and IN under Spark's NaN==NaN
    # semantics while NaN-dropping stats/envelopes cannot see them
    assert out["files_nan_eq"] == 2  # no evidence: both files kept
    assert out["n_rows_nan_eq"] == 50
    assert out["n_rows_nan_in"] == 51
    assert out["n_rows_nan_gte"] == 50
    # clean literals still prune on the same fixture
    assert out["files_nan_ctl"] == 1
    assert out["n_rows_nan_ctl"] == 1

    # round-12 verdict item 1: the rule's pruning decisions are now
    # observable from PURE SQL (palletjack_prune_explain), with per-tier
    # attribution at parity with the Python prune_explain surface —
    # each of the four fixture layouts credits its prune to the tier
    # that actually proved it
    ev = out["explain_stats"]
    assert (ev["total"], ev["kept"]) == (4, 1)
    assert ev["pruned"] == {"stats": 3, "dictionary": 0, "bloom": 0, "page": 0}
    assert "123" in ev["predicate"]
    ev = out["explain_digest"]
    assert (ev["total"], ev["kept"]) == (4, 1)
    assert ev["pruned"] == {"stats": 0, "dictionary": 3, "bloom": 0, "page": 0}
    ev = out["explain_bloom"]
    assert (ev["total"], ev["kept"]) == (4, 1)
    assert ev["pruned"] == {"stats": 0, "dictionary": 0, "bloom": 3, "page": 0}
    ev = out["explain_page"]
    assert (ev["total"], ev["kept"]) == (4, 1)
    assert ev["pruned"] == {"stats": 0, "dictionary": 0, "bloom": 0, "page": 3}
    # kept-everything decisions are recorded too ("why did this scan
    # all 4 files" — no tier had excluding evidence)
    ev = out["explain_kept_all"]
    assert (ev["total"], ev["kept"]) == (4, 4)
    assert all(v == 0 for v in ev["pruned"].values())
    # the zero-arg form returns the full decision log
    assert out["explain_n_events"] >= 5
    assert out["explain_events_have_shape"] is True

    # round-14 (r13 verdict item 6): the decisions are queryable as a
    # PROPER TABLE — `GROUP BY tier` from pure SQL through the
    # palletjack_prune_events UDTF, no JSON parsing — and the per-root
    # CUMULATIVE counters (eviction-proof) agree across the SQL and
    # Python surfaces, crediting each q03e/f/g/h fixture's prunes to
    # the tier that proved them
    assert out["tvf_tiers"] == ["bloom", "dictionary", "page", "stats"]
    assert out["tvf_matches_event_log"] is True
    assert out["totals_sql_matches_python"] is True
    assert out["totals_by_tier_ok"] is True
    assert out["totals_cover_ring"] is True


def test_per_file_digests_soundness_gates(spark, tmp_path):
    """The digest builder refuses non-identity logical types (unsigned,
    decimal-as-int), dict-overflow chunks, raw-binary columns, and
    value sets beyond the cap — absence means 'keep', so every refusal
    is conservative."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index.builder import build_index
    from palletjack_spark.index.jvm_routing import (
        _digest_hash64,
        _per_file_digests,
    )

    p = str(tmp_path / "d.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([5, 9], type=pa.int64()),
                "tag": pa.array(["a", "b"]),
                "u": pa.array([5, 9], type=pa.uint32()),
                "raw": pa.array([b"\xff\xfe", b"\x00"], type=pa.binary()),
            }
        ),
        p,
    )
    idx = build_index(spark, p)
    digests = _per_file_digests(idx, ["k", "tag", "u", "raw"])
    assert set(digests) == {p}
    cols = digests[p]
    # identity columns digest; unsigned and raw-binary refuse
    assert set(cols) == {"k", "tag"}
    import struct

    k_hashes = struct.unpack(f">{len(cols['k']) // 8}q", cols["k"])
    assert _digest_hash64("5") in k_hashes
    assert _digest_hash64("9") in k_hashes
    assert _digest_hash64("7") not in k_hashes
    tag_hashes = struct.unpack(f">{len(cols['tag']) // 8}q", cols["tag"])
    assert _digest_hash64("a") in tag_hashes and _digest_hash64("b") in tag_hashes

    # a dict-overflow (plain-page fallback) column never digests
    fb = str(tmp_path / "fb.parquet")
    pq.write_table(
        pa.table({"tag": pa.array([f"v{i:06d}" for i in range(5000)])}),
        fb,
        row_group_size=5000,
        dictionary_pagesize_limit=1024,
        data_page_size=1024,
    )
    fidx = build_index(spark, fb)
    assert _per_file_digests(fidx, ["tag"]) == {}

    # the value-set cap: above max_values the digest is dropped
    assert _per_file_digests(idx, ["k"], max_values=1) == {}


def test_per_file_intervals_soundness_gates(spark, tmp_path):
    """The interval builder refuses non-identity logical types, files
    without a page index, and undecodable bounds; all-NULL pages add no
    interval; oversize sets coarsen by closing the smallest gaps (still
    a superset).  Absence means 'keep', so every refusal is safe."""
    import struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from palletjack_spark.index.builder import build_index
    from palletjack_spark.index.jvm_routing import _per_file_intervals

    # banded fixture with identity + non-identity columns
    p = str(tmp_path / "iv.parquet")
    n = 2048
    w = pq.ParquetWriter(
        p,
        pa.schema([("k", pa.int64()), ("u", pa.uint32())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    # two pages: bands [0, 1023] and [100000, 101023] — one gap
    vals = list(range(1024)) + list(range(100000, 101024))
    w.write_table(
        pa.table(
            {
                "k": pa.array(vals, pa.int64()),
                "u": pa.array(range(n), pa.uint32()),
            }
        ),
        row_group_size=n,
    )
    w.close()
    idx = build_index(spark, p)
    got = _per_file_intervals(idx, ["k", "u"])
    assert set(got) == {p} and set(got[p]) == {"k"}  # unsigned refuses
    count = struct.unpack(">I", got[p]["k"][:4])[0]
    flat = struct.unpack(f">{2 * count}d", got[p]["k"][4:])
    assert count == 2
    assert flat == (0.0, 1023.0, 100000.0, 101023.0)

    # no page index -> no intervals at all
    p2 = str(tmp_path / "noidx.parquet")
    pq.write_table(
        pa.table({"k": pa.array(range(100), pa.int64())}),
        p2,
        write_page_index=False,
    )
    idx2 = build_index(spark, p2)
    assert _per_file_intervals(idx2, ["k"]) == {}

    # oversize sets coarsen: 8 disjoint bands forced through a cap of 3
    p3 = str(tmp_path / "many.parquet")
    w = pq.ParquetWriter(
        p3,
        pa.schema([("k", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    vals3 = [b * 10000 + j for b in range(8) for j in range(1024)]
    w.write_table(
        pa.table({"k": pa.array(vals3, pa.int64())}), row_group_size=len(vals3)
    )
    w.close()
    idx3 = build_index(spark, p3)
    got3 = _per_file_intervals(idx3, ["k"], max_intervals=3)
    count3 = struct.unpack(">I", got3[p3]["k"][:4])[0]
    flat3 = struct.unpack(f">{2 * count3}d", got3[p3]["k"][4:])
    assert count3 == 3
    # superset check: every true value still falls inside some interval
    ivs = [(flat3[2 * i], flat3[2 * i + 1]) for i in range(count3)]
    assert all(any(lo <= v <= hi for lo, hi in ivs) for v in vals3)

    # all-NULL pages add no interval (an all-NULL column -> empty set)
    p4 = str(tmp_path / "nulls.parquet")
    w = pq.ParquetWriter(
        p4,
        pa.schema([("k", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=1024,
    )
    w.write_table(
        pa.table({"k": pa.array([None] * 1024, pa.int64())}),
        row_group_size=1024,
    )
    w.close()
    idx4 = build_index(spark, p4)
    got4 = _per_file_intervals(idx4, ["k"])
    assert struct.unpack(">I", got4[p4]["k"][:4])[0] == 0


def test_removed_source_evicts_orphan_class(tmp_path, monkeypatch):
    """Round-15 ADVICE: the count-and-mtime freshness check missed
    REMOVALS — deleting a .java left its orphaned .class in the output
    dir, still "fresh", silently kept on the session classpath.  The
    check now requires the exact top-level class set derived from the
    source names, and a recompile wipes the package tree first."""
    from palletjack_spark.index import jvm_routing as JR

    pkg = os.path.join("io", "palletjack", "spark")
    src = tmp_path / "java" / pkg
    src.mkdir(parents=True)
    for name in ("Alpha", "Beta"):
        (src / f"{name}.java").write_text(
            f"package io.palletjack.spark; public class {name} {{}}\n"
        )
    monkeypatch.setattr(JR, "_JVM_DIR", str(tmp_path))
    out = JR.jvm_classes_dir()
    cls_dir = os.path.join(out, pkg)
    assert sorted(os.listdir(cls_dir)) == ["Alpha.class", "Beta.class"]

    # fresh tree: a second call must NOT recompile (mtimes untouched)
    before = os.path.getmtime(os.path.join(cls_dir, "Alpha.class"))
    assert JR.jvm_classes_dir() == out
    assert os.path.getmtime(os.path.join(cls_dir, "Alpha.class")) == before

    # removing a source must evict its orphaned class on the next call
    os.unlink(src / "Beta.java")
    JR.jvm_classes_dir()
    assert sorted(os.listdir(cls_dir)) == ["Alpha.class"]

    # renaming a source likewise replaces the class, never adds to it
    (src / "Alpha.java").rename(src / "Gamma.java")
    (src / "Gamma.java").write_text(
        "package io.palletjack.spark; public class Gamma {}\n"
    )
    JR.jvm_classes_dir()
    assert sorted(os.listdir(cls_dir)) == ["Gamma.class"]
