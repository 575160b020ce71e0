"""Child process for tests/test_jvm_routing.py: launched with
PYSPARK_SUBMIT_ARGS carrying --driver-class-path + spark.sql.extensions,
because both bind at JVM launch (a fixture session can't adopt them).

Prints one JSON line of observations for the parent to assert on."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def _lr_input_files(df):
    """Leaf LogicalRelation file count + paths from the OPTIMIZED plan."""
    plan = df._jdf.queryExecution().optimizedPlan()
    stack, found = [plan], []

    def children(node):
        ch = node.children()
        return [ch.apply(i) for i in range(ch.size())]

    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() == "LogicalRelation":
            found.extend(list(node.relation().location().inputFiles()))
        stack.extend(children(node))
    return sorted(found)


def main(tmp: str) -> None:
    data = os.path.join(tmp, "data")
    os.makedirs(data)
    for i in range(4):
        pq.write_table(
            pa.table({"v": pa.array(range(i * 100, i * 100 + 100), type=pa.int64()),
                      "tag": pa.array([f"t{i}"] * 100)}),
            os.path.join(data, f"part-{i}.parquet"),
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("jvm-routing-child")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from palletjack_spark.index.jvm_routing import (
        jvm_routing_available,
        register_index_jvm,
    )
    from palletjack_spark.index.smart import smart_read

    out = {"available": jvm_routing_available(spark)}

    def _explain(root: str):
        """Round-12 verdict item 1: the rule's per-tier decision for a
        root, read back from PURE SQL via the injected function."""
        row = spark.sql(
            f"SELECT palletjack_prune_explain('{root}')"
        ).collect()[0][0]
        return json.loads(row)

    sql = f"SELECT v, tag FROM parquet.`{data}` WHERE v >= 250"
    # BEFORE registration: plain Spark, all 4 files scanned
    out["files_before"] = len(_lr_input_files(spark.sql(sql)))

    out["n_registered"] = register_index_jvm(spark, data)

    pruned = spark.sql(sql)
    files_after = _lr_input_files(pruned)
    out["files_after"] = len(files_after)
    out["kept_files"] = [os.path.basename(f) for f in files_after]
    rows = sorted((r["v"], r["tag"]) for r in pruned.collect())
    out["n_rows"] = len(rows)
    out["row_hash"] = hash(tuple(rows)) & 0xFFFFFFFF

    # hash-equal to smart_read on the same inputs
    sm = sorted(
        (r["v"], r["tag"])
        for r in smart_read(spark, data, predicate=[("v", ">=", 250)]).collect()
    )
    out["smart_read_equal"] = sm == rows

    # a disjunction with an UNPROVABLE branch must fall through unpruned
    # (tag has no numeric stats and no digests on this root)
    disj = spark.sql(f"SELECT v FROM parquet.`{data}` WHERE v >= 250 OR tag = 't0'")
    out["files_disjunction"] = len(_lr_input_files(disj))
    out["n_rows_disjunction"] = disj.count()

    # round 13: a disjunction whose EVERY branch is provable prunes to
    # the union of each branch's surviving files
    orq = spark.sql(
        f"SELECT v FROM parquet.`{data}` WHERE v < 100 OR v >= 300"
    )
    out["files_or"] = len(_lr_input_files(orq))
    out["n_rows_or"] = orq.count()
    out["explain_or"] = _explain(data)
    # nested: (provable AND unprovable) OR provable — the unprovable
    # conjunct drops out of its branch, both branches still prune
    orn = spark.sql(
        f"SELECT v FROM parquet.`{data}` "
        "WHERE (v < 100 AND tag = 't0') OR v >= 300"
    )
    out["files_or_nested"] = len(_lr_input_files(orn))
    out["n_rows_or_nested"] = orn.count()

    # equality predicate prunes to one file
    eq = spark.sql(f"SELECT v FROM parquet.`{data}` WHERE v = 123")
    out["files_eq"] = len(_lr_input_files(eq))
    out["n_rows_eq"] = eq.count()
    # ...and the decision is attributable from pure SQL: 3 files pruned
    # by the stats tier
    out["explain_stats"] = _explain(data)

    # IN over literals prunes to exactly the member files (round 9)
    inq = spark.sql(f"SELECT v FROM parquet.`{data}` WHERE v IN (123, 305)")
    out["files_in"] = len(_lr_input_files(inq))
    out["n_rows_in"] = inq.count()

    # --- cast soundness (round-9 ADVICE high) -------------------------
    # Catalyst rewrites `date_col > TIMESTAMP '...'` as
    # Cast(d AS timestamp) > micros-literal; the registry's date stats
    # are in DAYS, so unwrapping that cast would compare micros against
    # day-units and wrongly prune EVERY file.  The rule must fall
    # through unpruned (all 4 files) and return the right rows.
    import datetime

    ddata = os.path.join(tmp, "dates")
    os.makedirs(ddata)
    base = datetime.date(2020, 1, 1)
    for i in range(4):
        days = [base + datetime.timedelta(days=i * 100 + j) for j in range(100)]
        pq.write_table(
            pa.table({"d": pa.array(days, type=pa.date32()),
                      "w": pa.array(range(i * 100, i * 100 + 100), type=pa.int32())}),
            os.path.join(ddata, f"part-{i}.parquet"),
        )
    register_index_jvm(spark, ddata)
    ts = spark.sql(
        f"SELECT d FROM parquet.`{ddata}` "
        "WHERE d > TIMESTAMP '2020-09-01 00:00:00'"
    )
    out["files_date_ts"] = len(_lr_input_files(ts))
    out["n_rows_date_ts"] = ts.count()  # days 245..399 -> 155 rows
    # a native date literal stays prunable (same units as the stats)
    dl = spark.sql(
        f"SELECT d FROM parquet.`{ddata}` WHERE d >= DATE '2020-09-01'"
    )
    out["files_date_lit"] = len(_lr_input_files(dl))
    out["n_rows_date_lit"] = dl.count()
    # a narrowing cast (int32 -> short) is non-injective: never unwrap
    nar = spark.sql(
        f"SELECT w FROM parquet.`{ddata}` WHERE CAST(w AS SHORT) >= 250"
    )
    out["files_narrowing"] = len(_lr_input_files(nar))
    out["n_rows_narrowing"] = nar.count()
    # kept-everything decisions are recorded too — the "why did my
    # query scan all 4 files" answer (no tier had excluding evidence)
    out["explain_kept_all"] = _explain(ddata)
    # an exact widening (int32 -> bigint) is still unwrapped and pruned
    wid = spark.sql(
        f"SELECT w FROM parquet.`{ddata}` WHERE w >= CAST(250 AS BIGINT)"
    )
    out["files_widening"] = len(_lr_input_files(wid))
    out["n_rows_widening"] = wid.count()

    # --- hive-partitioned root (round-8 verdict item 3) ---------------
    pdata = os.path.join(tmp, "part")
    for i in range(4):
        os.makedirs(os.path.join(pdata, f"p={i}"))
        pq.write_table(
            pa.table({"v": pa.array(range(i * 100, i * 100 + 100), type=pa.int64())}),
            os.path.join(pdata, f"p={i}", "part-0.parquet"),
        )
    register_index_jvm(spark, pdata)
    pp = spark.sql(f"SELECT v, p FROM parquet.`{pdata}` WHERE v >= 250")
    pfiles = _lr_input_files(pp)
    out["files_partitioned"] = len(pfiles)
    out["kept_partitions"] = sorted(
        {f.rsplit("/", 2)[-2] for f in pfiles}
    )
    prows = sorted((r["v"], r["p"]) for r in pp.collect())
    out["n_rows_partitioned"] = len(prows)
    out["partitioned_values_ok"] = prows == [(v, v // 100) for v in range(250, 400)]
    # partition-key + data-column conjunction: Spark prunes directories,
    # the rule prunes files by stats — composed result stays exact
    both = spark.sql(
        f"SELECT v, p FROM parquet.`{pdata}` WHERE p = 3 AND v >= 250"
    )
    out["n_rows_part_conj"] = both.count()
    sm_part = sorted(
        (r["v"],)
        for r in smart_read(spark, pdata, predicate=[("v", ">=", 250)])
        .select("v")
        .collect()
    )
    out["smart_read_partitioned_equal"] = sm_part == [(v,) for v in range(250, 400)]

    # --- membership digests (round-10 verdict item 5) ------------------
    # high-cardinality keys interleaved ACROSS FILES: every file's
    # [min, max] spans every literal, so stats keep all 4 files — the
    # q03e adversarial layout, at file scope.  With digest_columns
    # registered, pure-SQL equality/IN prunes to the owning file(s).
    idata = os.path.join(tmp, "inter")
    os.makedirs(idata)
    for i in range(4):
        keys = [k for k in range(400) if k % 4 == i]
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(keys, type=pa.int64()),
                    "tag": pa.array([f"u{k:04d}" for k in keys]),
                }
            ),
            os.path.join(idata, f"part-{i}.parquet"),
        )
    register_index_jvm(spark, idata, digest_columns=["k", "tag"])
    ieq = spark.sql(f"SELECT k, tag FROM parquet.`{idata}` WHERE k = 123")
    out["files_digest_int"] = len(_lr_input_files(ieq))
    irows = sorted((r["k"], r["tag"]) for r in ieq.collect())
    out["rows_digest_int"] = irows
    # the q03e layout's prune attributes to the DICTIONARY tier (stats
    # keep all 4 — every [min, max] spans the literal)
    out["explain_digest"] = _explain(idata)
    # string point lookup: strings have NO numeric stats — before digests
    # the rule could never prune on them at all
    seq_ = spark.sql(f"SELECT k FROM parquet.`{idata}` WHERE tag = 'u0123'")
    out["files_digest_str"] = len(_lr_input_files(seq_))
    out["n_rows_digest_str"] = seq_.count()
    # IN whose members live in two different files
    iin = spark.sql(f"SELECT k FROM parquet.`{idata}` WHERE k IN (123, 202)")
    out["files_digest_in"] = len(_lr_input_files(iin))
    out["n_rows_digest_in"] = iin.count()
    # a literal in NO file's dictionary: zero files opened, zero rows
    none = spark.sql(f"SELECT k FROM parquet.`{idata}` WHERE tag = 'nope'")
    out["files_digest_none"] = len(_lr_input_files(none))
    out["n_rows_digest_none"] = none.count()
    # round 13: a LONG IN list (>10 members → Catalyst rewrites In to
    # InSet, previously left unknown) — all members live in file 3's
    # dictionary, so the digest tier prunes 3 of 4 files
    longin = spark.sql(
        f"SELECT k FROM parquet.`{idata}` "
        "WHERE k IN (3, 7, 11, 15, 19, 23, 27, 31, 35, 39, 43, 123)"
    )
    out["files_inset"] = len(_lr_input_files(longin))
    out["n_rows_inset"] = longin.count()
    # round 13: a cross-column OR where BOTH branches need the
    # dictionary tier (stats keep all 4 on this interleaved layout)
    ior = spark.sql(
        f"SELECT k, tag FROM parquet.`{idata}` "
        "WHERE k = 123 OR tag = 'u0202'"
    )
    out["files_digest_or"] = len(_lr_input_files(ior))
    out["n_rows_digest_or"] = ior.count()
    out["explain_digest_or"] = _explain(idata)
    # hash-equal to smart_read (the Python dictionary-probing path)
    smi = sorted(
        (r["k"], r["tag"])
        for r in smart_read(
            spark, idata, predicate=[("k", "=", 123)]
        ).collect()
    )
    out["digest_smart_equal"] = smi == irows

    # --- exclusion + IS [NOT] NULL parity (round-11 verdict item 3) ----
    # file i: k single-valued i, tag single-valued f"g{i}"; n is all-null
    # in file 0, null-free in file 1, half-null in files 2 and 3
    xdata = os.path.join(tmp, "excl")
    os.makedirs(xdata)
    for i in range(4):
        if i == 0:
            n_vals = [None] * 100
        elif i == 1:
            n_vals = list(range(100))
        else:
            n_vals = [None if j % 2 else j for j in range(100)]
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([i] * 100, type=pa.int64()),
                    "tag": pa.array([f"g{i}"] * 100),
                    "n": pa.array(n_vals, type=pa.int64()),
                }
            ),
            os.path.join(xdata, f"part-{i}.parquet"),
        )
    register_index_jvm(spark, xdata, digest_columns=["k", "tag"])
    # != on int: single-valued file 2 pruned (stats tier + digest subset)
    ne = spark.sql(f"SELECT k FROM parquet.`{xdata}` WHERE k != 2")
    out["files_ne_int"] = len(_lr_input_files(ne))
    out["n_rows_ne_int"] = ne.count()
    # != on string: only the digest tier can prove this (no numeric stats)
    nes = spark.sql(f"SELECT tag FROM parquet.`{xdata}` WHERE tag != 'g3'")
    out["files_ne_str"] = len(_lr_input_files(nes))
    out["n_rows_ne_str"] = nes.count()
    # NOT IN whose members wholly cover two files' value sets
    nin = spark.sql(
        f"SELECT tag FROM parquet.`{xdata}` WHERE tag NOT IN ('g0', 'g1')"
    )
    out["files_notin_str"] = len(_lr_input_files(nin))
    out["n_rows_notin_str"] = nin.count()
    # round 13: a LONG NOT IN (>10 members → Not(InSet)) whose members
    # wholly cover two files' value sets — digest-subset prune
    ninset = spark.sql(
        f"SELECT tag FROM parquet.`{xdata}` WHERE tag NOT IN "
        "('g0', 'g1', 'x2', 'x3', 'x4', 'x5', 'x6', 'x7', 'x8', 'x9', "
        "'xa', 'xb')"
    )
    out["files_notinset"] = len(_lr_input_files(ninset))
    out["n_rows_notinset"] = ninset.count()
    # IS NULL prunes the null-free file; IS NOT NULL prunes the all-null
    isn = spark.sql(f"SELECT k FROM parquet.`{xdata}` WHERE n IS NULL")
    out["files_is_null"] = len(_lr_input_files(isn))
    out["n_rows_is_null"] = isn.count()
    inn = spark.sql(f"SELECT n FROM parquet.`{xdata}` WHERE n IS NOT NULL")
    out["files_not_null"] = len(_lr_input_files(inn))
    out["n_rows_not_null"] = inn.count()
    # hash-equal to smart_read (the Python paths) on the exclusion shape
    sm_ne = sorted(
        r["tag"]
        for r in smart_read(
            spark, xdata, predicate=[("tag", "not_in", ["g0", "g1"])]
        ).select("tag").collect()
    )
    out["excl_smart_equal"] = sm_ne == sorted(
        r["tag"] for r in nin.collect()
    )

    # --- stale digests cleared on re-register (round-10 ADVICE) --------
    # rewrite one file with values OUTSIDE the old dictionary set, then
    # re-register WITHOUT digest_columns: the old digests must not
    # survive and wrongly prune the rewritten file's new values
    pq.write_table(
        pa.table(
            {
                "k": pa.array([999] * 100, type=pa.int64()),
                "tag": pa.array(["fresh"] * 100),
                "n": pa.array(list(range(100)), type=pa.int64()),
            }
        ),
        os.path.join(xdata, "part-3.parquet"),
    )
    register_index_jvm(spark, xdata)
    fresh = spark.sql(f"SELECT k FROM parquet.`{xdata}` WHERE tag = 'fresh'")
    out["n_rows_fresh"] = fresh.count()
    out["digests_cleared"] = (
        spark._jvm.io.palletjack.spark.PalletJackRegistry.digestsFor(xdata)
        is None
    )

    # --- bloom-filter file pruning (round-11): dict-overflow columns ---
    # interleaved high-cardinality keys in PLAIN (dictionary-less)
    # chunks: stats keep 4/4 and the digest builder refuses (no
    # dictionary pages) — only the pushed standard bloom filters can
    # prune pure-SQL point lookups
    from palletjack_spark.index.bloomprune import add_bloom_filters

    bdata = os.path.join(tmp, "bloom")
    os.makedirs(bdata)
    for i in range(4):
        keys = [k for k in range(400) if k % 4 == i]
        p = os.path.join(bdata, f"part-{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(keys, type=pa.int64()),
                    "tag": pa.array([f"b{k:04d}" for k in keys]),
                }
            ),
            p,
            use_dictionary=False,
        )
        # fpp 1e-4 keeps this 100-value fixture's probe outcomes exact
        # (everything is deterministic — hash, values, sizes — so the
        # parent can pin file counts; a bloom HIT only ever keeps)
        add_bloom_filters(p, ["k", "tag"], fpp=1e-4)
    register_index_jvm(
        spark, bdata, digest_columns=["k", "tag"], bloom_columns=["k", "tag"]
    )
    out["blooms_pushed"] = (
        spark._jvm.io.palletjack.spark.PalletJackRegistry.bloomsFor(bdata)
        is not None
    )
    # digests genuinely absent on this layout (the gap blooms close)
    jd = spark._jvm.io.palletjack.spark.PalletJackRegistry.digestsFor(bdata)
    out["digests_empty_on_overflow"] = jd is None or all(
        jd.get(f).isEmpty() for f in jd.keySet().toArray()
    )
    beq = spark.sql(f"SELECT k, tag FROM parquet.`{bdata}` WHERE k = 123")
    out["files_bloom_int"] = len(_lr_input_files(beq))
    out["rows_bloom_int"] = sorted((r["k"], r["tag"]) for r in beq.collect())
    # the q03g layout's prune attributes to the BLOOM tier (stats keep
    # all 4, the dict-overflow chunks have no digests)
    out["explain_bloom"] = _explain(bdata)
    bs = spark.sql(f"SELECT k FROM parquet.`{bdata}` WHERE tag = 'b0123'")
    out["files_bloom_str"] = len(_lr_input_files(bs))
    out["n_rows_bloom_str"] = bs.count()
    bin_ = spark.sql(f"SELECT k FROM parquet.`{bdata}` WHERE k IN (123, 202)")
    out["files_bloom_in"] = len(_lr_input_files(bin_))
    out["n_rows_bloom_in"] = bin_.count()
    bnone = spark.sql(f"SELECT k FROM parquet.`{bdata}` WHERE tag = 'nope'")
    out["files_bloom_none"] = len(_lr_input_files(bnone))
    out["n_rows_bloom_none"] = bnone.count()
    smb = sorted(
        (r["k"], r["tag"])
        for r in smart_read(
            spark, bdata, predicate=[("k", "=", 123)]
        ).collect()
    )
    out["bloom_smart_equal"] = smb == out["rows_bloom_int"]

    # --- page-envelope intervals (round-11, q03h at file scope) --------
    # each file holds two page-aligned value BANDS far apart, so every
    # file's [min, max] spans the probe values while the per-page
    # envelopes leave provable gaps: stats keep 4/4, the chunks are
    # PLAIN (no digests), no blooms — only the pushed interval sets can
    # prune, including for RANGE predicates (which neither digests nor
    # blooms can probe at all)
    gdata = os.path.join(tmp, "gaps")
    os.makedirs(gdata)
    allv = list(range(8 * 1024))
    for i in range(4):
        rows = allv[i * 1024 : (i + 1) * 1024] + allv[(i + 4) * 1024 : (i + 5) * 1024]
        w = pq.ParquetWriter(
            os.path.join(gdata, f"part-{i}.parquet"),
            pa.schema([("k", pa.int64())]),
            use_dictionary=False,
            write_page_index=True,
            data_page_size=1,
            write_batch_size=1024,
        )
        w.write_table(
            pa.table({"k": pa.array(rows, pa.int64())}), row_group_size=2048
        )
        w.close()
    register_index_jvm(spark, gdata, page_columns=["k"])
    out["intervals_pushed"] = (
        spark._jvm.io.palletjack.spark.PalletJackRegistry.intervalsFor(gdata)
        is not None
    )
    # 4608 = band 4 -> file 0 only (every file's [min,max] spans it)
    geq = spark.sql(f"SELECT k FROM parquet.`{gdata}` WHERE k = 4608")
    out["files_interval_eq"] = len(_lr_input_files(geq))
    out["n_rows_interval_eq"] = geq.count()
    # the q03h layout's prune attributes to the PAGE tier (stats keep
    # all 4, no digests, no blooms — only the envelope gaps prove it)
    out["explain_page"] = _explain(gdata)
    # the zero-arg SQL form returns the full event log as a JSON array
    all_events = json.loads(
        spark.sql("SELECT palletjack_prune_explain()").collect()[0][0]
    )
    out["explain_n_events"] = len(all_events)
    out["explain_events_have_shape"] = all(
        {"seq", "root", "predicate", "total", "kept", "pruned"} <= set(e)
        and set(e["pruned"]) == {"stats", "dictionary", "bloom", "page"}
        for e in all_events
    )
    # two-sided range inside band 5 -> file 1 only: the box pass
    grange = spark.sql(
        f"SELECT k FROM parquet.`{gdata}` WHERE k >= 5220 AND k <= 5280"
    )
    out["files_interval_range"] = len(_lr_input_files(grange))
    out["n_rows_interval_range"] = grange.count()
    # IN across two bands -> their two owning files
    gin = spark.sql(f"SELECT k FROM parquet.`{gdata}` WHERE k IN (4608, 5632)")
    out["files_interval_in"] = len(_lr_input_files(gin))
    out["n_rows_interval_in"] = gin.count()
    # a value in nobody's band: zero files
    gnone = spark.sql(f"SELECT k FROM parquet.`{gdata}` WHERE k = 99999")
    out["files_interval_none"] = len(_lr_input_files(gnone))
    out["n_rows_interval_none"] = gnone.count()
    # hash-equal to smart_read (whose q03h page tier prunes row groups)
    smg = sorted(
        r["k"]
        for r in smart_read(
            spark, gdata, predicate=[("k", ">=", 5220), ("k", "<=", 5280)]
        ).collect()
    )
    out["interval_smart_equal"] = smg == sorted(
        r["k"] for r in grange.collect()
    )
    # re-register without page_columns: stale intervals must clear
    register_index_jvm(spark, gdata)
    out["intervals_cleared"] = (
        spark._jvm.io.palletjack.spark.PalletJackRegistry.intervalsFor(gdata)
        is None
    )

    # --- round-12 ADVICE: exclusion beyond 2^53 + NaN literals ---------
    # (a) the exclusion tiers must compare integral literals EXACTLY: a
    # long beyond 2^53 rounds onto a neighboring double under
    # litValue()'s doubleValue(), so `k != 9007199254740993` must NOT
    # prune a file single-valued at 9007199254740992 — ALL of whose rows
    # satisfy the exclusion.  Both the stats tier (min == max) and the
    # page-interval tier (degenerate envelopes) see the dangerous shape.
    two53 = 9007199254740992
    hdata = os.path.join(tmp, "huge")
    os.makedirs(hdata)
    w = pq.ParquetWriter(
        os.path.join(hdata, "part-0.parquet"),
        pa.schema([("k", pa.int64())]),
        use_dictionary=False,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=50,
    )
    w.write_table(
        pa.table({"k": pa.array([two53] * 100, pa.int64())}),
        row_group_size=100,
    )
    w.close()
    pq.write_table(
        pa.table({"k": pa.array(range(1, 101), pa.int64())}),
        os.path.join(hdata, "part-1.parquet"),
    )
    register_index_jvm(spark, hdata, page_columns=["k"])
    hne = spark.sql(f"SELECT k FROM parquet.`{hdata}` WHERE k != {two53 + 1}")
    out["n_rows_huge_ne"] = hne.count()  # all 200 rows satisfy it
    hnin = spark.sql(
        f"SELECT k FROM parquet.`{hdata}` WHERE k NOT IN ({two53 + 1}, 500)"
    )
    out["n_rows_huge_notin"] = hnin.count()
    # the exact boundary literal: conservative keep (several longs
    # collapse onto 2^53, so min==max no longer proves single-valued),
    # rows stay exact via Spark's residual filter
    hexact = spark.sql(f"SELECT k FROM parquet.`{hdata}` WHERE k != {two53}")
    out["n_rows_huge_exact"] = hexact.count()

    # (b) NaN literals never prune: under Spark's NaN semantics NaN rows
    # satisfy =, >=, and IN on a NaN literal, while NaN-dropping parquet
    # stats and page envelopes leave no trace of them.  Spark's own
    # row-group pushdown shares the blind spot (it drops the row groups
    # wholesale), so it is disabled here to isolate THIS rule's file
    # tier — pre-fix the rule pruned the whole FILE and pushdown=off
    # could not bring the rows back.
    ndata = os.path.join(tmp, "nanlit")
    os.makedirs(ndata)
    w = pq.ParquetWriter(
        os.path.join(ndata, "part-0.parquet"),
        pa.schema([("f", pa.float64())]),
        use_dictionary=False,
        write_page_index=True,
    )
    w.write_table(
        pa.table(
            {"f": pa.array([5.0] * 50 + [float("nan")] * 50, pa.float64())}
        ),
        row_group_size=100,
    )
    w.close()
    pq.write_table(
        pa.table({"f": pa.array([100.0 + i for i in range(100)], pa.float64())}),
        os.path.join(ndata, "part-1.parquet"),
    )
    register_index_jvm(spark, ndata, page_columns=["f"])
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    neq = spark.sql(
        f"SELECT f FROM parquet.`{ndata}` WHERE f = CAST('NaN' AS DOUBLE)"
    )
    out["files_nan_eq"] = len(_lr_input_files(neq))
    out["n_rows_nan_eq"] = neq.count()
    nin2 = spark.sql(
        f"SELECT f FROM parquet.`{ndata}` "
        "WHERE f IN (CAST('NaN' AS DOUBLE), 150.0)"
    )
    out["n_rows_nan_in"] = nin2.count()
    ngte = spark.sql(
        f"SELECT f FROM parquet.`{ndata}` WHERE f >= CAST('NaN' AS DOUBLE)"
    )
    out["n_rows_nan_gte"] = ngte.count()
    # control: a clean literal still prunes to one file with exact rows
    nctl = spark.sql(f"SELECT f FROM parquet.`{ndata}` WHERE f = 150.0")
    out["files_nan_ctl"] = len(_lr_input_files(nctl))
    out["n_rows_nan_ctl"] = nctl.count()
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")

    # --- round-14 (r13 verdict item 6): prune events as a PROPER TABLE
    # (Python UDTF) + per-root cumulative counters, pure SQL end-to-end
    from palletjack_spark.index.jvm_routing import (
        jvm_prune_events,
        jvm_prune_totals,
        register_prune_events_udtf,
    )

    register_prune_events_udtf(spark)
    tvf_by_tier = {
        r["tier"]: r["n"]
        for r in spark.sql(
            "SELECT tier, SUM(n_pruned) AS n FROM "
            "palletjack_prune_events(palletjack_prune_explain()) "
            "GROUP BY tier"
        ).collect()
    }
    ev_by_tier: dict = {}
    for e in jvm_prune_events(spark):
        for t_, n_ in e["pruned"].items():
            ev_by_tier[t_] = ev_by_tier.get(t_, 0) + n_
    out["tvf_matches_event_log"] = tvf_by_tier == ev_by_tier
    out["tvf_tiers"] = sorted(tvf_by_tier)
    # cumulative counters: the totals SQL function through the same TVF
    # agrees with the Python accessor, root for root, tier for tier
    tot_by_root: dict = {}
    for r in spark.sql(
        "SELECT root, tier, n_pruned FROM "
        "palletjack_prune_events(palletjack_prune_totals())"
    ).collect():
        tot_by_root.setdefault(r["root"], {})[r["tier"]] = r["n_pruned"]
    py_tot = {t_["root"]: t_ for t_ in jvm_prune_totals(spark)}
    out["totals_sql_matches_python"] = tot_by_root == {
        root: dict(t_["pruned"]) for root, t_ in py_tot.items()
    }
    # each q03e/f/g/h fixture's lifetime counters credit (at least) the
    # 3-file prune its explain event attributed to that tier; the ring
    # sums can never exceed the eviction-proof cumulative counters
    roots = {
        "stats": out["explain_stats"]["root"],
        "dictionary": out["explain_digest"]["root"],
        "bloom": out["explain_bloom"]["root"],
        "page": out["explain_page"]["root"],
    }
    out["totals_by_tier_ok"] = all(
        py_tot.get(rt, {"pruned": {}})["pruned"].get(t_, 0) >= 3
        for t_, rt in roots.items()
    )
    ring_by_root: dict = {}
    for e in jvm_prune_events(spark):
        acc = ring_by_root.setdefault(e["root"], {})
        for t_, n_ in e["pruned"].items():
            acc[t_] = acc.get(t_, 0) + n_
    out["totals_cover_ring"] = all(
        py_tot.get(root, {"pruned": {}})["pruned"].get(t_, 0) >= n_
        for root, acc in ring_by_root.items()
        for t_, n_ in acc.items()
    )

    print("RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
