"""Streaming semantics beyond the batch oracle: stream==batch equivalence,
real duplicate elimination, late-data drop across microbatches (SURVEY §2.2
Q70-Q75 behaviors that need multi-batch arrival order to observe)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from palletjack_spark.streaming.ops import (
    dedup_within_watermark,
    events_stream,
    run_stream_to_table,
    stage_events_us,
    tumbling_counts,
)
from palletjack_spark.tables import load_table
from tests.conftest import SF_DIR


def test_stream_equals_batch_tumbling(spark):
    stream_out = (
        run_stream_to_table(tumbling_counts(events_stream(spark, SF_DIR)), "complete")
        .orderBy("window_start")
        .toPandas()
    )
    batch_in = spark.read.parquet(stage_events_us(spark, SF_DIR))
    batch_out = tumbling_counts(batch_in).orderBy("window_start").toPandas()
    assert stream_out.equals(batch_out)


_ROWS1 = [
    (1, "2024-01-01 00:00:01", 1, "click", 1.0),
    (2, "2024-01-01 01:00:00", 1, "view", 2.0),  # advances watermark to ~00:50
]
_ROWS2 = [
    (1, "2024-01-01 00:00:01", 1, "click", 1.0),  # dup of event 1 (pre-watermark)
    (3, "2024-01-01 00:00:02", 1, "click", 3.0),  # late data (< watermark)
    (4, "2024-01-01 01:00:01", 1, "click", 4.0),  # fresh
]
_SCHEMA = "event_id long, ts_s string, user_id long, event_type string, value double"


def _write_batch(spark, d: str, rows):
    df = spark.createDataFrame(rows, _SCHEMA).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    df.coalesce(1).write.mode("append").parquet(d)


def _run_two_arrivals(spark, tmp_path, build_query):
    """Deterministic two-microbatch arrival: run availableNow to completion
    on batch 1, write batch 2, resume from the same checkpoint (watermark
    persists across restarts), collect the parquet sink."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = None
    for rows in (_ROWS1, _ROWS2):
        _write_batch(spark, src, rows)
        schema = schema or spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            build_query(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(sink).toPandas()


def test_dedup_drops_duplicate_across_batches(spark, tmp_path):
    out = _run_two_arrivals(
        spark,
        tmp_path,
        lambda s: dedup_within_watermark(s, ["event_id"]).select(
            "event_id", "value"
        ),
    )
    counts = out.groupby("event_id").size()
    assert (counts <= 1).all(), out  # event 1's replay was dropped
    assert set(out["event_id"]) >= {1, 2, 4}


def test_watermark_drops_late_rows_in_append_agg(spark, tmp_path):
    """A late row older than the advanced watermark must not resurrect an
    already-finalized window."""

    def agg(stream):
        return (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").cast("timestamp_ntz").alias("ws"), "n")
        )

    out = _run_two_arrivals(spark, tmp_path, agg)
    emitted = {str(r.ws): int(r.n) for r in out.itertuples()}
    # the 00:00 window finalized after arrival 1 with exactly 1 event;
    # arrival 2's late rows (events 1-dup and 3) were dropped
    assert emitted.get("2024-01-01 00:00:00") == 1, out


def test_custom_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches AND across
    restarts: state lives in the checkpoint, so arrival 2's totals continue
    from arrival 1's (update-mode memory sink per arrival, one checkpoint)."""
    from palletjack_spark.streaming.ops import running_totals_stateful

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    emissions = []
    schema = None
    for rows in (_ROWS1, _ROWS2):
        _write_batch(spark, src, rows)
        schema = schema or spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        collected = []
        q = (
            running_totals_stateful(stream)
            .writeStream.foreachBatch(
                lambda bdf, _id: collected.append(bdf.toPandas())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emissions.append(pd.concat(collected, ignore_index=True))
    # arrival 1: user 1 saw events 1,2 → totals (2, 3000)
    first = emissions[0]
    assert first.loc[first.user_id == 1, "n_events"].item() == 2
    assert first.loc[first.user_id == 1, "value_millis"].item() == 3000
    # arrival 2 continues from checkpointed state: +3 rows (dup 1, 3, 4)
    last = emissions[1].sort_values("n_events").groupby("user_id").last()
    assert last.loc[1, "n_events"] == 5
    assert last.loc[1, "value_millis"] == 11000


def test_transform_with_state_running_totals(spark):
    """Spark 4 transformWithStateInPandas parity with q76's totals.

    Gated: the transformWithState Python protocol needs google.protobuf,
    which this container may not ship; the operator itself
    (streaming/ops.py:running_totals_tws) is environment-independent.
    """
    pytest.importorskip("google.protobuf.descriptor")
    from pyspark.sql import functions as F

    from palletjack_spark.streaming.ops import (
        events_stream,
        run_stream_to_table,
        running_totals_stateful,
        running_totals_tws,
        with_rocksdb_state,
    )

    with with_rocksdb_state(spark):
        out = run_stream_to_table(
            running_totals_tws(events_stream(spark, SF_DIR)), "update"
        )
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_millis", "n_events").alias("value_millis"),
    )
    ref = run_stream_to_table(
        running_totals_stateful(events_stream(spark, SF_DIR)), "update"
    ).groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_millis", "n_events").alias("value_millis"),
    )
    got = {r["user_id"]: (r["n_events"], r["value_millis"]) for r in final.collect()}
    want = {r["user_id"]: (r["n_events"], r["value_millis"]) for r in ref.collect()}
    assert got == want


def test_streaming_curation_dedups_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch must hit the dedup
    state from the earlier one — the property that distinguishes stateful
    streaming dedup from per-batch dropDuplicates."""
    import pandas as pd

    from palletjack_spark.streaming.ops import (
        run_stream_to_table,
        streaming_curation_counts,
    )

    good = "clean words " * 20  # passes both gates (len >= 100, no badwords)
    other = "other clean text " * 20
    f1 = spark.createDataFrame(
        [(0, good, "en", "srcA", len(good))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    f2 = spark.createDataFrame(
        [(1, good, "en", "srcA", len(good)),      # dup of batch-1 doc
         (2, other, "en", "srcA", len(other))],   # new
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "stream_src")
    f1.coalesce(1).write.mode("overwrite").parquet(d)
    f2.coalesce(1).write.mode("append").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = run_stream_to_table(
        streaming_curation_counts(stream), "complete"
    ).toPandas()
    assert out.set_index("source")["n_docs"].to_dict() == {"srcA": 2}


def test_outer_stream_join_emits_closed_windows_only(spark):
    """Q77b: the left-outer stream-stream join must emit every matched
    pair plus each unmatched click whose 10-minute window closed under
    the final min-combined watermark — and must WITHHOLD unmatched
    clicks whose window is still open at end of stream (they may yet
    match in a longer stream).  Verified against the batch left join
    with the closure predicate applied."""
    from palletjack_spark.streaming.ops import (
        click_view_stream_join,
        events_stream,
        run_stream_to_table,
        stage_events_us,
    )

    streamed = run_stream_to_table(
        click_view_stream_join(events_stream(spark, SF_DIR), "leftOuter"),
        "append",
    ).toPandas()

    ev = spark.read.parquet(stage_events_us(spark, SF_DIR))
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").cast("timestamp").alias("cts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("vu"),
        F.col("ts").cast("timestamp").alias("vts"),
    )
    batch = clicks.join(
        views,
        (F.col("cu") == F.col("vu"))
        & (F.col("vts") >= F.col("cts"))
        & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 10 MINUTES")),
        "leftOuter",
    ).toPandas()
    import pandas as _pd

    wm = min(
        batch["cts"].max(), views.agg(F.max("vts")).collect()[0][0]
    ) - _pd.Timedelta(minutes=10)
    matched = batch[batch.view_id.notna()]
    closed = batch[
        batch.view_id.isna()
        & (batch.cts + _pd.Timedelta(minutes=10) <= wm)
    ]
    withheld = batch[
        batch.view_id.isna()
        & (batch.cts + _pd.Timedelta(minutes=10) > wm)
    ]
    assert len(streamed) == len(matched) + len(closed)
    assert len(withheld) >= 1, "fixture must exercise the open-window case"
    streamed_ids = set(streamed["click_id"])
    assert set(withheld["click_id"]).isdisjoint(streamed_ids)
    assert set(closed["click_id"]) <= streamed_ids


def test_streaming_cms_state_is_bounded_and_incremental(spark):
    """q79: the final sketch has at most d*w cells no matter how many
    events streamed, and the run is genuinely multi-batch (one staged
    file per trigger)."""
    from palletjack_spark.queries import REGISTRY
    from palletjack_spark.queries.streaming_queries import _SCMS_D, _SCMS_W

    rows = REGISTRY["q79_streaming_sketch"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= _SCMS_D * _SCMS_W
    ev = load_table(spark, SF_DIR, "events")
    # conservation: every event contributes exactly one count per row
    n = ev.count()
    per_row = {}
    for r in rows:
        per_row[r["r"]] = per_row.get(r["r"], 0) + r["v"]
    assert per_row == {r: n for r in range(_SCMS_D)}


def test_streaming_incremental_dedup_store_equals_one_shot_chain(spark):
    """q115b (round 13): after N streaming triggers, the persisted
    signature store and the decisions must be IDENTICAL to a one-shot
    sequential chain of incremental_dedup + append over the same slices
    — the streaming loop adds arrival, not semantics."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from palletjack_spark.functions.dedup import (
        append_signatures,
        incremental_dedup,
        load_signature_store,
        save_signature_store,
    )
    from palletjack_spark.streaming.ops import streaming_incremental_dedup
    from palletjack_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    store_dir = os.path.join(
        tempfile.gettempdir(), f"pj_test_q115b_{uuid.uuid4().hex[:8]}"
    )
    got = streaming_incremental_dedup(
        spark, sf, n_slices=4, store_dir=store_dir
    ).collect()

    # one-shot sequential chain over the same slice batching
    docs = load_table(spark, sf, "documents")
    ref_store = os.path.join(
        tempfile.gettempdir(), f"pj_test_q115b_ref_{uuid.uuid4().hex[:8]}"
    )
    save_signature_store(
        spark.createDataFrame([], docs.schema), "text", "doc_id", ref_store
    )
    ref_rows = []
    for i in range(4):
        batch = docs.where(F.col("doc_id") % 4 == i)
        store = load_signature_store(spark, ref_store)
        decisions, accepted = incremental_dedup(
            batch, "text", "doc_id", store
        )
        ref_rows.extend(
            (r["doc_id"], i, r["accepted"], r["dup_of"], r["jaccard_milli"])
            for r in decisions.collect()
        )
        append_signatures(accepted, ref_store)

    got_rows = sorted(
        (r["doc_id"], r["batch"], r["accepted"], r["dup_of"], r["jaccard_milli"])
        for r in got
    )
    assert got_rows == sorted(ref_rows)

    # the stores hold the same accepted signatures, row for row
    def store_sig_rows(d):
        return sorted(
            tuple(r) for r in load_signature_store(spark, d).drop("sh_set").collect()
        )

    assert store_sig_rows(store_dir) == store_sig_rows(ref_store)
    accepted_ids = sorted(r[0] for r in ref_rows if r[2])
    assert (
        sorted(
            r["doc_id"]
            for r in load_signature_store(spark, store_dir).collect()
        )
        == accepted_ids
    )
    # 4 published batches: the bootstrap empty batch + nothing rescanned
    import json

    with open(os.path.join(store_dir, "_sig_meta.json")) as f:
        assert json.load(f)["n_batches"] == 5


def test_streaming_ingest_epoch_replay_is_idempotent(spark, tmp_path):
    """Round-14 ADVICE: foreachBatch is at-least-once — a retried
    micro-batch previously re-appended its decision rows (mode append)
    and re-published its signature batch, duplicating both.  Replaying
    the same epoch must change NOTHING: same decision rows, same store
    manifest, same published signatures — and crucially the replay must
    not re-dedup the batch against its own just-published signatures
    (which would flip accepted -> dup_of(self))."""
    import json
    import os

    from pyspark.sql import functions as F

    from palletjack_spark.functions.dedup import (
        load_signature_store,
        save_signature_store,
    )
    from palletjack_spark.streaming.ops import _ingest_epoch
    from palletjack_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store = str(tmp_path / "replstore")
    dec = str(tmp_path / "repldec")
    save_signature_store(
        spark.createDataFrame([], docs.schema), "text", "doc_id", store
    )

    def snap():
        with open(os.path.join(store, "_sig_meta.json")) as f:
            meta = json.load(f)
        decs = sorted(
            tuple(r)
            for r in spark.read.parquet(dec)
            .select("doc_id", "accepted", "dup_of", "batch")
            .collect()
        )
        sigs = sorted(
            r["doc_id"]
            for r in load_signature_store(spark, store).collect()
        )
        return meta, decs, sigs

    batch0 = docs.where(F.col("doc_id") % 4 == 0)
    _ingest_epoch(batch0, 0, store, dec, "runA", 500)
    before = snap()
    assert any(r for r in before[1])  # decisions landed
    # at-least-once replay of the SAME epoch: a pure no-op
    _ingest_epoch(batch0, 0, store, dec, "runA", 500)
    assert snap() == before
    # a replay that recomputed would have flipped accepted rows to
    # self-dups; assert acceptance survived verbatim instead
    assert [r for r in snap()[1] if r[1]] == [r for r in before[1] if r[1]]
    # the next epoch still appends normally
    _ingest_epoch(docs.where(F.col("doc_id") % 4 == 1), 1, store, dec, "runA", 500)
    after = snap()
    assert after[0]["n_batches"] == before[0]["n_batches"] + 1
    assert after[0]["epochs"] == ["runA:0", "runA:1"]
    assert len(after[1]) > len(before[1])
    # the epoch ring SURVIVES compaction (compact_signature_store mutates
    # the loaded manifest in place): a replay right after compacting must
    # still be a no-op, not a double-publish against the compacted store
    from palletjack_spark.functions.dedup import compact_signature_store

    compact_signature_store(spark, store)
    compacted = snap()
    assert compacted[0]["epochs"] == ["runA:0", "runA:1"]
    assert compacted[0]["n_batches"] == 1
    _ingest_epoch(docs.where(F.col("doc_id") % 4 == 1), 1, store, dec, "runA", 500)
    assert snap() == compacted  # replayed epoch: no-op post-compaction too


def test_streaming_dedup_does_not_wipe_existing_store(spark, tmp_path):
    """Round-13 review: a caller continuing ingest against a persisted
    store must NOT have it silently reset to one empty batch — the
    second run dedups against the first run's state (everything is a
    dup of itself), and the store's batch count grows instead of
    resetting."""
    import json
    import os

    from palletjack_spark.streaming.ops import streaming_incremental_dedup

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "contstore")
    first = streaming_incremental_dedup(
        spark, sf, n_slices=4, store_dir=store
    ).collect()
    n_accepted = sum(1 for r in first if r["accepted"])
    assert n_accepted > 0
    with open(os.path.join(store, "_sig_meta.json")) as f:
        n_before = json.load(f)["n_batches"]

    second = streaming_incremental_dedup(
        spark, sf, n_slices=4, store_dir=store
    ).collect()
    # every doc now near-dups its own first-run copy in the store
    assert all(not r["accepted"] for r in second)
    with open(os.path.join(store, "_sig_meta.json")) as f:
        assert json.load(f)["n_batches"] > n_before  # appended, not reset


def _live_vector_rows(spark, store, meta):
    """Layout-aware published-rows reader for vector-store assertions
    (round 17: new stores default to the object layout, so the tests
    read whichever layout the manifest declares — the same dispatch the
    store's own loaders do)."""
    from palletjack_spark.functions import store as S

    if meta.get("layout") == "objects":
        return S.live_object_batches(spark, store, "vectors", meta)
    return S.live_batches(spark, store, "vectors", meta["n_batches"])


def test_streaming_vector_ingest_fills_store_and_replay_noops(
    spark, tmp_path
):
    """Q115c end-to-end (round 15): bootstrap on slice 0, stream slices
    1-3 into the persisted vector store via foreachBatch — afterwards
    the store holds the WHOLE corpus (bootstrap + 3 published appends,
    per-batch ledger consistent), and replaying the exact epoch the
    stream recorded is a no-op with a byte-identical manifest.  Since
    round 17 the store lands under the rename-free OBJECT layout (the
    new default), so this also pins the streaming ingest through it."""
    import json
    import os

    from pyspark.sql import functions as F

    from palletjack_spark.functions import store as S
    from palletjack_spark.functions.similarity import append_vectors
    from palletjack_spark.streaming.ops import streaming_vector_ingest
    from palletjack_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "vstore")
    topk = streaming_vector_ingest(spark, sf, store_dir=store)
    assert topk.count() == 5 * 10  # 5 queries x k=10
    with open(os.path.join(store, "_ann_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["n_batches"]) == 4  # bootstrap + 3 streamed slices
    assert len(meta.get("epochs", [])) == 3
    emb = load_table(spark, sf, "embeddings")
    want = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    got = sorted(
        r["vec_id"]
        for r in _live_vector_rows(spark, store, meta)
        .select("vec_id")
        .collect()
    )
    assert got == want  # nothing lost, nothing doubled
    # the per-batch ledger (bootstrap + 3 streamed slices) accounts for
    # exactly the whole corpus
    assert sum(meta["n_vectors"]) == len(want)
    # at-least-once replay of the newest streamed epoch: a no-op that
    # publishes nothing and leaves the manifest byte-identical
    replay = emb.where(F.col("vec_id") % 4 == 1)
    assert append_vectors(replay, store, epoch=meta["epochs"][-1]) == 0
    with open(os.path.join(store, "_ann_meta.json")) as f:
        assert json.load(f) == meta


def test_streaming_lm_ingest_equals_one_shot_and_replay_noops(
    spark, tmp_path
):
    """Q115d end-to-end (round 15): counts are additive, so the
    streamed store (bootstrap slice 1 + streamed slices 2-3) must equal
    a ONE-SHOT count over doc_id % 4 != 0 — and replaying the exact
    epoch the stream recorded double-counts nothing."""
    import json
    import os

    from pyspark.sql import functions as F

    from palletjack_spark.functions.text import (
        _lm_counts,
        append_lm_counts,
        load_lm_tables,
    )
    from palletjack_spark.streaming.ops import streaming_lm_ingest
    from palletjack_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "lmstore")
    scored = streaming_lm_ingest(spark, sf, store_dir=store)
    docs = load_table(spark, sf, "documents")
    assert scored.count() == docs.where(F.col("doc_id") % 4 == 0).count()
    with open(os.path.join(store, "_lm_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["n_batches"]) == 3  # bootstrap + 2 streamed slices
    assert len(meta.get("epochs", [])) == 2
    big, uni = load_lm_tables(spark, store)
    ref_big, ref_uni = _lm_counts(
        docs.where(F.col("doc_id") % 4 != 0), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )
    # replay of the newest streamed epoch: nothing double-counted
    append_lm_counts(
        docs.where(F.col("doc_id") % 4 == 2),
        "text",
        "doc_id",
        store,
        epoch=meta["epochs"][-1],
    )
    with open(os.path.join(store, "_lm_meta.json")) as f:
        assert json.load(f) == meta
    big2, _ = load_lm_tables(spark, store)
    assert sorted(tuple(r) for r in big2.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )


def test_concurrent_lm_ingest_equals_one_shot_and_replay_noops(
    spark, tmp_path
):
    """Q115e end-to-end (round 15): two SIMULTANEOUS streams appending
    to one LM store through the multi-writer CAS path must together
    equal a one-shot count over doc_id % 4 != 0, with both streams'
    epochs recorded and a replayed micro-batch of either stream a
    CAS-path no-op (returns -1, nothing double-counted)."""
    import json
    import os

    from pyspark.sql import functions as F

    from palletjack_spark.functions.text import (
        _lm_counts,
        append_lm_counts_concurrent,
        load_lm_tables,
    )
    from palletjack_spark.streaming.ops import streaming_lm_ingest_concurrent
    from palletjack_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "clmstore")
    scored = streaming_lm_ingest_concurrent(spark, sf, store_dir=store)
    docs = load_table(spark, sf, "documents")
    assert scored.count() == docs.where(F.col("doc_id") % 4 == 0).count()
    with open(os.path.join(store, "_lm_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["n_batches"]) == 3  # bootstrap + one slot per stream
    tags = sorted(e.split(":")[1] for e in meta.get("epochs", []))
    assert tags == ["a", "b"]  # both writers' epochs recorded
    big, uni = load_lm_tables(spark, store)
    ref_big, ref_uni = _lm_counts(
        docs.where(F.col("doc_id") % 4 != 0), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )
    # replay of either stream's recorded epoch through the CAS path:
    # -1, manifest byte-identical, nothing double-counted
    assert (
        append_lm_counts_concurrent(
            docs.where(F.col("doc_id") % 4 == 2),
            "text",
            "doc_id",
            store,
            epoch=meta["epochs"][0],
        )
        == -1
    )
    with open(os.path.join(store, "_lm_meta.json")) as f:
        assert json.load(f) == meta


def test_concurrent_vector_ingest_fills_store_and_replay_noops(
    spark, tmp_path
):
    """Q115f end-to-end (round 15): two SIMULTANEOUS streams appending
    encoded batches to one vector store through the multi-writer CAS
    path — every vector lands exactly once (per-slot ledger consistent),
    both streams' epochs are recorded, and a replayed micro-batch of
    either stream is a CAS no-op (returns -1, manifest byte-identical)."""
    import json
    import os

    from pyspark.sql import functions as F

    from palletjack_spark.functions import store as S
    from palletjack_spark.functions.similarity import (
        append_vectors_concurrent,
    )
    from palletjack_spark.streaming.ops import (
        streaming_vector_ingest_concurrent,
    )
    from palletjack_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "cvstore")
    topk = streaming_vector_ingest_concurrent(spark, sf, store_dir=store)
    assert topk.count() == 5 * 10
    with open(os.path.join(store, "_ann_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["n_batches"]) == 4  # bootstrap + 3 streamed slices
    tags = sorted(e.split(":")[1] for e in meta.get("epochs", []))
    assert tags == ["a", "b", "b"]  # one A micro-batch, two B
    emb = load_table(spark, sf, "embeddings")
    want = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    got = sorted(
        r["vec_id"]
        for r in _live_vector_rows(spark, store, meta)
        .select("vec_id")
        .collect()
    )
    assert got == want  # nothing lost, nothing doubled under concurrency
    assert sum(meta["n_vectors"]) == len(want)
    # replay of either stream's recorded epoch through the CAS path
    replay = emb.where(F.col("vec_id") % 4 == 1)
    assert (
        append_vectors_concurrent(replay, store, epoch=meta["epochs"][0])
        == -1
    )
    with open(os.path.join(store, "_ann_meta.json")) as f:
        assert json.load(f) == meta
