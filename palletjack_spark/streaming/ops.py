"""Structured Streaming operators (SURVEY §2.2 Q70-Q75).

Every operator is written against a DataFrame that may be a stream or a
batch — the *same* code path is verified two ways: batch-mode against the
DuckDB oracle (driver correctness gate) and stream-mode (file source →
availableNow → memory sink) against the batch result in tests.

The events fixture is timestamp[ns], which neither the batch nor the
streaming native parquet source accepts; ``events_stream`` stages a
microsecond copy once per scale factor (written by our arrow scan → normal
parquet), then streams from that directory — at production scale this
staging is the ingest job itself.

Scale notes: windowed aggregations keep state per (key × window); the
watermark bounds that state.  ``session_window`` merges via the built-in
state store.  Stream-static joins broadcast the static side per microbatch.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.tables import load_table



def _staging_key(sf_dir: str, table: str) -> str:
    """Collision-free staging-dir key (round-13 review: the old
    separator-flattening let /data/sf_1 and /data/sf/1 share a staged
    copy): readable prefix + md5 of the absolute path."""
    import hashlib

    absd = os.path.abspath(sf_dir)
    tag = hashlib.md5(absd.encode()).hexdigest()[:10]
    base = os.path.basename(absd.rstrip("/")) or "root"
    return f"pjspark_{base}_{tag}_{table}"


def _source_sig(sf_dir: str, table: str) -> str:
    """Signature of the source parquet (name+mtime+size per FILE) — a
    regenerated table under the same path must invalidate the staged
    copy.  Walks directory tables per-file (round-15 ADVICE, applied
    here too): rewriting part files inside a Spark-written directory
    need not change the directory's own mtime/size, so a single stat
    could serve stale staged slices; the single stat remains only as
    the plain-file fallback."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(p):
            parts = []
            for root, _dirs, files in sorted(os.walk(p)):
                for fn in sorted(files):
                    st = os.stat(os.path.join(root, fn))
                    parts.append(f"{root}/{fn}:{st.st_mtime_ns}:{st.st_size}")
            return ";".join(parts)
        st = os.stat(p)
        return f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        return "absent"


def _stage_is_fresh(marker: str, sig: str) -> bool:
    try:
        with open(marker) as f:
            return f.read().strip() == sig
    except OSError:
        return False


def _staged_events_dir(sf_dir: str) -> str:
    return os.path.join(tempfile.gettempdir(), _staging_key(sf_dir, "events_us"))


def stage_events_us(spark: SparkSession, sf_dir: str) -> str:
    """Write a microsecond-precision copy of events once per source
    signature (a regenerated events table invalidates the staged copy)."""
    out = _staged_events_dir(sf_dir)
    marker = os.path.join(out, "_PJ_STAGED")
    sig = _source_sig(sf_dir, "events")
    if not _stage_is_fresh(marker, sig):
        # 4 files → 4 micro-batches under maxFilesPerTrigger=1: multi-batch
        # semantics stay observable without paying per-batch overhead ×32
        load_table(spark, sf_dir, "events").coalesce(4).write.mode(
            "overwrite"
        ).parquet(out)
        with open(marker, "w") as f:
            f.write(sig)
    return out


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream (schema pinned, one file per batch)."""
    path = stage_events_us(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def run_stream_to_table(sdf: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink as a batch DataFrame."""
    name = "pj_sink_" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


# --- operators (stream- and batch-applicable) ------------------------------


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Q70: 10-minute tumbling window — count + decimal-exact value sum."""
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Q71: 10-minute window sliding every 5 minutes."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def session_agg(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """Q72: per-user session windows with a 5-minute inactivity gap."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermarked_append_counts(events: DataFrame) -> DataFrame:
    """Q73: tumbling counts under a 10-minute watermark.  In append mode
    only windows the watermark has passed are emitted; later-than-watermark
    data would be dropped — the late-data policy under test."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # LTZ round-trip is value-preserving
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str]) -> DataFrame:
    """Q74: stateful dedup bounded by the watermark (state is evicted once
    the watermark passes, so memory is bounded at 100 TB stream rates)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(keys)
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Q76: custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for operators the built-in streaming state machinery can't
    express (reference-world: whatever the host does with its own state).

    Keeps (n_events, value_millis) per user in the state store and emits the
    running totals each micro-batch; the *last* emission per user equals the
    batch aggregate, which is how the oracle checks it.  Value is
    accumulated as floor(value·1000) integers so the cross-batch sum is
    bit-deterministic in every engine.

    Scale: state is one struct per user key, partitioned by the groupBy
    hash — the same layout Spark's own streaming aggs use; a watermark-based
    timeout (GroupStateTimeout.EventTimeTimeout) would bound state for
    unbounded key spaces."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, millis = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            millis += int(np_floor_millis(pdf["value"]))
        state.update((n, millis))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_millis": [millis]}
        )

    def np_floor_millis(values) -> int:
        import numpy as np

        return int(np.floor(values.to_numpy(dtype="float64") * 1000).astype("int64").sum())

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_millis long",
        stateStructType="n long, millis long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def click_view_stream_join(events: DataFrame, how: str = "inner") -> DataFrame:
    """Q77/Q77b: stream-stream interval join — clicks matched to the same
    user's views within the following 10 minutes.  Both sides carry
    watermarks, so join state is bounded: a buffered click can be evicted
    once the view watermark passes its 10-minute window (the property that
    makes stream-stream joins feasible at unbounded input).

    ``how="leftOuter"`` (Q77b) additionally emits each unmatched click
    exactly once, null-padded, WHEN its join window closes — i.e. when the
    query watermark (the MIN of both sides' watermarks) passes
    ``click_ts + 10 minutes``.  Matched pairs still emit eagerly.  That
    timing rule is part of the declared semantics: the batch oracle is the
    left interval join restricted to matched rows plus unmatched clicks
    whose window closed under the FINAL watermark
    ``least(max(click_ts), max(view_ts)) - 10 minutes`` — verified to
    reproduce the streamed result row-for-row."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").cast("timestamp").alias("cts"),
        )
        .withWatermark("cts", "10 minutes")
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("vu"),
            F.col("ts").cast("timestamp").alias("vts"),
        )
        .withWatermark("vts", "10 minutes")
    )
    return clicks.join(
        views,
        (F.col("cu") == F.col("vu"))
        & (F.col("vts") >= F.col("cts"))
        & (F.col("vts") <= F.col("cts") + F.expr("INTERVAL 10 MINUTES")),
        how,
    ).select(
        "click_id",
        "view_id",
        F.col("cu").alias("user_id"),
        F.col("cts").cast("timestamp_ntz").alias("click_ts"),
        F.col("vts").cast("timestamp_ntz").alias("view_ts"),
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Q75: stream ⋈ static dimension (broadcast per microbatch) + agg."""
    joined = events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def materialized_rollup(
    spark: SparkSession, sf_dir: str, mv_dir: str
) -> DataFrame:
    """Q78: streaming materialized view (continuous-aggregate / hypertable
    rollup pattern): each micro-batch appends its PARTIAL per-window
    aggregates to a parquet "view" via ``foreachBatch``; readers merge
    partials with a final re-aggregate.  Append-only partials make the
    sink idempotent-per-batch and the merge associative — the standard
    incremental-rollup design at ingest scale, where rewriting the full
    aggregate per batch would be O(history).
    """
    import shutil

    shutil.rmtree(mv_dir, ignore_errors=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            tumbling_counts(batch_df)
            .write.mode("append")
            .parquet(mv_dir)
        )

    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(upsert)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(mv_dir)
        .groupBy("window_start", "window_end")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("sum_value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Q79: the Spark 4 arbitrary-state API — ``transformWithStateInPandas``
    with a ``StatefulProcessor`` — computing the same per-user running
    totals as Q76's ``applyInPandasWithState``.

    Why both exist: transformWithState is the successor API (typed state
    handles — value/list/map — plus timers and TTL) and requires the
    RocksDB state store provider, which is also the provider that scales:
    changelog-checkpointed, memory-bounded state vs the HDFS-backed
    provider's full in-heap map.  Same millis-integer accumulation as Q76,
    so the cross-batch totals are bit-deterministic and the batch aggregate
    is the oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", "n long, millis long")

        def handleInputRows(self, key, rows, timer_values):
            n, millis = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                millis += int(
                    np.floor(pdf["value"].to_numpy(dtype="float64") * 1000)
                    .astype("int64")
                    .sum()
                )
            self._totals.update((n, millis))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_millis": [millis]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, value_millis long",
        outputMode="Update",
        timeMode="None",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def with_rocksdb_state(spark: SparkSession):
    """Context manager: run a streaming query on the RocksDB state store
    (required by transformWithState; also the 100 TB-scale provider),
    restoring the session's previous provider afterwards."""
    import contextlib

    key = "spark.sql.streaming.stateStore.providerClass"

    @contextlib.contextmanager
    def cm():
        prev = spark.conf.get(key, None)
        spark.conf.set(key, ROCKSDB_PROVIDER)
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return cm()


def _staged_documents_dir(sf_dir: str) -> str:
    return os.path.join(tempfile.gettempdir(), _staging_key(sf_dir, "documents"))


def stage_documents(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents for file-source streaming, once per source
    signature (the events staging idiom: 4 files → multi-batch
    semantics observable; a regenerated table invalidates the copy)."""
    out = _staged_documents_dir(sf_dir)
    marker = os.path.join(out, "_PJ_STAGED")
    sig = _source_sig(sf_dir, "documents")
    if not _stage_is_fresh(marker, sig):
        load_table(spark, sf_dir, "documents").coalesce(4).write.mode(
            "overwrite"
        ).parquet(out)
        with open(marker, "w") as f:
            f.write(sig)
    return out


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a file-source stream (schema pinned, one file/batch)."""
    path = stage_documents(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def streaming_curation_counts(docs: DataFrame) -> DataFrame:
    """Streaming corpus curation (Q115): row-local quality gates (bad-word
    fraction, minimum length) → stateful exact dedup on (source,
    content-hash) → per-source kept-document counts.

    The dedup state key is (source, md5) so the aggregate is ORDER-FREE:
    whichever duplicate arrives first, the per-source count is the count
    of distinct surviving hashes — a batch replay produces the identical
    table, which is what makes the streaming run oracle-checkable.
    Unbounded ingest would grow the dedup state forever; production runs
    bound it with dropDuplicatesWithinWatermark on the ingest timestamp
    (the Q74 idiom) — the fixture table has no event time, so this demo
    keeps global state."""
    from palletjack_spark.functions.text import badword_keep

    return (
        docs.where(badword_keep("text"))
        .where(F.length("text") >= 100)
        .select("source", F.md5("text").alias("h"))
        .dropDuplicates(["source", "h"])
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )


# --- q115b: streaming ingest composed with the persisted signature store ---


def _staged_doc_slices_dir(sf_dir: str, n_slices: int) -> str:
    return os.path.join(
        tempfile.gettempdir(), _staging_key(sf_dir, f"docslices{n_slices}")
    )


def stage_document_slices(
    spark: SparkSession, sf_dir: str, n_slices: int = 4
) -> str:
    """Stage documents as ``n_slices`` single-file crawl batches (slice
    i = ``doc_id % n_slices == i``) with STRICTLY INCREASING mtimes, so
    the file stream's oldest-first ordering processes them in slice
    order — the batching must be deterministic for the dedup loop's
    batch replay to be an exact oracle (near-dup acceptance is
    order-dependent when a doc matches only a REJECTED doc; pinning the
    batch assignment and order pins the semantics).  Once per sf_dir."""
    import glob
    import shutil
    import time

    out = _staged_doc_slices_dir(sf_dir, n_slices)
    marker = os.path.join(out, "_READY")
    sig = _source_sig(sf_dir, "documents")
    if _stage_is_fresh(marker, sig):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    base = time.time() - 3600
    for i in range(n_slices):
        tmp = out + f"_tmp{i}"
        docs.where(F.col("doc_id") % n_slices == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out, f"slice-{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base + 60 * i, base + 60 * i))
        shutil.rmtree(tmp, ignore_errors=True)
    with open(marker, "w") as f:
        f.write(sig)
    return out


def streaming_incremental_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    threshold_milli: int = 500,
    store_dir: str | None = None,
) -> DataFrame:
    """The production ingest LOOP the round-12 stores imply (round-12
    verdict item 4): documents arrive as a real file stream; each
    micro-batch is near-dup deduped against the PERSISTED signature
    store (q156's ``incremental_dedup`` — the store side never
    exchanges, the corpus text is never rescanned) and the ACCEPTED
    docs' signatures are appended back under the store's crash-atomic
    manifest commit — curation state advances with ingest, no batch
    sweep ever runs.

    Returns one decision row per document: (doc_id, batch, accepted,
    dup_of, jaccard_milli).  ``batch`` is the micro-batch epoch that
    processed the doc; the staged slices make it ``doc_id % n_slices``
    by construction, and the oracle asserts exactly that — a change in
    Spark's file-ordering behavior fails the hash gate rather than
    silently changing semantics.

    Scale shape: per batch everything q156 pins holds (batch-side
    broadcast joins, store scanned once map-side, no old×old pairs);
    across batches the store only ever APPENDS (one new parquet batch
    dir + manifest rename per trigger) — at 100 TB this loop is the
    ingest job itself, and the store is the only state, O(corpus)
    narrow signature rows, not text."""
    import uuid

    from palletjack_spark.functions.dedup import save_signature_store

    path = stage_document_slices(spark, sf_dir, n_slices)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    run_id = uuid.uuid4().hex[:8]
    if store_dir is None:
        store_dir = os.path.join(
            tempfile.gettempdir(), f"pjspark_q115b_store_{run_id}"
        )
    dec_dir = os.path.join(tempfile.gettempdir(), f"pjspark_q115b_dec_{run_id}")
    # bootstrap an EMPTY store — but only when none exists: a caller
    # continuing ingest against a real persisted store must NOT have it
    # silently wiped to one empty batch (round-13 review: the
    # unconditional bootstrap overwrote batch=0 and reset the manifest,
    # orphaning every prior batch — near-dups of prior ingest would
    # have been re-accepted as originals)
    from palletjack_spark.functions.dedup import _SIG_META_NAME

    if not os.path.exists(os.path.join(store_dir, _SIG_META_NAME)):
        save_signature_store(
            spark.createDataFrame([], schema), "text", "doc_id", store_dir
        )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        _ingest_epoch(
            batch_df, int(batch_id), store_dir, dec_dir, run_id,
            threshold_milli,
        )

    q = (
        stream.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            os.path.join(
                tempfile.gettempdir(), f"pjspark_q115b_ckpt_{run_id}"
            ),
        )
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(dec_dir)
        .select(
            "doc_id",
            F.col("batch").cast("long").alias("batch"),
            "accepted",
            "dup_of",
            "jaccard_milli",
        )
        .orderBy("doc_id")
    )


def _ingest_epoch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    dec_dir: str,
    run_id: str,
    threshold_milli: int,
) -> None:
    """One micro-batch of the q115b ingest loop, IDEMPOTENT under
    Spark's at-least-once foreachBatch replay (round-14 ADVICE: the
    previous form appended decision rows with ``mode("append")`` and
    unconditionally re-ran ``append_signatures`` — a retried epoch
    duplicated both the per-doc decisions and the published signature
    batch, failing the oracle hash gate nondeterministically).  Both
    side effects key on the epoch: decisions land in a
    ``batch=<epoch>`` partition dir OVERWRITTEN per epoch, and the
    signature append carries an epoch marker the store manifest
    records, so a replay rewrites identical bytes / no-ops instead of
    duplicating."""
    from palletjack_spark.functions import store as S
    from palletjack_spark.functions.dedup import (
        _SIG_META_NAME,
        append_signatures,
        incremental_dedup,
        load_signature_store,
    )

    epoch = f"{run_id}:{batch_id}"
    meta = S.load_manifest(store_dir, _SIG_META_NAME)
    if S.epoch_seen(meta, epoch):
        # fully replayed epoch: the signature append committed, so the
        # decision write before it landed too.  Recomputing here would
        # be WRONG, not just wasteful — the store now holds this
        # batch's own signatures, so its docs would match themselves
        # and the replay would flip accepted -> dup_of(self).
        return

    sp = batch_df.sparkSession
    store = load_signature_store(sp, store_dir)
    decisions, accepted = incremental_dedup(
        batch_df, "text", "doc_id", store, threshold_milli=threshold_milli
    )
    decisions.write.mode("overwrite").parquet(
        os.path.join(dec_dir, f"batch={batch_id}")
    )
    append_signatures(accepted, store_dir, epoch=epoch)


# --- q115c/q115d: streaming ingest into the vector and LM stores ------------
# (round-15 verdict item 4: the epoch replay guard covers all three
# incremental stores, but only the signature store had a streaming
# composition row — these wire a REAL file stream's foreachBatch to
# append_vectors / append_lm_counts under the same discipline.)


def stage_table_slices(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    id_col: str,
    n_slices: int = 4,
) -> str:
    """Stage any fixture table as ``n_slices`` single-file crawl batches
    (slice i = ``id % n_slices == i``) with strictly increasing mtimes —
    the generic form of :func:`stage_document_slices` (kept as-is for
    q115b's staged-dir compatibility).  Once per (sf_dir, table)."""
    import glob
    import shutil
    import time

    out = os.path.join(
        tempfile.gettempdir(), _staging_key(sf_dir, f"{table}slices{n_slices}")
    )
    marker = os.path.join(out, "_READY")
    sig = _source_sig(sf_dir, table)
    if _stage_is_fresh(marker, sig):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    rows = load_table(spark, sf_dir, table)
    base = time.time() - 3600
    for i in range(n_slices):
        tmp = out + f"_tmp{i}"
        rows.where(F.col(id_col) % n_slices == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(out, f"slice-{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base + 60 * i, base + 60 * i))
        shutil.rmtree(tmp, ignore_errors=True)
    with open(marker, "w") as f:
        f.write(sig)
    return out


def _run_slice_ingest(
    spark: SparkSession,
    path: str,
    glob_filter: str,
    ckpt_key: str,
    ingest,
) -> None:
    """Drive one availableNow file-stream pass over the staged slices
    matched by ``glob_filter``, one file per trigger, calling
    ``ingest(batch_df, batch_id)`` per micro-batch."""
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob_filter)
        .parquet(path)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"pjspark_ckpt_{ckpt_key}"),
        )
        .start()
    )
    q.awaitTermination()


def streaming_vector_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    store_dir: str | None = None,
) -> DataFrame:
    """Streaming crawl ingest into the PERSISTED vector store (q115c):
    the store is bootstrapped (codebooks trained once) on slice 0 of
    the embeddings table; slices 1..n-1 then arrive as a real file
    stream whose foreachBatch encodes each batch against the PERSISTED
    codebooks and appends it under the store's crash-atomic manifest
    commit (``append_vectors`` — zero training jobs on the ingest
    path), carrying the shared epoch marker so an at-least-once replay
    of a micro-batch can never publish its vectors twice
    (functions/store.epoch_seen; the replay no-op is pinned end-to-end
    in tests/test_streaming.py).  After the stream drains, the store
    holds the WHOLE corpus, and the exhaustive-settings
    ``vector_store_topk`` is exact brute force — hash-identical to the
    q92 oracle.

    Scale shape: each micro-batch's only work is one zero-shuffle
    assign+encode pass over the batch plus a manifest rename — the
    at-rest store is never rescanned, never exchanged; at 100 TB this
    IS the embedding-ingest job, with the stream source swapped for the
    crawl bus."""
    from palletjack_spark.functions.similarity import (
        _ANN_META_NAME,
        append_vectors,
        save_vector_store,
        vector_store_topk,
    )

    if not 2 <= n_slices <= 10:
        raise ValueError(
            "n_slices must be in [2, 10] (the slice glob is a single-digit "
            f"character class), got {n_slices}"
        )
    path = stage_table_slices(spark, sf_dir, "embeddings", "vec_id", n_slices)
    emb = load_table(spark, sf_dir, "embeddings")
    run_id = uuid.uuid4().hex[:8]
    if store_dir is None:
        store_dir = os.path.join(
            tempfile.gettempdir(), f"pjspark_q115c_store_{run_id}"
        )
    # bootstrap only when no store exists (the q115b rule: a caller
    # continuing ingest against a real store must not have it wiped)
    if not os.path.exists(os.path.join(store_dir, _ANN_META_NAME)):
        save_vector_store(
            emb.where(F.col("vec_id") % n_slices == 0),
            store_dir,
            n_centroids=16,
        )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        append_vectors(batch_df, store_dir, epoch=f"{run_id}:{int(batch_id)}")

    _run_slice_ingest(
        spark,
        path,
        f"slice-[1-{n_slices - 1}].parquet",
        f"q115c_{run_id}",
        ingest,
    )
    queries = emb.where(F.col("vec_id") < 5)
    return vector_store_topk(
        spark, store_dir, queries, k=10, n_probes=16, shortlist=1_000_000
    )


def streaming_lm_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    store_dir: str | None = None,
) -> DataFrame:
    """Streaming crawl ingest into the PERSISTED LM count store
    (q115d): the store is bootstrapped on slice 1 of the documents
    table; slices 2..n-1 then arrive as a real file stream whose
    foreachBatch counts ONLY the batch and appends the deltas under one
    manifest commit (``append_lm_counts`` — the store is never
    rescanned), carrying the shared epoch marker so a replayed
    micro-batch can never double-count (pinned end-to-end in
    tests/test_streaming.py).  Counts are additive, so the streamed
    store ≡ a one-shot train over slices 1..n-1 — the held-out slice 0
    is then scored against it, and the result matches the q157-shape
    oracle with train = ``doc_id % n != 0`` exactly.

    Scale shape: per micro-batch one map-side-combined count over the
    batch (Zipf-sublinear output) + a manifest rename; scoring reads
    the at-rest count tables once."""
    from palletjack_spark.functions.text import (
        _LM_META_NAME,
        append_lm_counts,
        bigram_lm_score_store,
        save_lm_store,
    )

    if not 3 <= n_slices <= 10:
        raise ValueError(
            "n_slices must be in [3, 10] (bootstrap slice 1 + streamed "
            f"slices 2..n-1, single-digit glob class), got {n_slices}"
        )
    path = stage_document_slices(spark, sf_dir, n_slices)
    docs = load_table(spark, sf_dir, "documents")
    run_id = uuid.uuid4().hex[:8]
    if store_dir is None:
        store_dir = os.path.join(
            tempfile.gettempdir(), f"pjspark_q115d_store_{run_id}"
        )
    if not os.path.exists(os.path.join(store_dir, _LM_META_NAME)):
        save_lm_store(
            docs.where(F.col("doc_id") % n_slices == 1),
            "text",
            "doc_id",
            store_dir,
        )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        append_lm_counts(
            batch_df,
            "text",
            "doc_id",
            store_dir,
            epoch=f"{run_id}:{int(batch_id)}",
        )

    _run_slice_ingest(
        spark,
        path,
        f"slice-[2-{n_slices - 1}].parquet",
        f"q115d_{run_id}",
        ingest,
    )
    return bigram_lm_score_store(
        spark, docs.where(F.col("doc_id") % n_slices == 0), "text", "doc_id",
        store_dir,
    )


def streaming_lm_ingest_concurrent(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    store_dir: str | None = None,
    layout: str = "slots",
) -> DataFrame:
    """TWO ingest streams sharing ONE LM store via multi-writer CAS
    appends (q115e, round 15): production crawl ingest is many parallel
    jobs, not one stream, and the single-writer append contract the
    q115d loop uses would silently lose batches under that concurrency.
    Stream A carries slice 2 and stream B slice 3 (store bootstrapped
    on slice 1); both run availableNow SIMULTANEOUSLY from separate
    checkpoints, each micro-batch appending through
    ``append_lm_counts_concurrent`` — the slot-claim CAS protocol plus
    the round-15 epoch extension, so a replayed micro-batch of EITHER
    stream is a no-op even under the multi-writer path.  Counts are
    additive, so ANY interleaving of the two writers' slots ≡ a
    one-shot train over slices 1..n-1; the held-out slice 0 is scored
    against the store and matches the q157-shape oracle exactly.

    Scale shape: per micro-batch one map-side-combined count over the
    batch + one claim/rename/commit; contention cost is the claim
    retry loop, never a lost batch or a store rescan.

    ``layout``: the store's data layout — ``"slots"`` (rename-based
    ``batch=N``) or ``"objects"`` (round 16: rename-free immutable
    objects listed by the manifest, commits serialized by the fenced
    generation alone — q115g runs this same composition through it)."""
    from palletjack_spark.functions.text import (
        _LM_META_NAME,
        append_lm_counts_concurrent,
        bigram_lm_score_store,
        save_lm_store,
    )

    if n_slices != 4:
        raise ValueError(
            "the two-stream composition pins slices: bootstrap 1, stream A "
            f"slice 2, stream B slice 3 (n_slices=4); got {n_slices}"
        )
    path = stage_document_slices(spark, sf_dir, n_slices)
    docs = load_table(spark, sf_dir, "documents")
    run_id = uuid.uuid4().hex[:8]
    qid = "q115e" if layout == "slots" else "q115g"
    if store_dir is None:
        store_dir = os.path.join(
            tempfile.gettempdir(), f"pjspark_{qid}_store_{run_id}"
        )
    if not os.path.exists(os.path.join(store_dir, _LM_META_NAME)):
        save_lm_store(
            docs.where(F.col("doc_id") % n_slices == 1),
            "text",
            "doc_id",
            store_dir,
            layout=layout,
        )
    schema = spark.read.parquet(path).schema

    def start(tag: str, glob: str):
        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            append_lm_counts_concurrent(
                batch_df,
                "text",
                "doc_id",
                store_dir,
                epoch=f"{run_id}:{tag}:{int(batch_id)}",
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", glob)
            .parquet(path)
        )
        return (
            stream.writeStream.foreachBatch(ingest)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                os.path.join(
                    tempfile.gettempdir(),
                    f"pjspark_ckpt_{qid}_{run_id}_{tag}",
                ),
            )
            .start()
        )

    running = [
        start(tag, f"slice-{i}.parquet") for tag, i in (("a", 2), ("b", 3))
    ]
    for q in running:
        q.awaitTermination()
    return bigram_lm_score_store(
        spark,
        docs.where(F.col("doc_id") % n_slices == 0),
        "text",
        "doc_id",
        store_dir,
    )


def stream_reservoir_sample(
    events: DataFrame, key: str = "event_type", k: int = 5
) -> DataFrame:
    """Deterministic per-key reservoir sample over an unbounded stream
    (q76b, round 15): keep the k events with the SMALLEST
    ``md5(event_id)`` priority per key — bottom-k-by-hash is a uniform
    sample that is MERGEABLE (bottom-k of old-bottom-k ∪ new-batch =
    bottom-k of the whole history) and, unlike the classic
    random-replacement reservoir, bit-deterministic, so the streaming
    run is oracle-checkable (the q47e md5-priority discipline).  This is
    the "sample k docs per domain from an unbounded crawl" shape.

    State per key is exactly k (priority, id) pairs + a count — O(keys
    × k), the minimum any per-key sample can hold; at 100 TB stream
    rates an unbounded key space would add an event-time timeout, like
    q76's totals."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    tagged = events.select(
        F.col(key).alias("key"),
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("p"),
    )

    def update(key_, pdfs, state):
        ids: list[int] = []
        prios: list[str] = []
        n = 0
        if state.exists:
            stored_ids, stored_prios, n = state.get
            ids, prios = list(stored_ids), list(stored_prios)
        for pdf in pdfs:
            n += len(pdf)
            ids.extend(int(x) for x in pdf["event_id"])
            prios.extend(str(x) for x in pdf["p"])
        pairs = sorted(zip(prios, ids))[:k]
        prios = [p for p, _ in pairs]
        ids = [i for _, i in pairs]
        state.update((ids, prios, n))
        yield pd.DataFrame(
            {"key": [key_[0]], "n_seen": [n], "ids": [ids]}
        )

    return tagged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType="key string, n_seen long, ids array<long>",
        stateStructType="ids array<long>, prios array<string>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_vector_ingest_concurrent(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    store_dir: str | None = None,
) -> DataFrame:
    """TWO embedding-ingest streams sharing ONE vector store via
    multi-writer CAS appends (q115f, round 15 — q115e's composition for
    the vector store): bootstrap (codebooks trained once) on slice 0;
    stream A carries slice 1 and stream B slices 2..n-1, both running
    availableNow SIMULTANEOUSLY, each micro-batch encoding against the
    PERSISTED codebooks and appending through
    ``append_vectors_concurrent`` — slot-claim CAS plus the epoch
    extension, so a replayed micro-batch of either stream publishes
    nothing (returns -1).  The store is a SET of published batches, so
    any slot interleaving holds the whole corpus and the
    exhaustive-settings query is exact brute force — the q92 oracle,
    now under real writer concurrency."""
    from palletjack_spark.functions.similarity import (
        _ANN_META_NAME,
        append_vectors_concurrent,
        save_vector_store,
        vector_store_topk,
    )

    if n_slices != 4:
        raise ValueError(
            "the two-stream composition pins slices: bootstrap 0, stream A "
            f"slice 1, stream B slices 2-3 (n_slices=4); got {n_slices}"
        )
    path = stage_table_slices(spark, sf_dir, "embeddings", "vec_id", n_slices)
    emb = load_table(spark, sf_dir, "embeddings")
    run_id = uuid.uuid4().hex[:8]
    if store_dir is None:
        store_dir = os.path.join(
            tempfile.gettempdir(), f"pjspark_q115f_store_{run_id}"
        )
    if not os.path.exists(os.path.join(store_dir, _ANN_META_NAME)):
        save_vector_store(
            emb.where(F.col("vec_id") % n_slices == 0),
            store_dir,
            n_centroids=16,
        )
    schema = spark.read.parquet(path).schema

    def start(tag: str, glob: str):
        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            append_vectors_concurrent(
                batch_df, store_dir, epoch=f"{run_id}:{tag}:{int(batch_id)}"
            )

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", glob)
            .parquet(path)
        )
        return (
            stream.writeStream.foreachBatch(ingest)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                os.path.join(
                    tempfile.gettempdir(),
                    f"pjspark_ckpt_q115f_{run_id}_{tag}",
                ),
            )
            .start()
        )

    running = [
        start("a", "slice-1.parquet"),
        start("b", "slice-[2-3].parquet"),
    ]
    for q in running:
        q.awaitTermination()
    queries = emb.where(F.col("vec_id") < 5)
    return vector_store_topk(
        spark, store_dir, queries, k=10, n_probes=16, shortlist=1_000_000
    )
