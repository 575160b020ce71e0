"""Streaming queries (SURVEY §2.2 Q70-Q75), driver-checkable.

Each query runs a *real* Structured Streaming job (file source over the
staged µs events, availableNow trigger, memory sink) and returns the sink
contents; the oracle is the batch SQL equivalent (SURVEY §2.3: streaming's
oracle is the replayed batch query).  Windows are epoch-aligned in both
engines (Spark ``window()`` ↔ DuckDB ``time_bucket``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t
from palletjack_spark.streaming.ops import (
    click_view_stream_join,
    dedup_within_watermark,
    events_stream,
    run_stream_to_table,
    running_totals_stateful,
    session_agg,
    sliding_counts,
    stream_static_join,
    tumbling_counts,
    watermarked_append_counts,
)

_E = "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"


@query(
    "q70_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM {_E} e
    GROUP BY time_bucket(INTERVAL '10 minutes', ts)
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregation [north-star], run as a real stream."""
    return run_stream_to_table(
        tumbling_counts(events_stream(spark, sf_dir)), "complete"
    )


@query(
    "q71_sliding_window",
    oracle=f"""
    WITH b AS (
      SELECT ts, time_bucket(INTERVAL '5 minutes', ts) AS bk FROM {_E} e
    ),
    cand AS (
      SELECT ts, bk AS ws FROM b
      UNION ALL
      SELECT ts, bk - INTERVAL '5 minutes' AS ws FROM b
    )
    SELECT ws AS window_start, ws + INTERVAL '10 minutes' AS window_end,
           COUNT(*) AS n_events
    FROM cand
    WHERE ts >= ws AND ts < ws + INTERVAL '10 minutes'
    GROUP BY ws
    """,
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window aggregation [north-star]: 10-minute windows every 5."""
    return run_stream_to_table(
        sliding_counts(events_stream(spark, sf_dir)), "complete"
    )


@query(
    "q72_session_window",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_id FROM {_E}),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      -- cumsum uses the SAME total order (ts, event_id) as the flag window,
      -- so duplicate timestamps per user can't scramble session assignment
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows [north-star]: 5-minute inactivity gap per user.
    Spark merges events whose timestamp falls strictly inside the previous
    session's [start, last+gap) — the oracle reproduces that with a
    lag/cumsum sessionization."""
    return run_stream_to_table(
        session_agg(events_stream(spark, sf_dir)), "complete"
    )


@query(
    "q73_watermark_append",
    oracle=f"""
    WITH e AS (SELECT ts FROM {_E}),
    cutoff AS (
      SELECT make_timestamp(epoch_ms(MAX(ts)) * 1000 - 600000000) AS wm FROM e
    )
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           COUNT(*) AS n_events
    FROM e, cutoff
    GROUP BY 1, 2
    HAVING window_end <= (SELECT wm FROM cutoff)
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark + append mode [north-star]: only windows the final
    watermark (max event time, ms precision, minus 10 minutes) has passed
    are emitted; unfinalized windows stay in state.  The oracle computes
    the same cutoff."""
    return run_stream_to_table(
        watermarked_append_counts(events_stream(spark, sf_dir)), "append"
    )


@query(
    "q74_stateful_dedup",
    oracle=f"SELECT event_id, user_id, event_type, value FROM {_E} e",
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup within watermark [north-star].  event_id is unique in
    the fixture so the streaming dedup must be the identity set — the
    *mechanism* (state store, watermark eviction) still executes; crafted
    duplicate/late rows are exercised in tests/test_streaming.py."""
    out = dedup_within_watermark(events_stream(spark, sf_dir), ["event_id"])
    return run_stream_to_table(
        out.select("event_id", "user_id", "event_type", "value"), "append"
    )


@query(
    "q77_stream_stream_join",
    oracle=f"""
    SELECT a.event_id AS click_id, b.event_id AS view_id,
           a.user_id,
           a.ts AS click_ts, b.ts AS view_ts
    FROM {_E} a JOIN {_E} b
      ON a.user_id = b.user_id
     AND a.event_type = 'click' AND b.event_type = 'view'
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join [north-star]: clicks ⋈ views of the same
    user within 10 minutes, watermarks bounding the join state on both
    sides.  Over the replayed stream the append-mode result equals the
    batch interval join — the oracle."""
    return run_stream_to_table(
        click_view_stream_join(events_stream(spark, sf_dir)), "append"
    )


@query(
    "q77b_stream_outer_join",
    oracle=f"""
    WITH c AS (
      SELECT event_id AS click_id, user_id AS cu, ts AS cts
      FROM {_E} e WHERE event_type = 'click'),
    v AS (
      SELECT event_id AS view_id, user_id AS vu, ts AS vts
      FROM {_E} e WHERE event_type = 'view'),
    wm AS (
      SELECT LEAST((SELECT MAX(cts) FROM c), (SELECT MAX(vts) FROM v))
               - INTERVAL 10 MINUTE AS w),
    j AS (
      SELECT c.click_id, v.view_id, c.cu, c.cts, v.vts
      FROM c LEFT JOIN v
        ON cu = vu AND vts >= cts AND vts <= cts + INTERVAL 10 MINUTE)
    SELECT click_id, view_id, cu AS user_id,
           cts AS click_ts, vts AS view_ts
    FROM j, wm
    WHERE view_id IS NOT NULL OR cts + INTERVAL 10 MINUTE <= w
    """,
)
def q77b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join [north-star]: q77's
    click⋈view join, but every click with NO view inside its 10-minute
    window is also emitted, null-padded, once the window provably closes
    — the shape behind "send a nudge if the user didn't follow up".

    Outer emission timing is watermark-determined, and the oracle
    encodes it EXACTLY (not approximately): matched pairs emit eagerly
    (≡ the inner join), and an unmatched click emits iff its window end
    is at or below the final query watermark
    ``least(max(click_ts), max(view_ts)) - 10min`` — the MIN-combined
    two-input watermark Structured Streaming itself maintains.  A
    trailing click whose window never closes is withheld by BOTH the
    stream and the oracle, so the replayed availableNow run equals the
    SQL row-for-row (verified: 6 matched + 1999 closed at sf0.01, with
    exactly one open click withheld).  State stays bounded by the
    10-minute window on both sides, identical to q77."""
    return run_stream_to_table(
        click_view_stream_join(events_stream(spark, sf_dir), "leftOuter"),
        "append",
    )


@query(
    "q76_custom_stateful",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 1000) AS BIGINT))
                AS BIGINT) AS value_millis
    FROM {_E} e GROUP BY user_id
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator [north-star]: applyInPandasWithState running
    totals per user.  Each micro-batch emits the updated totals; the last
    emission per user (the one with the highest n_events) must equal the
    batch aggregate — which is exactly what the oracle computes."""
    out = run_stream_to_table(
        running_totals_stateful(events_stream(spark, sf_dir)), "update"
    )
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_millis", "n_events").alias("value_millis"),
    )


@query(
    "q75_stream_static_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM {_E} e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join [north-star]: stream ⋈ broadcast dimension."""
    customer = t(spark, sf_dir, "customer")
    return run_stream_to_table(
        stream_static_join(events_stream(spark, sf_dir), customer), "complete"
    )


@query(
    "q78_streaming_mv",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM {_E} e
    GROUP BY time_bucket(INTERVAL '10 minutes', ts)
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized view via foreachBatch [north-star]: per-batch
    partial window aggregates appended to a parquet view, merged on read —
    the continuous-aggregate (hypertable rollup) pattern.  The merged view
    must equal the batch aggregate exactly (decimal partials re-summed)."""
    import os
    import tempfile

    from palletjack_spark.streaming.ops import materialized_rollup

    key = sf_dir.strip("/").replace("/", "_")
    mv_dir = os.path.join(tempfile.gettempdir(), f"pjspark_{key}_q78_mv")
    return materialized_rollup(spark, sf_dir, mv_dir)


# q79 (transformWithStateInPandas running totals, streaming/ops.py:
# running_totals_tws) is implemented but NOT registered: the Spark 4
# transformWithState Python side imports google.protobuf, which this
# container does not ship — the operator is exercised by a skip-gated
# test (tests/test_streaming.py) instead of the driver gate.


@query(
    "q115_streaming_curation",
    oracle="""
    SELECT source, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_docs
    FROM documents
    WHERE CAST(len(list_filter(string_split(text, ' '),
                               w -> w IN ('slow', 'big', 'dup'))) AS DOUBLE)
            / len(string_split(text, ' ')) <= 0.08
      AND length(text) >= 100
    GROUP BY source
    """,
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus curation (Q115): documents arrive as a real file
    stream (availableNow, multi-batch), pass row-local quality gates
    (bad-word fraction, min length — zero-shuffle, same exprs as Q113),
    dedup statefully on (source, content-hash), and aggregate per-source
    kept counts.  The training-data INGESTION shape: curation decisions
    made on arrival, not in a later batch sweep.  The dedup key makes the
    result arrival-order-free, so the batch replay is an exact oracle
    (streaming/ops.py:streaming_curation_counts)."""
    from palletjack_spark.streaming.ops import (
        documents_stream,
        run_stream_to_table,
        streaming_curation_counts,
    )

    return run_stream_to_table(
        streaming_curation_counts(documents_stream(spark, sf_dir)), "complete"
    )


@query(
    "q78b_streaming_upsert",
    oracle=f"""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM {_E} e
    ) WHERE rn = 1
    """,
)
def q78b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert into a parquet target (Q78b): ``foreachBatch``
    merges each micro-batch into a latest-event-per-user table — the
    standard CDC-to-lake pattern when no table format is available
    (per-batch copy-on-write, the Q09c move driven by a stream).  The
    merge key is (ts DESC, event_id DESC) per user, so the final state
    is ARRIVAL-ORDER-FREE — any micro-batching of the same events
    converges to the same table, which is what makes the batch replay an
    exact oracle."""
    import os
    import tempfile
    import uuid

    from pyspark.sql import Window
    from palletjack_spark.streaming.ops import events_stream

    target = os.path.join(
        tempfile.gettempdir(), f"pjspark_q78b_{uuid.uuid4().hex[:8]}"
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        latest_new = (
            batch_df.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(
                        F.col("ts").desc(), F.col("event_id").desc()
                    )
                ),
            )
            .where(F.col("rn") == 1)
            .select("user_id", "event_id", "ts", "value")
        )
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            existing = sp.read.parquet(target)
            merged = (
                existing.unionByName(latest_new)
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("user_id").orderBy(
                            F.col("ts").desc(), F.col("event_id").desc()
                        )
                    ),
                )
                .where(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = latest_new
        # rewrite via a staging dir: the target must stay readable for
        # the NEXT batch's merge (copy-on-write, not in-place truncate)
        staging = target + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        sp.read.parquet(staging).write.mode("overwrite").parquet(target)

    q = (
        events_stream(spark, sf_dir)
        .writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            os.path.join(tempfile.gettempdir(), f"pjspark_q78b_ckpt_{uuid.uuid4().hex[:8]}"),
        )
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


#: q79 streaming CMS geometry — mirrors q141b's batch sketch.
_SCMS_D = 4
_SCMS_W = 64


@query(
    "q79_streaming_sketch",
    oracle=f"""
    SELECT r,
           ('0x' || substr(md5(CAST(r AS VARCHAR) || '#'
                                || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
             % {_SCMS_W} AS c,
           COUNT(*) AS v
    FROM events, UNNEST(generate_series(0, {_SCMS_D - 1})) AS s(r)
    GROUP BY 1, 2
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min sketch (Q79, round 12): q141b's CMS built as
    a LIVE streaming aggregation over the event stream — each event
    expands row-locally to d (row, counter) cells and the streaming
    state IS the sketch: d×w = 256 counters, bounded FOREVER regardless
    of stream length or key cardinality, which is the entire point of
    sketching a stream (an exact per-key count's state grows with
    distinct keys; the sketch's never does).  One-file-per-trigger
    micro-batches make the run genuinely incremental — each batch
    merges its partial cells by addition, CMS's defining property and
    exactly what Spark's streaming hash aggregate does.

    The oracle is the replayed batch sketch (the §2.3 streaming
    discipline): after availableNow drains the staged stream, the final
    sketch must equal the batch-built one cell for cell."""
    cell = (
        f"pmod(cast(conv(substring(md5(concat(cast(r as string), '#',"
        f" cast(user_id as string))), 1, 15), 16, 10) as bigint),"
        f" {_SCMS_W})"
    )
    cells = (
        events_stream(spark, sf_dir)
        .select(
            F.expr(
                f"explode(transform(sequence(0, {_SCMS_D - 1}),"
                f" r -> struct(r AS r, {cell} AS c)))"
            ).alias("rc")
        )
        .select(
            F.col("rc.r").cast("long").alias("r"), F.col("rc.c").alias("c")
        )
        .groupBy("r", "c")
        .agg(F.count("*").alias("v"))
    )
    return run_stream_to_table(cells, "complete")


def _streaming_dedup_oracle(n_slices: int = 4, thr_milli: int = 500) -> str:
    """Q115b oracle — the q156 union-corpus exactness machinery (same md5
    shingle hashes, same k universal permutations, same banding, exact
    integer milli-Jaccard) chained over the DETERMINISTIC slice batching
    (slice i = doc_id % n_slices, processed in order): a doc is accepted
    iff it matches no ACCEPTED doc of an earlier slice and no smaller-id
    sibling of its own slice.  The acceptance recursion unrolls into one
    CTE per slice — expressible because the batching is pinned; the
    oracle also asserts batch == doc_id % n_slices, so any change in the
    file stream's ordering fails the hash gate instead of silently
    changing semantics."""
    from palletjack_spark.functions.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        MINHASH_P,
        SHINGLE_LEN,
        _H30_MASK,
        minhash_coeffs,
    )

    n = SHINGLE_LEN
    sig_cols = ",\n         ".join(
        ["COUNT(*) AS n_sh"]
        + [
            f"MIN(({a} * (h & {_H30_MASK}) + {b}) % {MINHASH_P}) AS s{i}"
            for i, (a, b) in enumerate(minhash_coeffs(MINHASH_K))
        ]
    )
    band_selects = []
    for b in range(LSH_BANDS):
        cols = ", ".join(
            f"CAST(s{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols}))"
            " AS band_hash FROM sig"
        )
    bands_sql = "\n      UNION ALL\n      ".join(band_selects)
    acc_ctes = []
    for i in range(n_slices):
        if i == 0:
            earlier = ""
        else:
            union = " UNION ALL ".join(
                f"SELECT doc_id FROM acc{j}" for j in range(i)
            )
            earlier = f"m.oid IN ({union}) OR "
        acc_ctes.append(
            f"""acc{i} AS (
      SELECT d.doc_id FROM documents d
      WHERE d.doc_id % {n_slices} = {i} AND NOT EXISTS (
        SELECT 1 FROM matches m WHERE m.nid = d.doc_id AND ({earlier}
          (m.oid % {n_slices} = {i} AND m.oid < d.doc_id))))"""
        )
    acc_union = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {i} AS b FROM acc{i}" for i in range(n_slices)
    )
    hash60 = f"('0x' || substr(md5(substr(text, i, {n})), 1, 15))::BIGINT"
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, {hash60} AS h
      FROM documents,
           UNNEST(generate_series(1, greatest(length(text) - {n - 1}, 1))) AS s(i)
    ),
    sig AS (
      SELECT doc_id,
         {sig_cols}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {bands_sql}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS nid, b.doc_id AS oid
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id <> b.doc_id
    ),
    common AS (
      SELECT c.nid, c.oid, COUNT(*) AS common
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.nid
      JOIN sh sb ON sb.doc_id = c.oid AND sb.h = sa.h
      GROUP BY c.nid, c.oid
    ),
    matches AS (
      SELECT m.nid, m.oid,
             (1000 * m.common) // (za.n_sh + zb.n_sh - m.common) AS jm
      FROM common m
      JOIN sig za ON za.doc_id = m.nid
      JOIN sig zb ON zb.doc_id = m.oid
      WHERE (1000 * m.common) // (za.n_sh + zb.n_sh - m.common)
            >= {thr_milli}
    ),
    {",".join(acc_ctes)},
    acc AS (
      {acc_union}
    ),
    elig AS (
      SELECT m.nid, m.oid, m.jm FROM matches m
      WHERE EXISTS (SELECT 1 FROM acc a
                    WHERE a.doc_id = m.oid AND a.b < m.nid % {n_slices})
         OR (m.oid % {n_slices} = m.nid % {n_slices} AND m.oid < m.nid)
    ),
    best AS (
      SELECT nid, MIN(oid) AS dup_of, MAX(jm) AS jaccard_milli
      FROM elig GROUP BY nid
    )
    SELECT d.doc_id, CAST(d.doc_id % {n_slices} AS BIGINT) AS batch,
           b.nid IS NULL AS accepted,
           CAST(COALESCE(b.dup_of, -1) AS BIGINT) AS dup_of,
           CAST(COALESCE(b.jaccard_milli, -1) AS BIGINT) AS jaccard_milli
    FROM documents d LEFT JOIN best b ON b.nid = d.doc_id
    ORDER BY d.doc_id
    """


@query("q115b_streaming_incremental_dedup", oracle=_streaming_dedup_oracle())
def q115b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest composed with the persisted signature store
    (Q115b, round 13 — the loop the round-12 stores imply): documents
    arrive as a REAL file stream in deterministic slice batches; each
    micro-batch's foreachBatch dedups the batch against the persisted
    store (q156's incremental_dedup — the store side never exchanges)
    and appends the ACCEPTED signatures back under the store's
    crash-atomic manifest commit.  Curation state advances WITH ingest;
    no batch sweep ever rescans the corpus.

    Near-dup acceptance is order-dependent (a doc matching only a
    REJECTED doc is accepted), so the batching itself is part of the
    semantics: the staged slices pin batch = doc_id % 4 in mtime order,
    the output carries the processing epoch, and the oracle both
    replays the 4-slice chain exactly (one acceptance CTE per slice —
    the q78b replay discipline) and asserts the batch assignment.
    Cross-batch store-state ≡ one-shot equivalences are pinned in
    tests/test_streaming.py (streaming/ops.py:
    streaming_incremental_dedup)."""
    from palletjack_spark.streaming.ops import streaming_incremental_dedup

    return streaming_incremental_dedup(spark, sf_dir)


def _q115c_oracle() -> str:
    from palletjack_spark.queries.llm_ops import _Q92_ORACLE

    return _Q92_ORACLE


@query("q115c_streaming_vector_ingest", oracle=_q115c_oracle())
def q115c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest composed with the persisted VECTOR store
    (Q115c, round 15 — q115b's loop for embeddings): the store is
    bootstrapped on slice 0, then embedding slices arrive as a real
    file stream whose foreachBatch encodes against the PERSISTED
    codebooks (zero training jobs on the ingest path) and appends under
    the crash-atomic manifest commit with the shared epoch replay guard
    — a retried micro-batch can never publish its vectors twice (the
    no-op is pinned end-to-end under the stream in
    tests/test_streaming.py).  After the stream drains the store holds
    the whole corpus, so the exhaustive-settings query is exact brute
    force, hash-identical to the q92 oracle (streamed appends are
    order-insensitive: the store is a set of published batches)."""
    from palletjack_spark.streaming.ops import streaming_vector_ingest

    return streaming_vector_ingest(spark, sf_dir)


def _q115d_oracle() -> str:
    from palletjack_spark.queries.llm_ops import _bigram_lm_oracle

    return _bigram_lm_oracle(train_mod=4)


@query("q115d_streaming_lm_ingest", oracle=_q115d_oracle())
def q115d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest composed with the persisted LM count store
    (Q115d, round 15): document slices arrive as a real file stream
    whose foreachBatch counts ONLY the batch and appends the deltas
    under one manifest commit with the epoch replay guard (a replayed
    micro-batch never double-counts — pinned end-to-end in
    tests/test_streaming.py).  Counts are additive, so the streamed
    store is exactly a one-shot train over slices 1-3; the held-out
    slice 0 is scored against it and must match the q157-shape oracle
    with train = doc_id % 4 != 0 — integer bits throughout, one final
    division (the q157 determinism rule)."""
    from palletjack_spark.streaming.ops import streaming_lm_ingest

    return streaming_lm_ingest(spark, sf_dir)


@query("q115e_concurrent_lm_ingest", oracle=_q115d_oracle())
def q115e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO streams, ONE store, multi-writer CAS appends (Q115e, round
    15): q115d's loop run as two SIMULTANEOUS availableNow streams —
    slice 2 and slice 3 ingested by independent writers racing slot
    claims on one LM store (``append_lm_counts_concurrent``), each
    micro-batch carrying the epoch replay guard, which round 15
    extended to the CAS path (a replayed micro-batch of either stream
    no-ops; checked against the fresh manifest on every claim attempt,
    so even a same-epoch parallel race publishes exactly once).
    Counts are additive, so any slot interleaving ≡ one-shot train
    over slices 1-3 — the SAME oracle as q115d, now under real writer
    concurrency."""
    from palletjack_spark.streaming.ops import streaming_lm_ingest_concurrent

    return streaming_lm_ingest_concurrent(spark, sf_dir)


@query(
    "q76b_stream_reservoir",
    oracle=f"""
    WITH pri AS (
      SELECT event_type, event_id, md5(CAST(event_id AS VARCHAR)) AS p
      FROM {_E}),
    ranked AS (
      SELECT event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY p) AS rank
      FROM pri)
    SELECT event_type, event_id, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q76b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-key reservoir sample (round 15): a REAL stateful
    sampler over the event stream — per event_type, the k=5 events with
    the smallest md5 priority survive (bottom-k-by-hash ≡ uniform
    reservoir, but deterministic and mergeable across micro-batches, so
    the stream's final state is exactly the batch answer the oracle
    computes).  The last emission per key (highest n_seen) carries the
    final reservoir; rank = priority order within it."""
    from palletjack_spark.streaming.ops import (
        events_stream,
        run_stream_to_table,
        stream_reservoir_sample,
    )

    out = run_stream_to_table(
        stream_reservoir_sample(events_stream(spark, sf_dir)), "update"
    )
    final = out.groupBy("key").agg(F.max_by("ids", "n_seen").alias("ids"))
    return final.select(
        F.col("key").alias("event_type"),
        F.posexplode("ids").alias("rank0", "event_id"),
    ).select(
        "event_type",
        "event_id",
        (F.col("rank0") + 1).cast("long").alias("rank"),
    )


@query("q115g_concurrent_lm_ingest_objects", oracle=_q115d_oracle())
def q115g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q115e's two-stream multi-writer composition through the
    RENAME-FREE object store layout (Q115g, round 16): the store is
    saved with ``layout="objects"``, so every micro-batch append lands
    its count deltas ONCE at immutable object directories and the
    fenced generation commit is the only synchronization — no slot
    claims, no rename of data anywhere on the publish path, the shape
    an S3/GCS deployment runs (PUT new keys + conditional-PUT the
    generation).  Same two simultaneous availableNow streams, same
    epoch replay guard, same oracle: counts are additive, so any
    interleaving of fenced commits ≡ the one-shot train over slices
    1-3."""
    from palletjack_spark.streaming.ops import streaming_lm_ingest_concurrent

    return streaming_lm_ingest_concurrent(spark, sf_dir, layout="objects")


@query("q115f_concurrent_vector_ingest", oracle=_q115c_oracle())
def q115f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO streams, ONE vector store, multi-writer CAS appends (Q115f,
    round 15 — q115e's composition for embeddings): slice 1 and slices
    2-3 ingested by independent writers racing slot claims, each
    micro-batch encoding against the PERSISTED codebooks (zero training
    jobs) and carrying the CAS-path epoch replay guard.  The store is a
    set of published batches, so any slot interleaving holds the whole
    corpus — the exhaustive-settings query answers the SAME q92
    brute-force oracle as the single-stream q115c row, now under real
    writer concurrency."""
    from palletjack_spark.streaming.ops import (
        streaming_vector_ingest_concurrent,
    )

    return streaming_vector_ingest_concurrent(spark, sf_dir)
