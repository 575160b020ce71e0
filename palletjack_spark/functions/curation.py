"""Training-corpus curation operators beyond dedup (north-star mandate):
benchmark decontamination, sequence packing, PII redaction.

These are the remaining ops every large-scale pretraining pipeline runs
between raw text and the trainer (alongside dedup.py / text.py /
similarity.py):

- ``decontaminate`` — drop/flag training documents that share a long word
  n-gram with an evaluation benchmark, so the model is never trained on
  its own test set.  The eval side is tiny relative to a 100 TB corpus, so
  its distinct gram set is BROADCAST and the corpus is never shuffled —
  flagging is a broadcast semi/inner join over exploded corpus grams.
- ``pack_sequences`` — the concat-then-chunk packing step that turns
  variable-length documents into fixed-capacity training sequences.
  A global ordered cumsum would serialize at 100 TB, so packing is scoped
  per partition key (source/shard), exactly how production pipelines pack
  per input shard: one window shuffle on the shard key, and the chunk
  aggregation reuses that partitioning (no second exchange).
- ``redact_pii`` — regex scrubbing (emails, phone numbers) as pure
  JVM-side ``regexp_replace``/``regexp_extract_all`` expressions: zero
  shuffles, whole-stage codegen, linear scan.

All three keep the q91 oracle discipline: constants (gram length, bin
capacity, regexes) are module-level so the DuckDB differential embeds the
same values, and regex patterns stick to the syntax subset Java regex and
RE2 interpret identically.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: decontamination gram length (words).  13 is the classic published
#: choice for benchmark overlap; the testdata vocabulary is tiny, so the
#: driver query uses a shorter gram to exercise both hit and miss paths.
DECONTAM_NGRAM = 8

#: sequence-packing bin capacity (tokens)
PACK_CAPACITY = 512

#: PII regexes — the common subset of Java regex (Spark) and RE2 (DuckDB):
#: character classes, quantifiers, and word boundaries only (no lookaround,
#: no backreferences, both engines treat them identically).
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"


def _check_reserved(
    reserved: set[str],
    _identity: dict[str, str] | None = None,
    **caller_cols: str,
) -> None:
    """Fail fast when a caller column name collides with one of an
    operator's internal working columns (e.g. ``id_col='n_tok'``) —
    a collision would silently compute over the wrong column.

    ``_identity`` maps a parameter to the internal name that parameter is
    *aliased to*: there the collision is a no-op alias, not a clash —
    ``pack_sequences(part_col='part')`` is fine because the operator
    renames ``part_col`` to ``part`` anyway (round-3 ADVICE)."""
    ident = _identity or {}
    for param, name in caller_cols.items():
        if name in reserved and name != ident.get(param):
            raise ValueError(
                f"{param}={name!r} collides with an internal column of this "
                f"operator (reserved: {sorted(reserved)}); rename the input "
                "column first"
            )


def _word_grams(toks_col: str, n: int) -> str:
    """SQL expr: distinct word n-gram set over a tokens-array column —
    a pure projection (zero-shuffle, same idiom as dedup.ngram_jaccard).
    Docs with fewer than n tokens contribute no grams."""
    parts = ", ".join(f"element_at({toks_col}, i + {j})" for j in range(n))
    return (
        f"array_distinct(CASE WHEN size({toks_col}) < {n}"
        f" THEN array() ELSE transform("
        f"sequence(1, size({toks_col}) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})) END)"
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = DECONTAM_NGRAM,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the eval
    set: returns (id, n_shared_grams) for contaminated documents only.

    Scale shape: the eval benchmark's distinct grams (KBs–MBs even for
    large eval suites) are broadcast; corpus grams are a zero-shuffle
    array expression exploded into (id, gram) rows that meet the broadcast
    on the map side.  The only exchange is the final per-document count —
    over matched rows only, a vanishing fraction of the corpus."""
    _check_reserved({"toks", "gram"}, id_col=id_col)
    eval_grams = (
        eval_df.select(F.split(F.col(text_col), " ").alias("toks"))
        .select(F.explode(F.expr(_word_grams("toks", n))).alias("gram"))
        .distinct()
    )
    train_grams = train_df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    ).select(F.col(id_col), F.explode(F.expr(_word_grams("toks", n))).alias("gram"))
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    part_col: str,
    capacity: int = PACK_CAPACITY,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid end to end in
    ``id_col`` order within each ``part_col`` shard, and the token stream
    is cut into fixed ``capacity`` chunks; a document belongs to the chunk
    its first token lands in.  Returns per-chunk stats
    (part, chunk_id, n_docs, n_tokens).

    One shuffle total: the cumsum window partitions by the shard key, and
    the chunk aggregation groups by (shard, chunk) — a superset of that
    partitioning, so Catalyst plans it exchange-free on top of the window
    (asserted in tests/test_plans.py)."""
    _check_reserved(
        {"part", "n_tok", "start_offset", "chunk_id"},
        _identity={"part_col": "part"},
        id_col=id_col, part_col=part_col, text_col=text_col,
    )
    n_tokens: Column = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy("part")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_offset = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col),
        n_tokens.alias("n_tok"),
    ).select(
        "part",
        F.col(id_col),
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_offset"),
    )
    return (
        with_offset.select(
            "part",
            F.col(id_col),
            "n_tok",
            F.floor(F.col("start_offset") / capacity).alias("chunk_id"),
        )
        .groupBy("part", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def pack_boundaries(
    df: DataFrame,
    text_col: str,
    id_col: str,
    part_col: str,
    capacity: int = PACK_CAPACITY,
) -> DataFrame:
    """Per-chunk document BOUNDARIES for packed pretraining (Q103c): the
    local start offset of every document inside its chunk — exactly the
    metadata a block-diagonal attention mask (or position-id reset) needs
    so packed documents don't attend across their neighbours.  Same
    concat-then-chunk layout as :func:`pack_sequences` (a document
    belongs to the chunk its first token lands in).

    Returns (part, chunk_id, n_docs, n_tokens, boundaries_md5) where
    boundaries_md5 digests the doc_id-ordered comma-joined local offsets
    (the q131 array-shipping discipline — the driver row stays small and
    hashable while pinning every boundary and its order).

    Scale shape: identical to pack_sequences — ONE shuffle (the per-shard
    cumsum window), with the (part, chunk) aggregate reusing that
    partitioning exchange-free; the boundary digest is a row-local
    projection folded into the same HashAggregate."""
    _check_reserved(
        {"part", "n_tok", "start_offset", "chunk_id", "local_start"},
        _identity={"part_col": "part"},
        id_col=id_col, part_col=part_col, text_col=text_col,
    )
    n_tokens: Column = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy("part")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_offset = df.select(
        F.col(part_col).alias("part"),
        F.col(id_col),
        n_tokens.alias("n_tok"),
    ).select(
        "part",
        F.col(id_col),
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_offset"),
    )
    chunked = with_offset.select(
        "part",
        F.col(id_col),
        "n_tok",
        "start_offset",
        F.floor(F.col("start_offset") / capacity).alias("chunk_id"),
    ).withColumn(
        "local_start",
        F.col("start_offset") - F.col("chunk_id") * capacity,
    )
    return chunked.groupBy("part", "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(id_col, "local_start"))
                    ),
                    lambda st: st["local_start"].cast("string"),
                ),
                ",",
            )
        ).alias("boundaries_md5"),
    )


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Scrub emails and phone numbers: adds ``n_emails``, ``n_phones``, and
    ``clean_text`` (matches replaced by <EMAIL>/<PHONE> tokens).  Pure
    expression pipeline — no UDF, no shuffle, codegen'd linear scan."""
    _check_reserved({"n_emails", "n_phones", "clean_text"}, text_col=text_col)
    emails = F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), F.lit(0))
    phones = F.regexp_extract_all(F.col(text_col), F.lit(PHONE_RE), F.lit(0))
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.withColumns(
        {
            "n_emails": F.size(emails).cast("long"),
            "n_phones": F.size(phones).cast("long"),
            "clean_text": clean,
        }
    )


#: per-shard token budget for mixture sampling
MIXTURE_BUDGET = 2000


def token_budget_sample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    part_col: str,
    budget: int = MIXTURE_BUDGET,
) -> DataFrame:
    """Data-mixture sampling: keep a greedy prefix of documents per
    ``part_col`` domain, in deterministic md5-hash order, until the domain's
    token budget is exhausted (take-while on the running token cumsum).
    This is how mixture weights become concrete document selections in a
    pretraining pipeline — per-domain budgets, reproducible order, no
    global coordination.

    Returns kept rows (id, part, n_tok).  One shuffle (the per-domain
    cumsum window); the hash order is engine-portable (md5-derived, the
    functions/dedup.hash60 scheme) so a SQL oracle reproduces the exact
    selection."""
    from palletjack_spark.functions.dedup import hash60

    _check_reserved(
        {"part", "n_tok", "pri", "cum"},
        _identity={"part_col": "part"},
        id_col=id_col, part_col=part_col, text_col=text_col,
    )
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    pri = hash60(F.concat(F.col(id_col).cast("string"), F.lit("#mix")))
    w = (
        Window.partitionBy("part")
        .orderBy("pri", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(part_col).alias("part"),
            n_tokens.alias("n_tok"),
            pri.alias("pri"),
        )
        .withColumn("cum", F.sum("n_tok").over(w))
        .where(F.col("cum") <= budget)
        .select(id_col, "part", "n_tok")
    )


#: per-domain document cap for crawl curation (kept small so the sf0.01
#: fixture genuinely drops rows; production values are e.g. 1e5 pages/host)
DOMAIN_CAP = 15

#: blocked domains (stand-in for a host blocklist; real deployments load
#: one — the operator takes any iterable)
DOMAIN_BLOCKLIST = ("src13", "src17")


def cap_domains(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    cap: int = DOMAIN_CAP,
    blocklist: tuple[str, ...] = DOMAIN_BLOCKLIST,
) -> DataFrame:
    """Domain-level crawl curation (the C4/RefinedWeb/Dolma host step):
    drop blocklisted domains outright, then keep at most ``cap`` documents
    per domain, chosen in deterministic md5-hash order so the retained
    sample is an unbiased, reproducible draw (not "first N by crawl
    order", which over-represents whatever the crawler saw first).

    Returns kept rows (id, domain, rn) with ``rn`` the 1-based pick order.

    Scale shape: the blocklist filter is a codegen'd ``NOT IN`` (zero
    shuffle; a large real blocklist would broadcast-anti-join instead).
    The cap is a rank-limit window — one shuffle on the domain key, and
    Spark's WindowGroupLimit pushdown keeps only ``cap`` rows per domain
    *before* the exchange, so a hot domain (the very thing caps exist
    for) never concentrates its full row set on one task (same plan shape
    as Q43 top-k per group; asserted in tests/test_plans.py)."""
    from palletjack_spark.functions.dedup import hash60

    _check_reserved({"pri", "rn"}, id_col=id_col, domain_col=domain_col)
    pri = hash60(F.concat(F.col(id_col).cast("string"), F.lit("#dom")))
    w = Window.partitionBy(domain_col).orderBy("pri", id_col)
    return (
        df.where(~F.col(domain_col).isin(*blocklist))
        .select(F.col(id_col), F.col(domain_col), pri.alias("pri"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .select(id_col, domain_col, F.col("rn").cast("long").alias("rn"))
    )


#: paragraph separator for paragraph-level dedup (a literal, not a regex —
#: both engines must split identically)
PARA_SEP = ". "


def dedup_paragraphs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Paragraph-level dedup (the C4/RefinedWeb-style curation step):
    boilerplate paragraphs repeated across a crawl (cookie banners, nav
    text, license blurbs) are kept only at their FIRST corpus occurrence
    (lowest (id, position)); every later repeat is dropped and the
    documents are reassembled from their surviving paragraphs, preserving
    order.  Returns (id, n_paras, clean_text) for documents with at least
    one surviving paragraph.

    Scale shape — paragraph TEXT crosses the wire exactly once:

    1. winners: paragraphs project to (hash, id, pos) — ~24 B/row — and a
       row_number window over the hash picks each paragraph's first
       occurrence.  The only corpus-wide exchange is this id-sized
       projection, never the text.
    2. the winning positions aggregate per document (second id-sized
       shuffle) into one array row per doc.
    3. the corpus joins that per-doc array on ``id`` alone — the single
       text exchange — and the final reassembly groupBy(id) reuses the
       join's hash partitioning, so no further exchange follows the text
       (asserted in tests/test_plans.py).

    Empty split parts (consecutive separators) are discarded in both
    engines — deduping empty strings would weld unrelated documents'
    structure together.
    """
    from palletjack_spark.functions.dedup import hash60

    _check_reserved(
        {"pos", "para", "ph", "rn", "keep_pos", "n_paras", "clean_text"},
        id_col=id_col, text_col=text_col,
    )
    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.col(text_col), re.escape(PARA_SEP))
            ).alias("pos", "para"),
        )
        .where(F.length("para") > 0)
    )
    w = Window.partitionBy("ph").orderBy(id_col, "pos")
    winners = (
        paras.select(F.col(id_col), "pos", hash60(F.col("para")).alias("ph"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("keep_pos"))
    )
    return (
        paras.join(winners, id_col)
        .where(F.array_contains("keep_pos", F.col("pos")))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_paras"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                PARA_SEP,
            ).alias("clean_text"),
        )
    )


#: DSIR hashed-feature bucket count.  64 keeps the count tables trivially
#: broadcastable while leaving bucket-collision noise small at fixture
#: vocabulary sizes; production uses 10k-1M buckets.
DSIR_BUCKETS = 64


def importance_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much its hashed-unigram feature mass looks like the
    TARGET distribution versus the RAW distribution, then resample with a
    deterministic hash draw proportional to the score.

    Words hash into ``n_buckets`` feature buckets; per document,
    ``t_mass``/``r_mass`` are the summed (smoothed) target/raw bucket
    counts over its token positions, and ``score = t_mass / r_mass`` — a
    single BIGINT/BIGINT double division, so the ratio is exact-integer
    arithmetic until the last operation (no log-likelihoods: libm ``log``
    is not bit-portable across engines, integer masses are).  ``keep`` is
    a reproducible importance draw: an md5-derived uniform in [0,1)
    compared against the score.

    Returns (id, n_toks, t_mass, r_mass, score, keep).

    Scale shape: the raw corpus is tokenized (md5 per token) exactly
    ONCE — tokens collapse map-side to per-(doc, bucket) counts, and
    both the raw distribution and the per-doc scoring re-aggregate that
    one counted table (the same physical exchange, reused), weighting by
    the count instead of re-walking token positions.  Both distribution
    tables are ``n_buckets`` rows — broadcast; the token stream itself
    never crosses the wire.  The target corpus is tokenized once for its
    distribution — at 100 TB the target is the tiny curated side."""
    from palletjack_spark.functions.dedup import hash60

    _check_reserved(
        {"tok", "b", "cnt", "raw_w", "tgt_w", "raw_cnt", "tgt_cnt",
         "n_toks", "t_mass", "r_mass"},
        id_col=id_col, text_col=text_col,
    )

    def toks(df: DataFrame, *cols):
        return df.select(
            *cols, F.explode(F.split(F.col(text_col), " ")).alias("tok")
        ).select(*cols, F.pmod(hash60(F.col("tok")), F.lit(n_buckets)).alias("b"))

    # tokenize raw ONCE: per-(doc, bucket) counts are <= n_buckets rows
    # per document, and every downstream consumer (raw distribution,
    # per-doc masses) is an exact re-aggregation of this table weighted
    # by cnt — the md5 token hash never runs twice over the raw corpus
    raw_counts = (
        toks(raw_df, F.col(id_col))
        .groupBy(id_col, "b")
        .agg(F.count("*").alias("cnt"))
    )
    # both distributions from ONE tagged union + aggregate — a join here
    # (full outer on bucket) would plan a sort-merge join just to build a
    # 64-row table; the union aggregates map-side to n_buckets rows total
    dists = (
        raw_counts.select(
            "b", F.col("cnt").alias("raw_w"), F.lit(0).cast("long").alias("tgt_w")
        )
        .unionByName(
            toks(target_df).select(
                "b", F.lit(0).cast("long").alias("raw_w"),
                F.lit(1).cast("long").alias("tgt_w"),
            )
        )
        .groupBy("b")
        .agg(
            F.sum("raw_w").alias("raw_cnt"),
            F.sum("tgt_w").alias("tgt_cnt"),
        )
    )
    score = F.col("t_mass").cast("double") / F.col("r_mass")
    draw = (
        F.pmod(
            hash60(F.concat(F.col(id_col).cast("string"), F.lit("#dsir"))),
            F.lit(1000000),
        ).cast("double")
        / F.lit(1000000.0)
    )
    return (
        raw_counts.join(F.broadcast(dists), "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_toks"),
            F.sum((F.col("tgt_cnt") + 1) * F.col("cnt")).alias("t_mass"),
            F.sum((F.col("raw_cnt") + 1) * F.col("cnt")).alias("r_mass"),
        )
        .select(
            F.col(id_col),
            "n_toks",
            "t_mass",
            "r_mass",
            score.alias("score"),
            (draw < score).alias("keep"),
        )
    )


def snapshot_diff(
    v1: DataFrame,
    v2: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table (Q126e):
    (key, change ∈ added|removed|modified, old_fp, new_fp), unchanged
    rows excluded.

    Scale shape: each side collapses ROW-LOCALLY to (key, md5
    fingerprint over ``compare_cols`` joined with the ASCII-31 unit
    separator — unambiguous for text payloads) before the join, so the
    full-outer join exchanges only (key, 32-byte fp) pairs hashed on
    the key — the wide rows never shuffle, and at 100 TB the diff costs
    two fingerprint scans plus a narrow co-partitioned join.  Unchanged
    rows (the overwhelming majority between real snapshots) are
    filtered before anything returns.

    NULL discipline (round-14 sweep): each column encodes as ``'1'||v``
    / NULL → ``'0'`` BEFORE the separator join — plain ``concat_ws``
    SKIPS NULLs, so ``(x, NULL)`` and ``(NULL, x)`` fingerprinted
    identically and a modification that moved a value across columns
    (or swapped NULL for the neighbour's value) silently read as
    'unchanged'."""

    def fp(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(
                F.concat(F.lit("1"), F.col(c).cast("string")), F.lit("0")
            )
            for c in compare_cols
        ]
        return df.select(
            F.col(key_col),
            F.md5(F.concat_ws("\x1f", *parts)).alias(alias),
        )
    h1 = fp(v1, "old_fp")
    h2 = fp(v2, "new_fp")
    d = h1.join(h2, key_col, "full_outer")
    return (
        d.where(
            F.col("old_fp").isNull()
            | F.col("new_fp").isNull()
            | (F.col("old_fp") != F.col("new_fp"))
        )
        .select(
            key_col,
            F.when(F.col("old_fp").isNull(), "added")
            .when(F.col("new_fp").isNull(), "removed")
            .otherwise("modified")
            .alias("change"),
            F.coalesce("old_fp", F.lit("")).alias("old_fp"),
            F.coalesce("new_fp", F.lit("")).alias("new_fp"),
        )
    )
