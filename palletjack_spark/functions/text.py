"""Text analysis operators (Q93, Q95-Q98): token/char statistics,
language-ID heuristic, quality scoring, regex token counting, content
fingerprinting.  All built-in-function compositions (JVM-side, whole-stage
codegen) — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and fixed so the DuckDB oracle can embed
#: the same table as VALUES.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "de", "y", "una"),
}


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document token/char statistics (Q93).  Exact arithmetic: counts
    are ints; ratios are single int/int double divisions."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    n_spaces = (
        n_chars - F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    ).cast("long")
    distinct_tokens = F.size(F.array_distinct(toks)).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_computed"),
        distinct_tokens.alias("n_distinct_tokens"),
        ((n_chars - n_spaces) / n_tokens).alias("avg_token_len"),
        (distinct_tokens / n_tokens).alias("ttr"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-overlap language ID (Q95): argmax over languages of
    stopword hits; ties broken lexicographically; zero hits → 'und'."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    hit_cols = []
    for lang, words in sorted(STOPWORDS.items()):
        hit_cols.append(
            F.sum(
                F.when(F.col("tok").isin(*words), 1).otherwise(0)
            ).alias(f"hits_{lang}")
        )
    hits = toks.groupBy(id_col).agg(*hit_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later overwrite
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return hits.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best.cast("long").alias("stopword_hits"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite document quality score (Q98): length band + type-token
    ratio + mean token length, each an exact int-derived double."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    ttr = F.size(F.array_distinct(toks)).cast("long") / n_tokens
    len_ok = F.when((n_chars >= 100) & (n_chars <= 2000), 1.0).otherwise(0.0)
    tok_ok = F.when((n_tokens >= 20) & (n_tokens <= 500), 1.0).otherwise(0.0)
    score = (len_ok + tok_ok + ttr) / 3.0
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens_q"),
        score.alias("quality"),
        F.when(score >= 0.5, "keep").otherwise("drop").alias("verdict"),
    )


#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
#: symbols — RE2/Java-regex portable.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_regex(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Regex token counting (Q97) — whitespace count vs BPE-ish regex count."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .cast("long")
        .alias("re_tokens"),
    )


def fingerprint_md5(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Content fingerprint (Q96): md5 of the token-normalized text (lower,
    collapse whitespace) — the exact-dup key used by dedup pipelines."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
        F.substring(F.md5(normalized), 1, 8).alias("fp_prefix"),
    )


def winnowing_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Q96b): rolling k-gram hashes, keep
    the minimum of every w-hash window, distinct — the classic local
    fingerprinting scheme (robust to insertions: two documents sharing a
    long-enough substring share fingerprints).

    Fully JVM-side and ZERO-shuffle: the k-gram hash array, every trailing
    w-window minimum (``array_min(slice(...))`` ≡ the running window min),
    and the per-doc dedup (``array_distinct``) are all array expressions
    over the document row — output rows are (id, fp) distinct already,
    since fingerprints are deduped within each document and rows from
    different documents differ by id.  Embarrassingly parallel at 100 TB.
    """
    from palletjack_spark.functions.dedup import _spread

    df = _spread(df)
    harr = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> cast(conv(substring(md5(substring({text_col}, i, {k})), 1, 15),"
        f" 16, 10) as long))"
    )
    fps = (
        f"array_distinct(transform(sequence(1, size(h)),"
        f" j -> array_min(slice(h, j, {w}))))"
    )
    return (
        df.select(F.col(id_col), F.expr(harr).alias("h"))
        .select(F.col(id_col), F.explode(F.expr(fps)).alias("fp"))
    )


#: Gopher-rule thresholds for repetition filtering (Rae et al. 2021,
#: "Scaling Language Models" §A1.1: drop documents whose duplicate
#: 2-gram fraction or top-word concentration indicates boilerplate/spam)
REPETITION_MAX_DUP_2GRAM_FRAC = 0.20
REPETITION_MAX_TOP_WORD_FRAC = 0.30


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition quality signals (the published pretraining
    filter family): per document, the duplicate word fraction, duplicate
    word-2-gram fraction, and top-word concentration, plus the keep/drop
    decision at the published-style thresholds.

    ZERO-shuffle: every signal is an array expression over the document
    row (split → distinct/size ratios; 2-grams via transform(sequence);
    top-word count as the longest run of a SORTED token array — one
    O(n log n) fold, not an O(n²) per-distinct-token rescan) —
    embarrassingly parallel, no aggregation, no explode.  Fractions round
    to 6 places so the DuckDB oracle hash-matches bit-for-bit.
    """
    from palletjack_spark.functions.curation import _check_reserved
    from palletjack_spark.functions.dedup import _spread

    _check_reserved(
        {"n_words", "dup_word_frac", "dup_2gram_frac", "top_word_frac",
         "keep"},
        id_col=id_col, text_col=text_col,
    )
    df = _spread(df)
    toks = f"split({text_col}, ' ')"
    grams2 = (
        f"CASE WHEN size({toks}) < 2 THEN array() ELSE "
        f"transform(sequence(1, size({toks}) - 1),"
        f" i -> concat_ws(' ', element_at({toks}, i),"
        f" element_at({toks}, i + 1))) END"
    )
    n_words = F.expr(f"size({toks})").cast("long")
    dup_word = F.expr(
        f"round(1.0 - size(array_distinct({toks})) / size({toks}), 6)"
    )
    dup_2gram = F.expr(
        f"CASE WHEN size({toks}) < 2 THEN 0.0 ELSE "
        f"round(1.0 - size(array_distinct({grams2})) / size({grams2}), 6) END"
    )
    # max token frequency == longest equal-run of the sorted token array
    top_word = F.expr(
        f"round(aggregate(array_sort({toks}),"
        f" named_struct('best', 0, 'run', 0,"
        f" 'prev', CAST(NULL AS STRING)),"
        f" (acc, x) -> named_struct("
        f"   'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1)),"
        f"   'run', IF(x <=> acc.prev, acc.run + 1, 1),"
        f"   'prev', x),"
        f" acc -> acc.best) / size({toks}), 6)"
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        dup_word.alias("dup_word_frac"),
        dup_2gram.alias("dup_2gram_frac"),
        top_word.alias("top_word_frac"),
    )
    return out.withColumn(
        "keep",
        (F.col("dup_2gram_frac") <= REPETITION_MAX_DUP_2GRAM_FRAC)
        & (F.col("top_word_frac") <= REPETITION_MAX_TOP_WORD_FRAC),
    )


#: stand-in profanity/NSFW blocklist (the C4 "bad words" filter shape —
#: real deployments load the published LDNOOBW lists); module-level so the
#: DuckDB oracle embeds the same words and threshold
BADWORDS = ("slow", "big", "dup")
BADWORD_MAX_FRAC = 0.08


def badword_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    words: tuple[str, ...] = BADWORDS,
    max_frac: float = BADWORD_MAX_FRAC,
) -> DataFrame:
    """Blocklist-word filtering (the C4-style bad-word gate): per document,
    the fraction of tokens on a blocklist; documents past ``max_frac`` are
    marked drop.  Pure zero-shuffle array expressions (codegen'd linear
    scan, same shape as ``repetition_stats``); the fraction is one
    int/int double division so the SQL differential is bit-exact.

    Returns (id, n_tokens, n_bad, bad_frac, keep)."""
    n_tokens, n_bad, bad_frac = _badword_cols(text_col, words)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_bad.alias("n_bad"),
        bad_frac.alias("bad_frac"),
        (bad_frac <= F.lit(max_frac)).alias("keep"),
    )


def _badword_cols(text_col: str, words: tuple[str, ...]):
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    if not words:
        # empty blocklist: nothing is bad (the old f-string built an
        # invalid `t IN ()`)
        n_bad = F.lit(0).cast("long")
        return n_tokens, n_bad, n_bad.cast("double") / n_tokens
    # build the member list as Column literals, not interpolated SQL
    # text (round-13 review: the published LDNOOBW lists this gate is
    # documented to load contain apostrophe entries — naive
    # single-quoting broke the parse, and a crafted word could inject
    # arbitrary SQL into the expression)
    members = F.array(*[F.lit(w) for w in words])
    n_bad = F.size(
        F.filter(toks, lambda t: F.array_contains(members, t))
    ).cast("long")
    return n_tokens, n_bad, n_bad.cast("double") / n_tokens


def badword_keep(
    text_col: str,
    words: tuple[str, ...] = BADWORDS,
    max_frac: float = BADWORD_MAX_FRAC,
):
    """The bad-word gate as a row-local boolean Column — lets pipelines
    ``where`` the corpus in place (zero shuffle, no id join-back) while
    ``badword_stats`` stays the reporting surface."""
    _, _, bad_frac = _badword_cols(text_col, words)
    return bad_frac <= F.lit(max_frac)


#: hashed-feature linear classifier: feature-space dimension and the seed
#: tag baked into the per-bucket weight hash.  Module-level so the DuckDB
#: oracle can restate the identical weight function.
CLASSIFIER_DIM = 4096
CLASSIFIER_SEED = "qw1"


def hashed_linear_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model-based quality classification (Q118): a fastText-style linear
    classifier over hashed unigram features — the architecture used for
    corpus quality gates (e.g. CCNet/GPT-3-style "looks like reference
    text" filters), with deterministic pseudo-trained weights so two
    engines can verify bit-exactly.

    Pipeline per row (zero shuffle, all codegen'd array exprs):
    token → feature bucket ``hash60(tok) % DIM`` → integer weight
    ``hash60(seed || bucket) % 2001 - 1000`` (∈ [-1000, 1000], a stand-in
    for trained int8-quantized weights) → integer sum over tokens →
    ``score = Σw / (1000 · n_tok)``.  Integer accumulation keeps the sum
    exact under any fold order; the single final double division is
    IEEE-deterministic.  Swapping real trained weights in means replacing
    the weight expression with a broadcast ``DIM``-row map — same plan
    shape, still zero shuffle on the corpus."""
    toks = f"split({text_col}, ' ')"
    bucket = (
        f"t -> pmod(cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint),"
        f" {CLASSIFIER_DIM})"
    )
    weight = (
        f"b -> cast(conv(substring(md5(concat('{CLASSIFIER_SEED}#',"
        f" cast(b as string))), 1, 15), 16, 10) as bigint) % 2001 - 1000"
    )
    wsum = F.expr(
        f"aggregate(transform(transform({toks}, {bucket}), {weight}),"
        f" 0L, (acc, x) -> acc + x)"
    )
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    score = F.when(
        n_tok > 0, wsum.cast("double") / (n_tok.cast("double") * 1000.0)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        wsum.alias("weight_sum"),
        score.alias("score"),
        (score > 0.0).alias("keep"),
    )


def bigram_lm_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str,
    id_col: str,
    backoff_bits: int = 2,
) -> DataFrame:
    """Stupid-backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the smoothing designed FOR
    distributed count-based training): train bigram/unigram counts on
    ``train``, score every adjacent token pair in ``score`` by integer
    surprisal bits, and return per-document totals.

    Per bigram (w1, w2):

    * seen in training:  ``bits = floor(log2(h1 / c12))`` where ``h1`` is
      w1's history mass (Σ bigram counts starting at w1), so the ratio is
      ≥ 1 and the bits are ≥ 0;
    * unseen: back off to the unigram model with an ``α = 2^-backoff_bits``
      penalty: ``bits = backoff_bits + floor(log2(total / c2))`` (OOV w2
      scores as ``c2 = 1``, the integer Laplace floor).

    Integer bits (``length(bin(a div b)) - 1``) rather than float ``-ln p``
    for the q128 reason: float sums over a document are addition-order
    dependent and can never hash-match across engines or 1000 executors;
    integer bits sum exactly in any order, and the single final division
    is IEEE-deterministic.

    Scale shape: pairing is row-local (``zip_with`` over two slices — no
    window, no shuffle); the train corpus exchanges ONCE hashed on
    (w1, w2) for the bigram table, whose re-aggregation by w1 yields the
    history masses without a second corpus pass; the unigram table is a
    second, Zipf-sublinear exchange; scoring joins the score-side pairs
    against the count tables on their own hash keys and the total mass is
    a one-row broadcast scalar.  No LM table is ever collected to the
    driver — at 100 TB the bigram table is itself a big (but sublinear)
    distributed table and the joins shuffle-partition on it.
    """
    big, uni = _lm_counts(train, text_col, id_col)
    # the LM tables are cached for the q128 reason: big feeds both the
    # score-back join and the history re-aggregation, uni feeds both its
    # join and the total-mass scalar — uncached, Spark re-executes each
    # subtree, i.e. two extra full-corpus token explosions for one number
    return _lm_score(
        score, text_col, id_col, *_cache_lm_tables(big, uni), backoff_bits
    )


#: the LAST invocation's cached LM count tables — a returned scoring
#: DataFrame is lazy, so there is no in-band point to unpersist; instead
#: the NEXT invocation evicts the previous pair (round-12 ADVICE: the
#: old bare .cache() leaked two tables into executor storage per
#: q157/q157b/q160 invocation for the life of the session — now the
#: leak is bounded at one pair).  Unpersist is a pure storage hint:
#: a still-held old DataFrame just recomputes, results unchanged.
_LM_CACHES: list[DataFrame] = []


def _cache_lm_tables(big: DataFrame, uni: DataFrame) -> tuple[DataFrame, DataFrame]:
    for old in _LM_CACHES:
        try:
            old.unpersist()
        except Exception:
            pass
    _LM_CACHES.clear()
    _LM_CACHES.extend([big.cache(), uni.cache()])
    return big, uni


def _lm_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent token pairs — row-local ``zip_with`` over two
    slices: no window, no shuffle."""
    pairs_expr = (
        "explode(zip_with("
        " slice(ts, 1, greatest(size(ts) - 1, 0)),"
        " slice(ts, 2, greatest(size(ts) - 1, 0)),"
        " (a, b) -> struct(a AS w1, b AS w2)))"
    )
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias(
            "ts"
        ),
    )
    return toks.select(id_col, F.expr(pairs_expr).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def _lm_counts(
    train: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """The stupid-backoff count tables of ONE corpus/batch:
    ``(big (w1, w2, c12), uni (tok, c2))`` — both Zipf-sublinear, both
    purely ADDITIVE, which is why the persisted LM store can absorb new
    batches as count deltas (:func:`append_lm_counts`)."""
    big = (
        _lm_pairs(train, text_col, id_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    uni = (
        train.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("c2"))
    )
    return big, uni


def _lm_score(
    score: DataFrame,
    text_col: str,
    id_col: str,
    big: DataFrame,
    uni: DataFrame,
    backoff_bits: int = 2,
) -> DataFrame:
    """Score ``score``'s documents against given LM count tables — the
    shared core of :func:`bigram_lm_score` and
    :func:`bigram_lm_score_store`."""
    # history mass per w1: re-aggregate the bigram table (sublinear), not
    # the corpus — h1 = Σ_w2 c12 ≥ any c12, so seen-bits are ≥ 0
    hist = big.groupBy("w1").agg(F.sum("c12").alias("h1"))
    total = uni.agg(F.sum("c2").alias("total"))

    scored = (
        _lm_pairs(score, text_col, id_col)
        .join(big, ["w1", "w2"], "left")
        .join(hist, ["w1"], "left")
        .join(uni.withColumnRenamed("tok", "w2"), ["w2"], "left")
        .join(F.broadcast(total))
        .select(
            id_col,
            F.col("c12").isNull().alias("backoff"),
            F.when(
                F.col("c12").isNotNull(),
                (F.length(F.expr("bin(h1 div c12)")) - 1).cast("long"),
            )
            .otherwise(
                F.lit(backoff_bits)
                + (
                    F.length(F.expr("bin(total div coalesce(c2, 1))")) - 1
                ).cast("long")
            )
            .alias("bits"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("bits").alias("total_bits"),
        F.sum(F.col("backoff").cast("long")).alias("n_backoff"),
        (F.sum("bits").cast("double") / F.count("*")).alias("avg_bits"),
    )


# ---------------------------------------------------------------------------
# Persisted LM count store (Q157b)

_LM_META_NAME = "_lm_meta.json"
_LM_STORE_VERSION = 1


def _lm_meta(store_dir: str) -> dict:
    import json
    import os

    p = os.path.join(store_dir, _LM_META_NAME)
    if not os.path.exists(p):
        raise ValueError(f"no LM store manifest at {p}")
    with open(p) as f:
        meta = json.load(f)
    if meta.get("store_version") != _LM_STORE_VERSION:
        raise ValueError(
            f"LM store at {store_dir} has version "
            f"{meta.get('store_version')}; this code reads "
            f"{_LM_STORE_VERSION}"
        )
    return meta


def _lm_commit(store_dir: str, meta: dict) -> None:
    """Atomic manifest publication — the q92k contract: a crash after a
    batch write but before this rename leaves an orphan directory every
    reader ignores, and the next append overwrites it."""
    from palletjack_spark.functions import store as S

    S.commit_manifest(store_dir, _LM_META_NAME, meta)


def save_lm_store(
    train: DataFrame,
    text_col: str,
    id_col: str,
    store_dir: str,
    layout: str = "objects",
) -> None:
    """Persist the stupid-backoff count tables of an ingested corpus as
    a versioned store (``bigrams/batch=0``, ``unigrams/batch=0`` + a
    manifest): later crawl batches merge in as COUNT DELTAS with no
    rescan of this corpus (:func:`append_lm_counts`) — the exact reason
    Brants et al. chose count-based smoothing for distributed training:
    counts are additive; normalized probabilities are not.

    ``layout``: ``"objects"`` (the default since round 17 — rename-free
    immutable object dirs listed by the manifest,
    :func:`palletjack_spark.functions.store.cas_append_objects`, the
    shape an object-store deployment wants) or ``"slots"``
    (rename-based ``batch=N`` dirs, still fully supported for existing
    manifests; appends, loads, and compaction all follow the
    manifest's layout automatically)."""
    import os
    import uuid

    from palletjack_spark.functions import store as S

    if layout not in ("slots", "objects"):
        raise ValueError(f"unknown LM store layout {layout!r}")
    big, uni = _lm_counts(train, text_col, id_col)
    meta = {
        "store_version": _LM_STORE_VERSION,
        "n_batches": 1,
        "text_col": text_col,
        "layout": layout,
    }
    if layout == "objects":
        rel = f"obj-{uuid.uuid4().hex}"
        big.write.mode("overwrite").parquet(
            os.path.join(store_dir, "bigrams", rel)
        )
        uni.write.mode("overwrite").parquet(
            os.path.join(store_dir, "unigrams", rel)
        )
        meta["objects"] = {"bigrams": [rel], "unigrams": [rel]}
    else:
        S.write_batch(big, store_dir, "bigrams", 0)
        S.write_batch(uni, store_dir, "unigrams", 0)
    _lm_commit(store_dir, meta)


def append_lm_counts(
    new_train: DataFrame,
    text_col: str,
    id_col: str,
    store_dir: str,
    epoch: str | None = None,
) -> None:
    """Merge a NEW batch into the LM store: count ONLY the batch (the
    store is never rescanned — the q156/q92k incremental discipline),
    land the deltas under ``batch=N``, commit the manifest atomically.
    A store built over a different text column hard-errors (the q92g
    param-mismatch discipline).  ``epoch``: the shared
    at-least-once-replay guard
    (:func:`palletjack_spark.functions.store.epoch_seen`, round 14) —
    a replayed epoch is a no-op, so a retried streaming micro-batch
    can't double-count its deltas.  Full store invariants: STORES.md."""
    from palletjack_spark.functions import store as S

    meta = _lm_meta(store_dir)
    if meta["text_col"] != text_col:
        raise ValueError(
            f"LM store at {store_dir} was built over "
            f"{meta['text_col']!r}; append asked for {text_col!r}"
        )
    if S.epoch_seen(meta, epoch):
        return  # replayed epoch: the deltas are already published
    big, uni = _lm_counts(new_train, text_col, id_col)
    if meta.get("layout") == "objects":
        # the rename-free path is also the single-writer path: an
        # uncontended fenced commit is one attempt
        S.cas_append_objects(
            {"bigrams": big, "unigrams": uni},
            store_dir,
            _LM_META_NAME,
            lambda _m, _slot: None,
            epoch=epoch,
        )
        return
    batch = int(meta["n_batches"])
    S.write_batch(big, store_dir, "bigrams", batch)
    S.write_batch(uni, store_dir, "unigrams", batch)
    meta["n_batches"] = batch + 1
    S.record_epoch(meta, epoch)
    _lm_commit(store_dir, meta)


def append_lm_counts_concurrent(
    new_train: DataFrame,
    text_col: str,
    id_col: str,
    store_dir: str,
    claims=None,
    epoch: str | None = None,
) -> int:
    """Multi-writer :func:`append_lm_counts` (round-14, closing the r13
    gap: CAS appends were wired to the signature store only — parallel
    crawl shards merging count deltas into ONE LM store raced the
    single-writer manifest and could silently lose a batch).  Both
    count tables land as ``batch=N`` and publish in ONE manifest commit
    under the slot-claim / nonce-ownership protocol
    (:func:`palletjack_spark.functions.store.cas_append_multi`) —
    counts are additive, so any interleaving of winners is equivalent
    to some sequential append order.  Returns the published slot, or
    ``-1`` when ``epoch`` was already recorded (a replayed
    micro-batch — nothing published)."""
    from palletjack_spark.functions import store as S

    meta = _lm_meta(store_dir)
    if meta["text_col"] != text_col:
        raise ValueError(
            f"LM store at {store_dir} was built over "
            f"{meta['text_col']!r}; append asked for {text_col!r}"
        )
    big, uni = _lm_counts(new_train, text_col, id_col)
    dfs = {"bigrams": big, "unigrams": uni}
    if meta.get("layout") == "objects":
        return S.cas_append_objects(
            dfs,
            store_dir,
            _LM_META_NAME,
            lambda _m, _slot: None,
            claims=claims,
            epoch=epoch,
        )
    return S.cas_append_multi(
        dfs,
        store_dir,
        _LM_META_NAME,
        lambda _m, _slot: None,
        claims=claims,
        epoch=epoch,
    )


def load_lm_tables(
    spark, store_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The store's LIVE count tables: published batches summed per key.
    Orphan batches (crashed appends past the manifest) are
    partition-pruned out; the per-key SUM is one map-side-combined
    exchange over tables that are Zipf-sublinear in the corpus."""
    from palletjack_spark.functions import store as S

    meta = _lm_meta(store_dir)
    if meta.get("layout") == "objects":
        big_raw = S.live_object_batches(spark, store_dir, "bigrams", meta)
        uni_raw = S.live_object_batches(spark, store_dir, "unigrams", meta)
    else:
        n = int(meta["n_batches"])
        big_raw = S.live_batches(spark, store_dir, "bigrams", n)
        uni_raw = S.live_batches(spark, store_dir, "unigrams", n)
    big = big_raw.groupBy("w1", "w2").agg(F.sum("c12").alias("c12"))
    uni = uni_raw.groupBy("tok").agg(F.sum("c2").alias("c2"))
    return big, uni


def bigram_lm_score_store(
    spark,
    score: DataFrame,
    text_col: str,
    id_col: str,
    store_dir: str,
    backoff_bits: int = 2,
) -> DataFrame:
    """Score documents against a PERSISTED LM store (base ∪ appends) —
    :func:`bigram_lm_score`'s semantics with zero training-corpus
    scans at query time: the counts are the at-rest form."""
    big, uni = load_lm_tables(spark, store_dir)
    return _lm_score(
        score, text_col, id_col, *_cache_lm_tables(big, uni), backoff_bits
    )


def compact_lm_store(spark, store_dir: str) -> dict:
    """Collapse all published batches into one: re-aggregate the live
    tables, write fresh ``batch=0`` dirs under a temp root, and swap
    them in CRASH-ATOMICALLY via the shared aside-then-promote sequence
    (:func:`palletjack_spark.functions.store.compact_swap` — round-12
    ADVICE: the old rmtree-then-replace left a crash window with no
    count tables at all and the only copy in a temp dir).  Run it when
    the batch list has grown past read comfort; scoring results are
    pinned unchanged across compaction in tests."""
    from palletjack_spark.functions import store as S

    meta = _lm_meta(store_dir)
    big, uni = load_lm_tables(spark, store_dir)
    meta["n_batches"] = 1
    if meta.get("layout") == "objects":
        return S.compact_objects(
            store_dir, _LM_META_NAME, meta, {"bigrams": big, "unigrams": uni}
        )
    S.compact_swap(
        store_dir, _LM_META_NAME, meta, {"bigrams": big, "unigrams": uni}
    )
    return meta
