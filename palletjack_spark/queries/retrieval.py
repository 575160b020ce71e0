"""Sketch, retrieval, and record-linkage operators (SURVEY §2.2
Q141–Q143): mergeable heavy-hitter summaries, symmetric-delete fuzzy
join, and integer-quantized BM25 ranking.

Shared discipline: every approximate structure here is used only as a
CANDIDATE generator, with an exact verification pass behind it — the
Misra-Gries summary over-approximates the heavy-hitter set and the exact
recount prunes it; the deletion-signature join over-approximates the
edit-distance-1 pairs and the exact levenshtein prunes it.  That makes
each operator exactly oracle-checkable (the sketch can never lose a true
answer) while keeping the scale path sub-quadratic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t

#: Misra-Gries capacity — any token with global frequency > n/_MG_M is
#: guaranteed to survive in at least one per-partition summary
_MG_M = 64

#: sentinel token that carries each partition's total count out of the
#: summary pass ('\\x00' cannot appear in whitespace-split tokens)
_MG_TOTAL = "\x00TOTAL"


def _mg_summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries summary over a ``token`` column.

    Processes Arrow batches incrementally: merge the batch's value
    counts into the running summary, then apply the Misra-Gries
    reduction — subtract the (m+1)-th largest weight from every entry
    and drop the non-positive ones — which Agarwal et al.'s "Mergeable
    Summaries" (PODS'12) shows preserves the MG guarantee: any item
    with true partition count > partition_n/m keeps a positive weight.
    Memory is O(m + batch vocab), never O(partition vocab).  Emits the
    surviving tokens plus one sentinel row carrying the partition's
    exact total token count (so the caller gets n without a second
    full scan)."""
    counts: dict[str, int] = {}
    total = 0
    for pdf in it:
        vc = pdf["token"].value_counts()
        total += int(vc.sum())
        for tok, c in vc.items():
            counts[tok] = counts.get(tok, 0) + int(c)
        if len(counts) > _MG_M:
            kth = sorted(counts.values(), reverse=True)[_MG_M]
            counts = {t_: c - kth for t_, c in counts.items() if c > kth}
    out = list(counts) + [_MG_TOTAL]
    weights = [counts.get(t_, total) for t_ in out[:-1]] + [total]
    yield pd.DataFrame({"token": out, "weight": weights})


@query(
    "q141_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    tot AS (SELECT COUNT(*) AS n FROM tok)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok, tot GROUP BY token, n HAVING COUNT(*) * 64 > n
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via mergeable Misra-Gries (Q141): every token whose
    corpus frequency exceeds n/64, with its EXACT count — the frequent-
    items primitive (vocabulary heads, trending keys, skew detection).

    Why not just GROUP BY token?  At 100 TB the full token-frequency
    table is itself huge and mostly tail; the MG summary bounds the
    shuffled state at m=64 entries PER PARTITION regardless of vocabulary
    size.  Two passes, both provably exact in combination:
    1. per-partition MG summaries via ``mapInPandas`` (incremental
       batch-merge + reduction, O(m) memory) — pigeonhole guarantees any
       global heavy hitter is a local heavy hitter somewhere, so the
       candidate union (≤ partitions×m rows) is a SUPERSET of the true
       answer;  the same pass smuggles out per-partition totals, so n
       costs no extra scan;
    2. exact recount of candidates only: the candidate set broadcasts
       into a hash join against a second token scan, and the final
       ``cnt*64 > n`` filter — exact integer arithmetic on both engines —
       prunes the false positives the sketch admitted.
    The oracle is the plain GROUP BY/HAVING the operator provably equals.
    """
    docs = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    # the summary is tiny (≤ partitions×(m+1) rows) but is referenced
    # twice (candidates + totals); materialize it so the corpus-wide MG
    # pass runs ONCE, not once per reference
    summary = docs.mapInPandas(
        _mg_summaries, "token string, weight long"
    ).localCheckpoint()
    n_df = (
        summary.where(F.col("token") == _MG_TOTAL)
        .agg(F.sum("weight").alias("n"))
    )
    cands = summary.where(F.col("token") != _MG_TOTAL).select("token").distinct()
    exact = (
        docs.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_df))
        .where(F.col("cnt") * 64 > F.col("n"))
        .select("token", "cnt")
    )


#: DuckDB/Spark-portable single-char-drop: chars [1..pos] ++ chars [pos+2..]
_DROP_SQL = "substr({s}, 1, {p}) || substr({s}, {p} + 2)"


@query(
    "q142_symdelete_join",
    oracle=f"""
    WITH dirty AS (
      SELECT s_suppkey AS dirty_key,
             {_DROP_SQL.format(s="s_name", p="s_suppkey % length(s_name)")}
               AS dirty_name
      FROM supplier)
    SELECT d.dirty_key, s.s_suppkey AS clean_key,
           CAST(levenshtein(d.dirty_name, s.s_name) AS INT) AS lev
    FROM dirty d JOIN supplier s
      ON levenshtein(d.dirty_name, s.s_name) <= 1
    """,
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage via symmetric-delete signatures (Q142): match
    every corrupted supplier name (one character dropped at a
    key-determined position — the corruption is DERIVED in-query, so the
    operator stays a pure function of the input tables) to all clean
    names within edit distance 1.

    The oracle is the quadratic cross join with an exact levenshtein
    predicate; the Spark plan is the SymSpell / FastSS shape — candidate
    generation by DELETION SIGNATURES, which is sub-quadratic and
    provably complete for edit distance ≤ 1: if lev(a,b) ≤ 1 then a and
    b share at least one member of {x} ∪ {x minus char i} (equal
    strings share x itself; a substitution at i shares both sides'
    delete-at-i variant; an insertion/deletion shares the shorter string
    verbatim).  Each side explodes into length+1 signatures (bounded
    fan-out, all JVM string ops), candidates meet in a HASH equi-join on
    the signature — never a nested-loop over pairs — pairs dedup, and an
    exact ``levenshtein ≤ 1`` verification prunes the false candidates
    the signatures admit (two strings can share a deletion variant at
    distance 2, e.g. "ab"/"ba").  At 100 TB the signature join shuffles
    O(rows × avg_len) small keys instead of comparing O(rows²) pairs;
    both engines compute the identical unit-cost Levenshtein metric."""
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    dirty = sup.select(
        F.col("s_suppkey").alias("dirty_key"),
        F.concat(
            F.expr("substr(s_name, 1, s_suppkey % length(s_name))"),
            F.expr("substr(s_name, s_suppkey % length(s_name) + 2)"),
        ).alias("dirty_name"),
    )

    def sigs(df: DataFrame, name_col: str) -> DataFrame:
        i = F.explode(
            F.sequence(F.lit(0), F.length(F.col(name_col)))
        ).alias("i")
        out = df.select("*", i)
        sig = F.when(F.col("i") == 0, F.col(name_col)).otherwise(
            F.concat(
                F.expr(f"substr({name_col}, 1, i - 1)"),
                F.expr(f"substr({name_col}, i + 1)"),
            )
        )
        return out.select("*", sig.alias("sig")).drop("i")

    cand = (
        sigs(dirty, "dirty_name")
        .join(
            sigs(sup, "s_name").withColumnRenamed("s_suppkey", "clean_key"),
            "sig",
        )
        .select("dirty_key", "dirty_name", "clean_key", "s_name")
        .distinct()
    )
    return (
        cand.withColumn(
            "lev", F.levenshtein("dirty_name", "s_name")
        )
        .where(F.col("lev") <= 1)
        .select("dirty_key", "clean_key", "lev")
    )


#: the fixed conjunctive query BM25 ranks against
_BM25_TERMS = ("join", "scan", "window")

_BM25_SQL = f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
    stats AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS t_total,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(1000 * SUM(dl) // COUNT(*) AS BIGINT) AS avgdl_milli
      FROM dl),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
      WHERE token IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, token),
    df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT tf.doc_id,
             SUM(((1000000 * (n_docs - df.df + 1) // (n_docs + 1))
                  * (tf.tf * 2200) * 1000)
                 // (tf.tf * 1000
                     + (1200 * (250 + (750 * ((1000000 * dl.dl)
                                              // stats.avgdl_milli))
                                      // 1000))
                       // 1000)) AS score
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN df ON tf.token = df.token
      CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, CAST(score AS BIGINT) AS score
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
"""


def _bm25_tf(docs: DataFrame) -> DataFrame:
    """(doc, term) term frequencies for the query terms only: the token
    IN filter sits between the explode and the aggregate's exchange, so
    the shuffled volume is O(matching postings) — the inverted-index
    posting-list scan shape — not O(corpus tokens)."""
    return (
        docs.select("doc_id", F.explode("toks").alias("token"))
        .where(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("long").alias("tf"))
    )


@query("q143_bm25_topk", oracle=_BM25_SQL)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-quantized BM25 retrieval (Q143): top-20 documents for a
    fixed 3-term query under Okapi BM25 (k1=1.2, b=0.75) with every
    factor held in scaled integers — the q130/q125b fixed-point
    discipline, because float BM25 cannot hash-match across engines
    (ln() differs by ulps between libm builds and summation order is
    partition-dependent).  The idf factor is a rarity fraction
    ``1e6·(N-df+1) div (N+1)`` (monotone in -df, bounded ≤ 1e6 so the
    score product stays far from int64 overflow at any corpus size);
    length normalization and tf saturation are milli-scaled integer
    divisions sequenced IDENTICALLY in the Spark expression and the
    oracle SQL — truncating div agrees on both engines — and the final
    per-doc score sums ≤ |terms| exact integers.

    Scale shape: corpus-wide stats (N, total tokens) are ONE global
    aggregate (no shuffle, map-side partial) broadcast back as a 1-row
    cross join; document lengths are a row-local ``size(split(...))``
    (no explode); only tokens MATCHING the query terms survive to the
    (doc, term) tf aggregate — the explode is filtered before its
    exchange, so the shuffled volume is O(matching postings), the
    inverted-index scan shape, not O(corpus tokens); df is a 3-row
    broadcast.  Top-20 with (score, doc_id) total order."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    dl = docs.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.sum("dl").cast("long").alias("t_total"),
        F.count("*").cast("long").alias("n_docs"),
        F.expr("CAST(1000 * sum(dl) div count(*) AS BIGINT)").alias(
            "avgdl_milli"
        ),
    )
    # O(matching postings) — referenced by both df and the scorer;
    # materialize so the corpus explode runs once, not twice
    tf = _bm25_tf(docs).localCheckpoint()
    df = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.expr(
                "CAST(SUM(((1000000 * (n_docs - df + 1) div (n_docs + 1))"
                "  * (tf * 2200) * 1000)"
                " div (tf * 1000"
                "  + (1200 * (250 + (750 * ((1000000 * dl)"
                "                           div avgdl_milli))"
                "                   div 1000))"
                "    div 1000)) AS BIGINT)"
            ).alias("score")
        )
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(20)


#: the q151 oracle re-uses q143's CTE chain verbatim (everything before
#: its final SELECT — rindex finds the last one), so the BM25 leg of the
#: fusion is character-identical to the already-certified q143 oracle
_BM25_CTES = _BM25_SQL[: _BM25_SQL.rindex("SELECT doc_id")]

_RRF_SQL = (
    _BM25_CTES
    + """,
    bm25 AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS bm25_rank
      FROM scored ORDER BY score DESC, doc_id LIMIT 20),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    ann_scored AS (
      SELECT c.vec_id,
             SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)) /
             sqrt(SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))) /
             sqrt(SUM(CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) AS cosine
      FROM q, embeddings c,
           UNNEST(generate_series(1, len(c.embedding))) AS s(i)
      WHERE c.vec_id != 0
      GROUP BY c.vec_id),
    ann AS (
      SELECT vec_id, CAST(rn AS INT) AS ann_rank FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY ROUND(cosine, 4) DESC, vec_id) AS rn
        FROM ann_scored)
      WHERE rn <= 20),
    fused AS (
      SELECT COALESCE(b.doc_id, a.vec_id) AS doc_id,
             COALESCE(b.bm25_rank, 0) AS bm25_rank,
             COALESCE(a.ann_rank, 0) AS ann_rank,
             CAST(COALESCE(1000000 // (60 + b.bm25_rank), 0)
                + COALESCE(1000000 // (60 + a.ann_rank), 0) AS BIGINT)
               AS rrf_score
      FROM bm25 b FULL OUTER JOIN ann a ON b.doc_id = a.vec_id)
    SELECT doc_id, bm25_rank, ann_rank, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
"""
)


@query("q151_rrf_fusion", oracle=_RRF_SQL)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Q151): fuse q143's
    integer BM25 lexical shortlist with a cosine-ANN semantic shortlist
    (the q92 leg, query = the vec_id-0 embedding over the shared
    doc_id/vec_id id space) with ``1e6 div (60 + rank)`` integer rank
    arithmetic — the standard hybrid-retrieval head every RAG /
    data-curation pipeline runs on top of the two legs
    (functions/fusion.py:rrf_fuse; Cormack et al., SIGIR'09).

    Both legs are exactly reproducible (q143's fixed-point BM25 and
    q92's rounded cosine ranking are each already hash-certified), and
    only their integer RANKS enter the fusion, so the fused score is
    hash-checkable against DuckDB.  Scale shape: the legs bound the
    candidate sets (top-20 each) BEFORE fusion; the fusion itself is one
    full-outer join co-partitioned on doc_id over O(shortlist) rows —
    corpus-sized data never reaches the fusion exchange."""
    from pyspark.sql import Window

    from palletjack_spark.functions.fusion import rrf_fuse
    from palletjack_spark.functions.similarity import cosine_topk

    # lexical leg: q143's top-20, ranked by its own total order
    bm25_top = q143(spark, sf_dir)
    w = Window.orderBy(F.desc("score"), "doc_id")
    bm25 = bm25_top.select(
        "doc_id", F.row_number().over(w).alias("rank")
    )

    # semantic leg: exact cosine top-20 neighbors of the query vector
    emb = t(spark, sf_dir, "embeddings")
    ann = (
        cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=20)
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )

    fused = rrf_fuse({"bm25": bm25, "ann": ann}, "doc_id")
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(10)


#: Count-Min sketch geometry (q141b): d rows x w counters.  At this
#: fixture scale w=64 keeps collisions VISIBLE (est > exact for some
#: keys) so the overestimate-only contract is actually exercised.
_CMS_D = 4
_CMS_W = 64


def _cms_cell_sql(r: str, tok: str) -> str:
    """DuckDB md5 bucket of row-salted token → counter column."""
    return (
        f"('0x' || substr(md5(CAST({r} AS VARCHAR) || '#' || {tok}),"
        f" 1, 15))::BIGINT % {_CMS_W}"
    )


@query(
    "q141b_count_min_sketch",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    cells AS (
      SELECT r, {_cms_cell_sql('r', 'token')} AS c, COUNT(*) AS v
      FROM tok, UNNEST(generate_series(0, {_CMS_D - 1})) AS s(r)
      GROUP BY 1, 2),
    exact AS (
      SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
      ORDER BY cnt DESC, token LIMIT 20),
    probes AS (
      SELECT e.token, e.cnt, s.r, {_cms_cell_sql('s.r', 'e.token')} AS c
      FROM exact e, UNNEST(generate_series(0, {_CMS_D - 1})) AS s(r)),
    est AS (
      SELECT p.token, p.cnt, MIN(cells.v) AS est
      FROM probes p JOIN cells ON cells.r = p.r AND cells.c = p.c
      GROUP BY p.token, p.cnt)
    SELECT token, CAST(cnt AS BIGINT) AS cnt, CAST(est AS BIGINT) AS est,
           CAST(est - cnt AS BIGINT) AS overestimate
    FROM est ORDER BY cnt DESC, token
    """,
)
def q141b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates with exact verification
    (Q141b, Cormode & Muthukrishnan 2005) — completes the sketch family:
    q31b HLL and q31c theta estimate CARDINALITIES, q37d KLL quantiles,
    q141 Misra-Gries finds WHICH keys are heavy; CMS answers "how often
    does THIS key occur" for any key in O(d·w) state, with the one-sided
    guarantee est ≥ exact (and est ≤ exact + εn w.h.p.).

    The sketch IS a map-side combine: each token expands row-locally to
    d (row, counter) cells and ONE hash aggregate collapses the corpus
    to d×w = 256 rows — partial per-partition aggregation is exactly
    CMS's merge-by-addition property, so 1000 executors each hold a
    256-cell partial and the shuffle carries sketches, not tokens.  Row
    hashes are row-salted md5 buckets (the q47 discipline — the oracle
    rebuilds the identical sketch).  The top-20 exact side is the
    verification scan (the q31c/q37d sketch-vs-exact pattern).  Honest
    note: on this fixture the top-20 keys' overestimates are all ZERO —
    heavy keys dominate their own cells and the min-over-d dodges the
    tail's collisions, which is precisely WHY CMS works for heavy keys;
    the collision regime (est > exact) is exercised on a crafted
    1000-distinct-token corpus in tests, where every cell holds ~16
    colliding tokens and single-occurrence probes provably
    overestimate."""
    docs = t(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    cell = (
        f"pmod(cast(conv(substring(md5(concat(cast(r as string), '#',"
        f" token)), 1, 15), 16, 10) as bigint), {_CMS_W})"
    )
    cells = (
        docs.select(
            F.expr(
                f"explode(transform(sequence(0, {_CMS_D - 1}),"
                f" r -> struct(r AS r, {cell} AS c)))"
            ).alias("rc")
        )
        .select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count("*").alias("v"))
    )
    exact = (
        docs.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )
    probes = exact.select(
        "token",
        "cnt",
        F.expr(
            f"explode(transform(sequence(0, {_CMS_D - 1}),"
            f" r -> struct(r AS r, {cell} AS c)))"
        ).alias("rc"),
    ).select("token", "cnt", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("token", "cnt")
        .agg(F.min("v").alias("est"))
    )
    return est.select(
        "token",
        "cnt",
        "est",
        (F.col("est") - F.col("cnt")).alias("overestimate"),
    ).orderBy(F.desc("cnt"), "token")
