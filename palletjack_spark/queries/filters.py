"""Projections / filters / predicates (SURVEY §2.2 Q10-Q13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from palletjack_spark.queries.registry import query, t


@query(
    "q10_projection",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity + 0.5 AS qty_adj
    FROM lineitem
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection / aliasing / expression select [host].  Elementwise double
    arithmetic is IEEE-deterministic, so values hash-match exactly."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") + 0.5).alias("qty_adj"),
    )


@query(
    "q11_predicates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE (l_quantity >= 30 AND l_discount < 0.05)
       OR (l_returnflag = 'R' AND NOT (l_quantity < 10))
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean predicate combinators [host]."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        ((F.col("l_quantity") >= 30) & (F.col("l_discount") < 0.05))
        | ((F.col("l_returnflag") == "R") & ~(F.col("l_quantity") < 10))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@query(
    "q12_in_between_like",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '%URGENT'
      AND o_custkey IS NOT NULL
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NULL [host]."""
    o = t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_orderpriority").like("%URGENT")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q13_pushdown_prune",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_quantity > 45
    GROUP BY l_returnflag
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate → storage pruning [ref R4 + Statistics h:552-636]: the
    shipdate/quantity filters reach the parquet scan (PushedFilters) and
    skip row groups via footer min/max — the built-in analogue of the
    reference's row-group pruning.  tests/test_plans.py asserts pushdown."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp_ntz"))
            & (F.col("l_quantity") > 45)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q47_hash_sample",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 100
             AS bucket
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 100 < 5
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling [north-star util]: a reproducible ~5%
    sample via an md5 key bucket — unlike ``df.sample`` it is stable across
    engines, partitionings and reruns, which is what a 100 TB training-data
    pipeline needs for holdout splits (the bucket expression is a pure
    projection, so the filter pipelines into the scan)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", bucket.alias("bucket"))
        .where(F.col("bucket") < 5)
    )


@query(
    "q47b_stratified_sample",
    oracle="""
    SELECT doc_id, lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#strat'),
                           1, 4))::BIGINT % 100 AS bucket
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#strat'),
                          1, 4))::BIGINT % 100
          < CASE WHEN lang = 'en' THEN 20 ELSE 5 END
    """,
)
def q47b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling (Q47b) [north-star util]: per-stratum
    rates — 20% of English, 5% of everything else — the rebalancing /
    eval-split primitive of a multilingual corpus pipeline.  Same
    reproducibility contract as Q47 (md5 bucket, engine- and
    partitioning-stable), with the rate a codegen'd CASE over the
    stratum column; the whole filter pipelines into the scan with zero
    shuffles."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#strat"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", 20).otherwise(5)
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


@query(
    "q47c_fixed_k_per_group_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ksamp'),
                             1, 4))::BIGINT AS hkey
      FROM documents),
    r AS (
      SELECT doc_id, lang, hkey,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY hkey, doc_id) AS rn
      FROM h)
    SELECT doc_id, lang, CAST(hkey AS BIGINT) AS hkey, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= 7
    """,
)
def q47c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-group deterministic sample (Q47c): exactly min(k, n)
    documents per language, chosen by smallest keyed md5 — the "k
    examples per class" primitive for eval-split and few-shot-pool
    construction, complementing Q47/Q47b's rate-based sampling (a rate
    cannot guarantee a count; a count cannot be done scan-local).

    Selection is uniform over each group (md5 of the id is
    order-independent) and reproducible across engines, partitionings,
    and reruns.  Scale shape: Spark plans the rank<=k filter as
    WindowGroupLimit — each map task keeps only its local top-k per
    group BEFORE the exchange, so the shuffle carries O(groups × k)
    rows, not the corpus (plan-asserted)."""
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ksamp"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", hkey.alias("hkey"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 7)
    )


@query(
    "q47d_group_holdout_split",
    oracle="""
    SELECT doc_id, source,
           CASE
             WHEN ('0x' || substr(md5(source || '#split'), 1, 4))::BIGINT
                  % 100 < 80 THEN 'train'
             WHEN ('0x' || substr(md5(source || '#split'), 1, 4))::BIGINT
                  % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def q47d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe group holdout split (Q47d) [north-star util]: assign
    every document to train/val/test by hashing its GROUP key (source
    domain), not its own id — all documents from one domain land in the
    same split, so near-duplicates and templated boilerplate within a
    domain can never straddle the train/eval boundary (the standard
    contamination guard row-level random splits silently violate;
    Dodge et al. 2021's C4 analysis is the cautionary tale).

    80/10/10 by md5 bucket of the group key — reproducible across
    engines, partitionings and reruns (the Q47 contract), and a pure
    row-local projection: zero shuffles, zero UDFs, pipelines into the
    scan (the split of a 100 TB corpus costs one pass).  Domain-level
    proportions converge to 80/10/10 only in the many-domains limit —
    the price of the leakage guard, by design."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("source"), F.lit("#split"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q47e_priority_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, greatest(n_chars, 1) AS w,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#prio'),
                             1, 15))::BIGINT AS hk
      FROM documents),
    p AS (
      SELECT doc_id, w,
             ROUND(CAST(w AS DOUBLE)
                   / ((CAST(hk AS DOUBLE) + 1.0)
                      / 1152921504606846976.0), 4) AS prio
      FROM h),
    r AS (
      SELECT doc_id, w, prio,
             ROW_NUMBER() OVER (ORDER BY prio DESC, doc_id) AS rn
      FROM p),
    tau AS (SELECT prio AS tau FROM r WHERE rn = 51)
    SELECT doc_id, CAST(w AS BIGINT) AS w, prio,
           greatest(CAST(w AS DOUBLE), (SELECT tau FROM tau)) AS w_est
    FROM r WHERE rn <= 50
    """,
)
def q47e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sample (Q47e, Duffield-Lund-Thorup 2007): k=50
    documents drawn with probability increasing in weight (n_chars —
    the token-budget proxy), WITH the estimator that makes the sample
    usable: each selected row carries ``w_est = max(w, τ)`` (τ = the
    (k+1)-th priority), whose sum is an unbiased estimate of the total
    corpus weight — the primitive behind "estimate this corpus slice's
    token count from a 50-doc sample".

    Priorities are ``w / u`` with ``u`` an md5-derived uniform in
    (0, 1] — DETERMINISTIC where classic A-ES (u^(1/w)) could never
    hash-match: ``pow``/``ln`` are libm-dependent, while this key uses
    only IEEE divisions, which are correctly rounded and therefore
    bit-identical on every engine (the q47 md5 discipline, extended to
    weights).  Scale shape: the priority is a row-local projection;
    Spark plans the top-(k+1) as TakeOrderedAndProject (per-partition
    top-k, then a merge of k+1-row heads — no global sort, no
    single-partition window over the corpus); the rank/τ bookkeeping
    runs on the 51 surviving rows only, and τ joins back as a broadcast
    scalar."""
    docs = t(spark, sf_dir, "documents")
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#prio"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    prio = F.round(
        w.cast("double")
        / ((hk.cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)),
        4,
    )
    scored = docs.select(
        "doc_id", w.alias("w"), prio.alias("prio")
    )
    top = scored.orderBy(F.desc("prio"), "doc_id").limit(51)
    # 51 bounded rows from here on: the single-partition window is on
    # the TakeOrdered result, never the corpus
    win = Window.orderBy(F.desc("prio"), "doc_id")
    ranked = top.withColumn("rn", F.row_number().over(win))
    tau = ranked.where(F.col("rn") == 51).select(F.col("prio").alias("tau"))
    return (
        ranked.where(F.col("rn") <= 50)
        .join(F.broadcast(tau), F.lit(True), "left")
        .select(
            "doc_id",
            F.col("w").cast("long").alias("w"),
            "prio",
            F.greatest(F.col("w").cast("double"), F.col("tau")).alias(
                "w_est"
            ),
        )
    )


@query(
    "q47f_stratified_priority_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, greatest(n_chars, 1) AS w,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sprio'),
                             1, 15))::BIGINT AS hk
      FROM documents),
    p AS (
      SELECT doc_id, lang, w,
             ROUND(CAST(w AS DOUBLE)
                   / ((CAST(hk AS DOUBLE) + 1.0)
                      / 1152921504606846976.0), 4) AS prio
      FROM h),
    r AS (
      SELECT doc_id, lang, w, prio,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY prio DESC, doc_id) AS rn
      FROM p),
    tau AS (SELECT lang, prio AS tau FROM r WHERE rn = 11)
    SELECT r.doc_id, r.lang, CAST(r.w AS BIGINT) AS w, r.prio,
           greatest(CAST(r.w AS DOUBLE), tau.tau) AS w_est
    FROM r LEFT JOIN tau ON r.lang = tau.lang
    WHERE r.rn <= 10
    """,
)
def q47f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified weighted priority sample (Q47f, round 12): q47e's
    Duffield-Lund-Thorup sample run INDEPENDENTLY per stratum (k=10 per
    language), each stratum carrying its own τ and ``max(w, τ)``
    estimator — per-stratum w_est sums estimate each language's total
    token mass from 10 docs, the per-domain budget question mixture
    planning (q135) actually asks.  Strata with ≤ k members return all
    members with w_est = w (the q47e degenerate contract, per stratum).

    Scale shape: unlike q47e's global TakeOrdered, the per-stratum
    top-(k+1) is a WindowGroupLimit — each map task keeps only its
    local k+1 per stratum BEFORE the exchange, so the shuffle carries
    O(strata × k) rows; τ derives from the same ranked rows (no second
    scan) and joins back per stratum."""
    docs = t(spark, sf_dir, "documents")
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#sprio"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    prio = F.round(
        w.cast("double")
        / ((hk.cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)),
        4,
    )
    win = Window.partitionBy("lang").orderBy(F.desc("prio"), "doc_id")
    ranked = (
        docs.select("doc_id", "lang", w.alias("w"), prio.alias("prio"))
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= 11)
        .localCheckpoint(eager=False)
    )
    tau = ranked.where(F.col("rn") == 11).select(
        "lang", F.col("prio").alias("tau")
    )
    return (
        ranked.where(F.col("rn") <= 10)
        .join(F.broadcast(tau), "lang", "left")
        .select(
            "doc_id",
            "lang",
            F.col("w").cast("long").alias("w"),
            "prio",
            F.greatest(F.col("w").cast("double"), F.col("tau")).alias(
                "w_est"
            ),
        )
    )
