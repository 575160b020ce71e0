"""Embedding similarity search (Q92).

Two paths, same contract:
- ``cosine_topk``   — brute force: broadcast the query matrix, numpy GEMM
  per Arrow batch inside ``mapInPandas``, per-partition top-k, then a tiny
  global top-k.  Exact; O(n_corpus × n_query) but embarrassingly parallel —
  the 100 TB shape when the query set is small.
- ``lsh_bucket_topk`` — random-hyperplane LSH: corpus and queries are
  bucketed by sign-pattern; candidates come only from matching buckets
  (multi-probe via bit flips), then exact re-scoring.  Sub-linear
  candidate generation for large query sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _collect_queries(queries_df: DataFrame, id_col: str, vec_col: str):
    rows = queries_df.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype="int64")
    qmat = np.array([list(r[1]) for r in rows], dtype="float64")
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qnorm[qnorm == 0] = 1.0
    return qids, qmat, qnorm


def cosine_scores(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query_id, vec_id, cosine) scores — brute-force GEMM."""
    spark = corpus_df.sparkSession
    qids, qmat, qnorm = _collect_queries(queries_df, id_col, vec_col)
    bqids = spark.sparkContext.broadcast(qids)
    bqmat = spark.sparkContext.broadcast(qmat)
    bqnorm = spark.sparkContext.broadcast(qnorm)

    def score(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                continue
            norms = np.sqrt((mat * mat).sum(axis=1))
            norms[norms == 0] = 1.0
            sims = (mat @ bqmat.value.T) / norms[:, None] / bqnorm.value[None, :]
            n_q = len(bqids.value)
            yield pd.DataFrame(
                {
                    "query_id": np.tile(bqids.value, len(ids)),
                    "vec_id": np.repeat(ids, n_q),
                    "cosine": sims.reshape(-1),
                }
            )

    return corpus_df.select(id_col, vec_col).mapInPandas(
        score, "query_id long, vec_id long, cosine double"
    )


def cosine_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, cosine, rank).

    Spark plans the rank<=k filter as WindowGroupLimit: each partition
    keeps only k rows per query before the shuffle, so the global sort
    never materializes the full score matrix."""
    scores = cosine_scores(corpus_df, queries_df, id_col, vec_col)
    if exclude_self:
        scores = scores.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine", 4).desc(), F.col("vec_id")
    )
    return (
        scores.select(
            "query_id",
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 3,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH + exact re-scoring.

    Standard multi-table amplification: ``n_tables`` independent hyperplane
    sets; a corpus row gets one sign-pattern bucket per table, a query
    probes its bucket plus ``n_probes`` single-bit flips in every table.
    Candidates join on (table, bucket) — an equi-join that shuffles
    candidates only, never the corpus cross product — then exact cosine
    re-scores.  Recall grows with n_tables/n_probes, candidate cost with
    n_tables/2^n_planes; tune per corpus geometry."""
    spark = corpus_df.sparkSession
    planes = np.stack(
        [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    )  # (T, P, D)
    bplanes = spark.sparkContext.broadcast(planes)

    def buckets_of(mat: np.ndarray) -> np.ndarray:
        """(n, T) bucket ids."""
        signs = np.einsum("nd,tpd->ntp", mat, bplanes.value) > 0
        return (signs * (1 << np.arange(n_planes))[None, None, :]).sum(axis=2)

    def corpus_buckets(it):
        for pdf in it:
            mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                continue
            b = buckets_of(mat)  # (n, T)
            n = len(mat)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables), n),
                    "bucket": b.reshape(-1),
                    "vec": [list(v) for v in np.repeat(mat, n_tables, axis=0)],
                }
            )

    corpus_b = corpus_df.select(id_col, vec_col).mapInPandas(
        corpus_buckets, "vec_id long, tbl int, bucket long, vec array<double>"
    )

    qids, qmat, _ = _collect_queries(queries_df, id_col, vec_col)
    qbase = buckets_of(qmat)  # (nq, T)
    probe_rows = []
    for qi, (qid, vec) in enumerate(zip(qids, qmat)):
        for t in range(n_tables):
            b = int(qbase[qi, t])
            buckets = {b} | {b ^ (1 << j) for j in range(n_probes)}
            for bb in buckets:
                probe_rows.append((int(qid), t, bb, [float(x) for x in vec]))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, tbl int, bucket long, qvec array<double>"
    )

    cand = (
        corpus_b.join(F.broadcast(probes), ["tbl", "bucket"])
        .select("query_id", "vec_id", "vec", "qvec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (dot / norm("vec") / norm("qvec")).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine", 4).desc(), F.col("vec_id")
    )
    return (
        scored.select(
            "query_id",
            "vec_id",
            F.round("cosine", 4).alias("cosine"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )
