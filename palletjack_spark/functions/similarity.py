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

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _collect_queries(queries_df: DataFrame, id_col: str, vec_col: str):
    rows = queries_df.select(id_col, vec_col).collect()
    if not rows:
        # every consumer broadcasts/scores this matrix — an empty query
        # set dies with an opaque numpy AxisError downstream (round-13
        # review); fail typed at the shared collection point
        raise ValueError(
            "no query vectors: the queries DataFrame is empty"
        )
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
    return _exact_rescore_topk(cand, k, exclude_self)


def _exact_rescore_topk(cand: DataFrame, k: int, exclude_self: bool) -> DataFrame:
    """Exact cosine + top-k over candidate rows (query_id, vec_id, vec, qvec):
    JVM-side zip_with/aggregate dot product, WindowGroupLimit rank filter.

    The candidate list is small in bytes but each row pays an O(dim) dot
    product — explicit keyed repartition pins the fan-out (AQE would
    coalesce by size) and pre-partitions for the rank window."""
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism, "query_id"
    )
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # greatest(·, 1e-12): a zero vector must score 0.0, not NaN — NaN sorts
    # ABOVE all doubles in Spark's DESC ordering and would rank first
    # (mirrors the zero-norm guard in cosine_scores)
    norm = lambda c: F.greatest(  # noqa: E731
        F.sqrt(F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)),
        F.lit(1e-12),
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


def nn_graph(
    corpus_df: DataFrame,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact nearest-neighbor graph: (vec_id, nn_id, cosine) — each vector's
    top-1 cosine neighbor.  The embedding-cosine near-dup primitive: a
    near-dup edge is nn cosine >= threshold.

    Blocked all-pairs: vectors are replicated to every unordered block pair
    containing their block, each (i, j) group runs one numpy GEMM over its
    two blocks, emits block-local bests, and a global window picks the
    winner.  Shuffle volume is n_blocks × corpus; the full n² compute is
    spread over B(B+1)/2 independent tasks.  Exact (oracle-verifiable); for
    100 TB use the approximate paths (lsh_bucket_topk / ivf_topk) and
    reserve this for per-bucket verification."""
    B = n_blocks

    base = corpus_df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("blk", F.pmod("vec_id", F.lit(B)).cast("int"))
    exploded = base.select(
        "vec_id",
        "vec",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("other"),
    ).select(
        "vec_id",
        "vec",
        "blk",
        F.least("blk", "other").alias("gi"),
        F.greatest("blk", "other").alias("gj"),
    )

    def best_in_group(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype="float64") for v in pdf["vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        sides = []  # (query_mask, cand_mask)
        if gi == gj:
            m = (pdf["blk"] == gi).to_numpy()
            sides.append((m, m))
        else:
            a = (pdf["blk"] == gi).to_numpy()
            b = (pdf["blk"] == gj).to_numpy()
            sides.append((a, b))
            sides.append((b, a))
        frames = []
        for qm, cm in sides:
            qi, ci = ids[qm], ids[cm]
            if len(qi) == 0 or len(ci) == 0:
                continue
            # round to the output precision BEFORE ranking so the
            # min-id tie-break matches the oracle's ORDER BY exactly
            S = np.round(mat[qm] @ mat[cm].T, 4)
            S[qi[:, None] == ci[None, :]] = -np.inf  # mask self-pairs
            best = S.max(axis=1)
            keep = best > -np.inf
            cand_ids = np.where(S == best[:, None], ci[None, :], np.iinfo("int64").max)
            frames.append(
                pd.DataFrame(
                    {
                        "vec_id": qi[keep],
                        "cand_id": cand_ids.min(axis=1)[keep],
                        "cosine": best[keep],
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"vec_id": [], "cand_id": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    cands = exploded.groupBy("gi", "gj").applyInPandas(
        best_in_group, "vec_id long, cand_id long, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", F.col("cand_id").alias("nn_id"), "cosine")
    )


def _kmeans_cosine(mat: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means: init = first k rows (caller passes
    an id-ordered sample), assign by max cosine, recenter, renormalize.
    A sample smaller than ``k`` pads by repeating rows (the ``_kmeans_l2``
    rule — round-17 sweep: the unpadded return broke the declared-shape
    contract, and ``save_ann_index`` then stamped a manifest whose
    ``n_centroids`` its own loader rejected as a torn store); duplicate
    centroids just leave their clones' cells empty (argmax picks the
    first)."""
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    C = mat[: min(k, len(mat))].copy()
    if len(C) < k:
        C = np.concatenate([C] * (k // max(len(C), 1) + 1))[:k].copy()
    for _ in range(iters):
        assign = (mat @ C.T).argmax(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    train_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: spherical-kmeans
    centroids partition the corpus into cells; each query probes its
    ``n_probes`` nearest cells and exact cosine re-scores the candidates.

    The scale path for big query sets: candidate cost is ~n_probes/n_centroids
    of the corpus per query, and the cell assignment is a one-pass
    mapInPandas keyed join — no cross product.  ``n_probes == n_centroids``
    degenerates to exact brute force (asserted in tests).  Centroids are
    deterministic (id-ordered training sample, fixed-init kmeans)."""
    spark = corpus_df.sparkSession
    sample = (
        corpus_df.select(id_col, vec_col).orderBy(id_col).limit(train_rows).collect()
    )
    if not sample:
        raise ValueError(
            "ivf_topk: the corpus is empty — nothing to train cells on"
        )
    train = np.array([list(r[1]) for r in sample], dtype="float64")
    C = _kmeans_cosine(train, n_centroids)
    bC = spark.sparkContext.broadcast(C)

    def assign_cells(it):
        for pdf in it:
            mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            if len(mat) == 0:
                continue
            n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": (n @ bC.value.T).argmax(axis=1).astype("int32"),
                    "vec": [list(v) for v in mat],
                }
            )

    corpus_cells = corpus_df.select(id_col, vec_col).mapInPandas(
        assign_cells, "vec_id long, cell int, vec array<double>"
    )

    qids, qmat, qnorm = _collect_queries(queries_df, id_col, vec_col)
    qn = qmat / qnorm[:, None]
    probe_cells = np.argsort(-(qn @ C.T), axis=1)[:, :n_probes]
    probes = spark.createDataFrame(
        [
            (int(qid), int(c), [float(x) for x in vec])
            for qid, vec, cells in zip(qids, qmat, probe_cells)
            for c in cells
        ],
        "query_id long, cell int, qvec array<double>",
    )
    cand = corpus_cells.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "vec", "qvec"
    )
    return _exact_rescore_topk(cand, k, exclude_self)


#: SemDeDup cosine threshold — vectors this similar to a LOWER-id vector in
#: the same cluster are dropped.  Module-level so the DuckDB oracle embeds
#: the same value.  0.2 is tuned to the iid-random fixture (cos ~ N(0, 1/64):
#: ~1.6σ, so both keep and drop branches genuinely fire); real corpora use
#: 0.9+ on *semantic* embeddings.
SEMDEDUP_TAU = 0.2


def _fold_dot(a: str, b: str) -> str:
    """SQL expr: dot product of two float arrays as a strict left-to-right
    DOUBLE fold.  Bit-portable: DuckDB's ``list_reduce`` folds the same
    product list in the same order, and IEEE double ops are deterministic,
    so both engines produce the identical double (the leading ``0.0 + x``
    is exact)."""
    return (
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cluster_col: str,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """SemDeDup-style embedding-space dedup (Abbas et al. 2023): within
    each cluster, a vector whose cosine to ANY lower-id cluster member
    reaches ``tau`` is a semantic duplicate and is dropped (the lowest id
    of each similar group survives — deterministic, no iteration).

    Returns (id, cluster, keep) for every input vector, ordered by
    nothing (caller sorts).

    Scale shape — this is the published SemDeDup decomposition: the
    O(n²) cosine scan is *within-cluster only*, and clustering (k-means
    with k ≈ √N, e.g. the driver-trained IVF cells in ``ivf_topk``) bounds
    cluster sizes so each cluster's pair block fits one task.  The
    cluster self-join shuffles (id, vec) once on the cluster key; the
    drop list is id-only and byte-gated downstream exactly like Q106's
    loser anti-join.  A degenerate hot cluster (thousands of identical
    embeddings) is the Q91 hot-bucket regime — cap cluster size at the
    assigner and re-split, which re-finds the same duplicates because
    identical vectors land in every sub-cell's pair block with their
    lowest-id member.

    The ``cluster_col`` here is any precomputed assignment (the fixture
    uses the ``label`` column; production pipelines persist the IVF cell
    id).  Cosines are strict left-fold double dot products
    (``_fold_dot``) so a SQL oracle reproduces every comparison
    bit-exactly."""
    from palletjack_spark.functions.curation import _check_reserved

    _check_reserved(
        {"nrm", "_sd_dropped", "keep"},
        id_col=id_col, cluster_col=cluster_col, vec_col=vec_col,
    )
    nrm = F.sqrt(F.expr(_fold_dot(vec_col, vec_col)))
    v = df.select(
        F.col(id_col), F.col(cluster_col), F.col(vec_col), nrm.alias("nrm")
    )
    a, b = v.alias("a"), v.alias("b")
    cos = F.expr(f"{_fold_dot(f'a.{vec_col}', f'b.{vec_col}')}") / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    dropped = (
        a.join(
            b,
            (F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(cos >= F.lit(tau))
        .select(F.col(f"b.{id_col}").alias("_sd_dropped"))
        .distinct()
    )
    return (
        v.join(dropped, F.col(id_col) == F.col("_sd_dropped"), "left")
        .select(
            F.col(id_col),
            F.col(cluster_col),
            F.col("_sd_dropped").isNull().alias("keep"),
        )
    )


def _kmeans_l2(mat: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic L2 k-means for PQ codebooks: init = first k rows of
    the id-ordered training sample, assign by min squared distance,
    recenter; empty clusters keep their previous centroid."""
    if len(mat) == 0:
        # an empty corpus/sample would otherwise surface as an opaque
        # numpy argmin-over-empty-axis error from deep inside the loop
        raise ValueError(
            "k-means training requires a non-empty sample "
            "(pq_topk/ivf_topk on an empty corpus?)"
        )
    C = mat[: min(k, len(mat))].copy()
    if len(C) < k:  # degenerate tiny sample: pad by repeating rows
        C = np.concatenate([C] * (k // max(len(C), 1) + 1))[:k].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def pq_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    m_subspaces: int = 8,
    n_codes: int = 16,
    shortlist: int = 64,
    train_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via Product Quantization (Jégou et al., PAMI
    2011): split each L2-normalized vector into ``m_subspaces`` blocks,
    vector-quantize each block against a per-subspace codebook, and scan
    CODES, not vectors — asymmetric distance computation (ADC) scores a
    candidate as the sum of per-block query·centroid lookup-table entries.

    The 100 TB memory story: a dim-64 float64 embedding is 512 B; its PQ
    code is ``m_subspaces`` small ints (8 B here) — the corpus the ADC
    scan touches shrinks ~64×, which is the difference between an ANN
    sweep that fits in page cache and one that doesn't.  Plan shape: the
    encode and the ADC scan are zero-shuffle mapInPandas passes over the
    corpus (lookup tables broadcast, per-batch partial top-``shortlist``
    bounds fan-out); only the tiny (query × shortlist) candidate list
    crosses an exchange for the global rank + exact re-score.

    ``shortlist`` ≥ corpus size degenerates to exact brute force (the
    shortlist keeps everything and the re-score is exact) — the
    registered driver query runs there so the whole pipeline is
    hash-checkable; realistic settings are recall-tested in
    tests/test_llm.py."""
    spark = corpus_df.sparkSession
    sample = (
        corpus_df.select(id_col, vec_col).orderBy(id_col).limit(train_rows).collect()
    )
    train = np.array([list(r[1]) for r in sample], dtype="float64")
    # guard BEFORE normalizing: axis=1 on an empty/0-d array raises
    # numpy AxisError instead of this intended error (round-6 ADVICE)
    if train.ndim != 2 or len(train) == 0:
        raise ValueError("pq_topk requires a non-empty corpus sample")
    train = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
    dim = train.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    codebooks = np.stack(
        [
            _kmeans_l2(train[:, m * sub : (m + 1) * sub], n_codes)
            for m in range(m_subspaces)
        ]
    )  # (M, K, sub)
    bCB = spark.sparkContext.broadcast(codebooks)

    def encode(it):
        CB = bCB.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(mat), len(CB)), dtype="int32")
            for m in range(len(CB)):
                blk = mat[:, m * sub : (m + 1) * sub]
                d2 = ((blk[:, None, :] - CB[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    corpus_codes = corpus_df.select(id_col, vec_col).mapInPandas(
        encode, "vec_id long, codes array<int>"
    )

    qids, qmat, qnorm = _collect_queries(queries_df, id_col, vec_col)
    qn = qmat / qnorm[:, None]
    # ADC lookup tables: T[q, m, j] = qblock · centroid  (inner product of
    # normalized query with codebook centroids; cosine ≈ Σ_m T[q, m, code_m])
    T = np.einsum(
        "qms,mjs->qmj", qn.reshape(len(qn), m_subspaces, sub), codebooks
    )
    bT = spark.sparkContext.broadcast(T)
    bqids = spark.sparkContext.broadcast(qids)

    def adc_scan(it):
        Tl, qi = bT.value, bqids.value
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (B, M)
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for q in range(len(qi)):
                scores = Tl[q][np.arange(codes.shape[1]), codes].sum(axis=1)
                keep = min(shortlist, len(scores))
                top = np.argpartition(-scores, keep - 1)[:keep]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qi[q],
                            "vec_id": ids[top],
                            "approx_ip": scores[top],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    partial = corpus_codes.mapInPandas(
        adc_scan, "query_id long, vec_id long, approx_ip double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_ip"), F.asc("vec_id")
    )
    short = (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= shortlist)
        .select("query_id", "vec_id")
    )
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in zip(qids, qmat)],
        "query_id long, qvec array<double>",
    )
    cand = (
        corpus_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.transform("_v", lambda x: x.cast("double")).alias("vec"),
            "qvec",
        )
    )
    return _exact_rescore_topk(cand, k, exclude_self)


def _train_ivf_pq(
    corpus_df: DataFrame,
    n_centroids: int,
    m_subspaces: int,
    n_codes: int,
    train_rows: int,
    id_col: str,
    vec_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic IVF-PQ quantizer training: id-ordered bounded
    sample, fixed-init cosine k-means for the coarse cells, fixed-init
    L2 k-means per subspace over the RESIDUALS.  Returns ``(C,
    codebooks)`` with shapes ``(n_centroids, dim)`` / ``(m, k, sub)``."""
    sample = (
        corpus_df.select(id_col, vec_col).orderBy(id_col).limit(train_rows).collect()
    )
    train = np.array([list(r[1]) for r in sample], dtype="float64")
    # guard BEFORE normalizing: axis=1 on an empty/0-d array raises
    # numpy AxisError instead of this intended error (round-6 ADVICE)
    if train.ndim != 2 or len(train) == 0:
        raise ValueError("ivf_pq_topk requires a non-empty corpus sample")
    train = train / np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
    dim = train.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    C = _kmeans_cosine(train, n_centroids)  # (ncells, dim), unit rows
    resid = train - C[(train @ C.T).argmax(axis=1)]
    codebooks = np.stack(
        [
            _kmeans_l2(resid[:, m * sub : (m + 1) * sub], n_codes)
            for m in range(m_subspaces)
        ]
    )  # (M, K, sub)
    return C, codebooks


#: on-disk format version of the persisted ANN quantizer sidecar
_ANN_FORMAT_VERSION = 1
_ANN_META_NAME = "_ann_meta.json"


def save_ann_index(
    corpus_df: DataFrame,
    path: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 16,
    train_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train IVF-PQ quantizers once and persist them as a versioned
    sidecar dataset (round-6 verdict item 7: the metadata index's
    build-once/read-many discipline, applied to the ANN family).

    Layout: ``path/quantizers`` is a tiny parquet dataset of tagged rows
    — ``(kind='centroid', i=cell, j=0, vec)`` and ``(kind='code', i=m,
    j=code, vec)`` — plus ``path/_ann_meta.json`` recording the format
    version and training parameters, so a loader can validate before
    trusting the artifact (the q09e snapshot-manifest discipline).  The
    whole artifact is a few KB: ``n_centroids·dim + m·k·sub`` doubles.
    Returns the loaded index dict (same shape as :func:`load_ann_index`).
    """
    import json

    spark = corpus_df.sparkSession
    C, codebooks = _train_ivf_pq(
        corpus_df,
        n_centroids=n_centroids,
        m_subspaces=m_subspaces,
        n_codes=n_codes,
        train_rows=train_rows,
        id_col=id_col,
        vec_col=vec_col,
    )
    rows = [
        ("centroid", int(i), 0, [float(x) for x in C[i]])
        for i in range(len(C))
    ] + [
        ("code", int(m), int(j), [float(x) for x in codebooks[m, j]])
        for m in range(codebooks.shape[0])
        for j in range(codebooks.shape[1])
    ]
    spark.createDataFrame(
        rows, "kind string, i int, j int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "quantizers")
    )
    meta = {
        "format_version": _ANN_FORMAT_VERSION,
        "n_centroids": n_centroids,
        "m_subspaces": m_subspaces,
        "n_codes": n_codes,
        "sub_dim": int(codebooks.shape[2]),
        "dim": int(C.shape[1]),
        "train_rows": train_rows,
    }
    tmp = os.path.join(path, _ANN_META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _ANN_META_NAME))
    return {"centroids": C, "codebooks": codebooks, "meta": meta}


def load_ann_index(spark, path: str) -> dict:
    """Load a persisted IVF-PQ quantizer sidecar written by
    :func:`save_ann_index`; validates the format version and declared
    shapes before returning ``{"centroids", "codebooks", "meta"}``.

    The read is one bounded collect of ``n_centroids + m·k`` rows (a few
    hundred) — never a recompute: no corpus scan, no k-means, no
    training jobs.  Doubles round-trip parquet exactly, so a query over
    the loaded index is bit-identical to one over the in-memory
    quantizers it was saved from (tested)."""
    import json

    with open(os.path.join(path, _ANN_META_NAME)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _ANN_FORMAT_VERSION:
        raise ValueError(
            f"unsupported ANN index format_version {meta.get('format_version')}"
            f" at {path} (supported: {_ANN_FORMAT_VERSION})"
        )
    # bound the declared shapes BEFORE any allocation sized from them
    # (round-16 sweep — the codec discipline: a corrupt manifest must be
    # a typed error, not a multi-GB np.zeros), and reject non-integers
    dims = {k: meta.get(k) for k in
            ("n_centroids", "dim", "m_subspaces", "n_codes", "sub_dim")}
    for k, v in dims.items():
        if not isinstance(v, int) or not (0 < v <= 1 << 20):
            raise ValueError(
                f"ANN index at {path} declares implausible {k}={v!r}"
            )
    # the PRODUCTS must be bounded too (round-16 ADVICE: each field at
    # 2^20 individually still allows an 8 TB np.zeros — e.g.
    # n_centroids=dim=2^20); 2^27 doubles = 1 GiB per array, orders of
    # magnitude past any real quantizer (a few hundred KB) while never
    # rejecting one
    if (
        dims["n_centroids"] * dims["dim"] > 1 << 27
        or dims["m_subspaces"] * dims["n_codes"] * dims["sub_dim"] > 1 << 27
    ):
        raise ValueError(
            f"ANN index at {path} declares implausible quantizer sizes "
            f"(n_centroids*dim={dims['n_centroids'] * dims['dim']}, "
            f"codebook elements="
            f"{dims['m_subspaces'] * dims['n_codes'] * dims['sub_dim']})"
        )
    rows = spark.read.parquet(os.path.join(path, "quantizers")).collect()
    C = np.zeros((meta["n_centroids"], meta["dim"]), dtype="float64")
    codebooks = np.zeros(
        (meta["m_subspaces"], meta["n_codes"], meta["sub_dim"]), dtype="float64"
    )
    seen_c, seen_k = 0, 0
    for r in rows:
        # explicit bounds: a corrupt quantizer row with a negative index
        # would WRAP via numpy indexing and silently misplace a codeword
        # while the count cross-check still balanced (round-16 sweep)
        if r["kind"] == "centroid":
            if not (0 <= r["i"] < C.shape[0]) or len(r["vec"]) != C.shape[1]:
                raise ValueError(
                    f"ANN index at {path} has a corrupt centroid row "
                    f"(i={r['i']}, len={len(r['vec'])})"
                )
            C[r["i"]] = r["vec"]
            seen_c += 1
        else:
            if (
                not (0 <= r["i"] < codebooks.shape[0])
                or not (0 <= r["j"] < codebooks.shape[1])
                or len(r["vec"]) != codebooks.shape[2]
            ):
                raise ValueError(
                    f"ANN index at {path} has a corrupt code row "
                    f"(m={r['i']}, j={r['j']}, len={len(r['vec'])})"
                )
            codebooks[r["i"], r["j"]] = r["vec"]
            seen_k += 1
    if seen_c != meta["n_centroids"] or seen_k != (
        meta["m_subspaces"] * meta["n_codes"]
    ):
        raise ValueError(
            f"ANN index at {path} is torn: {seen_c} centroid rows / "
            f"{seen_k} code rows vs declared {meta['n_centroids']} / "
            f"{meta['m_subspaces'] * meta['n_codes']}"
        )
    return {"centroids": C, "codebooks": codebooks, "meta": meta}


#: on-disk format version of the ENCODED-VECTOR store (quantizers + the
#: corpus's (vec_id, cell, codes, vec) rows in versioned batch partitions)
_STORE_VERSION = 1


def encode_vectors(
    df: DataFrame,
    ann_index: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ-encode ``df`` against ALREADY-TRAINED quantizers: one
    zero-shuffle mapInPandas pass over ``df`` ONLY (no corpus scan, no
    training) producing the at-rest record ``(vec_id, cell, codes,
    vec)`` — the 4-byte cell + m-byte codes power the ADC scan, the
    double-cast vector column is touched only for the exact re-score of
    a broadcast shortlist (parquet column pruning keeps it off the scan
    path)."""
    spark = df.sparkSession
    bC = spark.sparkContext.broadcast(ann_index["centroids"])
    bCB = spark.sparkContext.broadcast(ann_index["codebooks"])

    def enc(it):
        Cl, CB = bC.value, bCB.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            cells, codes = _assign_encode_np(mat, Cl, CB)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells.astype("int32"),
                    "codes": list(codes),
                    "vec": [list(map(float, v)) for v in mat],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        enc, "vec_id long, cell int, codes array<int>, vec array<double>"
    )


def save_vector_store(
    corpus_df: DataFrame,
    path: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 16,
    train_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    layout: str = "objects",
) -> dict:
    """Train IVF-PQ quantizers on ``corpus_df`` and persist a FULL
    vector store: the quantizer sidecar (:func:`save_ann_index`) plus
    the corpus encoded at rest under ``path/vectors/batch=0``.  New
    crawl batches then land via :func:`append_vectors` with ZERO
    training jobs, and :func:`vector_store_topk` queries base ∪ appends
    without ever re-encoding — the symmetric closure of q156's
    incremental-dedup signature store (round-12 verdict item 4).
    Returns the loaded quantizer dict.

    ``layout``: ``"objects"`` (the default since round 17 — rename-free
    immutable object dirs listed by the manifest, the shape an object
    store wants; see STORES.md) or ``"slots"`` (rename-based
    ``batch=N``, still fully supported for existing manifests; appends,
    deletes, reads, and compaction follow the manifest's layout
    automatically)."""
    import uuid

    from palletjack_spark.functions import store as S

    if layout not in ("slots", "objects"):
        raise ValueError(f"unknown vector store layout {layout!r}")
    spark = corpus_df.sparkSession
    idx = save_ann_index(
        corpus_df,
        path,
        n_centroids=n_centroids,
        m_subspaces=m_subspaces,
        n_codes=n_codes,
        train_rows=train_rows,
        id_col=id_col,
        vec_col=vec_col,
    )
    encoded = encode_vectors(corpus_df, idx, id_col, vec_col)
    if layout == "objects":
        rel = f"obj-{uuid.uuid4().hex}"
        batch_dir = os.path.join(path, "vectors", rel)
        encoded.write.mode("overwrite").parquet(batch_dir)
    else:
        batch_dir = S.write_batch(encoded, path, "vectors", 0)
    n = spark.read.parquet(batch_dir).count()
    meta = dict(idx["meta"])
    meta.update(
        {
            "store_version": _STORE_VERSION,
            "n_batches": 1,
            "n_vectors": [int(n)],
            "id_col": id_col,
            "vec_col": vec_col,
            "layout": layout,
        }
    )
    if layout == "objects":
        meta["objects"] = {"vectors": [rel]}
    S.commit_manifest(path, _ANN_META_NAME, meta)
    idx["meta"] = meta
    return idx


def _store_meta(path: str) -> dict:
    import json

    with open(os.path.join(path, _ANN_META_NAME)) as f:
        meta = json.load(f)
    if "store_version" not in meta:
        raise ValueError(
            f"{path} holds a quantizer-only ANN sidecar, not a vector "
            "store (save_vector_store writes the encoded corpus too)"
        )
    if meta["store_version"] != _STORE_VERSION:
        raise ValueError(
            f"unsupported vector store version {meta['store_version']} at "
            f"{path} (supported: {_STORE_VERSION})"
        )
    return meta


def append_vectors(
    new_df: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str | None = None,
    epoch: str | None = None,
) -> int:
    """Append a new batch of vectors to a persisted store: assign +
    encode against the PERSISTED codebooks (zero training jobs — no
    corpus sample, no k-means; the poisoned-trainer test pins it), land
    the rows under ``path/vectors/batch=N``, then commit the manifest.

    The manifest commit (atomic rename) is the publication point: a
    crash after the batch write but before it leaves an orphan directory
    that every reader IGNORES (queries filter ``batch <
    manifest.n_batches``), and the next append overwrites it.  Column
    names must match the manifest (the q92g/q156 param-mismatch
    discipline: a store queried under different columns is a silent
    wrong answer, so it hard-errors instead).  Single-writer appends,
    like the q156 signature store.  Returns the appended row count.

    ``epoch``: the shared at-least-once-replay guard
    (:func:`palletjack_spark.functions.store.epoch_seen`, round 14) —
    an append whose caller-unique epoch the manifest already records is
    a no-op returning 0, so a retried streaming micro-batch can't
    publish its vectors twice.  Full store invariants: STORES.md."""

    spark = new_df.sparkSession
    meta = _store_meta(path)
    from palletjack_spark.functions import store as S

    id_col = id_col or meta["id_col"]
    vec_col = vec_col or meta["vec_col"]
    if id_col != meta["id_col"] or vec_col != meta["vec_col"]:
        raise ValueError(
            f"vector store at {path} was built with columns "
            f"({meta['id_col']!r}, {meta['vec_col']!r}); append asked for "
            f"({id_col!r}, {vec_col!r})"
        )
    idx = load_ann_index(spark, path)
    row = new_df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if row and row[0]["d"] != idx["centroids"].shape[1]:
        raise ValueError(
            f"vector store at {path} holds "
            f"{idx['centroids'].shape[1]}-dim vectors; batch "
            f"'{vec_col}' is {row[0]['d']}-dim"
        )
    # replay check AFTER the column/dimension validation (round-15
    # ADVICE): a replayed micro-batch with mismatched columns or dims is
    # a caller misconfiguration and must hard-error like the first call,
    # not silently no-op just because the epoch happens to be recorded.
    if S.epoch_seen(meta, epoch):
        return 0  # replayed epoch: the batch is already published
    encoded = encode_vectors(new_df, idx, id_col, vec_col)
    if meta.get("layout") == "objects":
        # the rename-free path is also the single-writer path: an
        # uncontended fenced commit is one attempt
        encoded.persist()
        try:
            n = int(encoded.count())

            def bump(m: dict, _slot: int) -> None:
                m["n_vectors"] = list(m.get("n_vectors", [])) + [n]

            S.cas_append_objects(
                {"vectors": encoded}, path, _ANN_META_NAME, bump, epoch=epoch
            )
            return n
        finally:
            encoded.unpersist()
    batch = int(meta["n_batches"])
    batch_dir = S.write_batch(encoded, path, "vectors", batch)
    n = spark.read.parquet(batch_dir).count()
    meta["n_batches"] = batch + 1
    meta["n_vectors"] = list(meta.get("n_vectors", [])) + [int(n)]
    S.record_epoch(meta, epoch)
    S.commit_manifest(path, _ANN_META_NAME, meta)
    return int(n)


def append_vectors_concurrent(
    new_df: DataFrame,
    path: str,
    id_col: str | None = None,
    vec_col: str | None = None,
    claims=None,
    epoch: str | None = None,
) -> int:
    """Multi-writer :func:`append_vectors` (round-14, closing the r13
    gap: CAS appends were wired to the signature store only — parallel
    crawl-ingest jobs encoding into ONE vector store still raced the
    single-writer manifest and could silently lose a batch).  Encoding
    still uses the PERSISTED codebooks (zero training jobs); the slot
    claim / nonce-ownership / manifest-CAS protocol is
    :func:`palletjack_spark.functions.store.cas_append`.  The
    single-writer :func:`append_vectors` stays the default (one fewer
    filesystem round-trip); use this from parallel ingest drivers.
    Returns the slot the batch published as, or ``-1`` when
    ``epoch`` was already recorded (a replayed micro-batch — nothing
    published)."""
    from palletjack_spark.functions import store as S

    spark = new_df.sparkSession
    meta0 = _store_meta(path)
    id_col = id_col or meta0["id_col"]
    vec_col = vec_col or meta0["vec_col"]
    if id_col != meta0["id_col"] or vec_col != meta0["vec_col"]:
        raise ValueError(
            f"vector store at {path} was built with columns "
            f"({meta0['id_col']!r}, {meta0['vec_col']!r}); append asked "
            f"for ({id_col!r}, {vec_col!r})"
        )
    idx = load_ann_index(spark, path)
    row = new_df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if row and row[0]["d"] != idx["centroids"].shape[1]:
        raise ValueError(
            f"vector store at {path} holds "
            f"{idx['centroids'].shape[1]}-dim vectors; batch "
            f"'{vec_col}' is {row[0]['d']}-dim"
        )
    encoded = encode_vectors(new_df, idx, id_col, vec_col)
    encoded.persist()
    try:
        n_rows = int(encoded.count())

        def bump(m: dict, _slot: int) -> None:
            # slots are claim-serialized (or fence-serialized under the
            # object layout), so by the n_batches invariant
            # _slot == len(n_vectors) when this runs under the claim
            m["n_vectors"] = list(m.get("n_vectors", [])) + [n_rows]

        if meta0.get("layout") == "objects":
            return S.cas_append_objects(
                {"vectors": encoded},
                path,
                _ANN_META_NAME,
                bump,
                claims=claims,
                epoch=epoch,
            )
        return S.cas_append(
            encoded,
            path,
            _ANN_META_NAME,
            "vectors",
            bump,
            claims=claims,
            epoch=epoch,
        )
    finally:
        encoded.unpersist()


def delete_vectors(ids_df: DataFrame, path: str, id_col: str | None = None) -> int:
    """Tombstone vectors in a persisted store — the GDPR/takedown shape:
    the data pages holding the vectors are NEVER rewritten (at 100 TB a
    delete that rewrites batches is an outage); instead the ids land
    under ``path/tombstones/batch=K`` and the manifest commit publishes
    them atomically (the same orphan-invisible contract as
    :func:`append_vectors`).  Queries anti-join the published tombstones
    (broadcast — delete sets are small relative to the corpus; a
    delete set that ISN'T belongs in :func:`compact_vector_store`).
    Deleting an id absent from the store is a no-op by construction.
    Returns the number of tombstone ids written."""

    spark = ids_df.sparkSession
    meta = _store_meta(path)
    id_col = id_col or meta["id_col"]
    if id_col != meta["id_col"]:
        raise ValueError(
            f"vector store at {path} keys on {meta['id_col']!r}; delete "
            f"asked for {id_col!r}"
        )
    from palletjack_spark.functions import store as S

    tomb = ids_df.select(
        F.col(id_col).cast("long").alias("vec_id")
    ).distinct()
    if meta.get("layout") == "objects":
        tomb.persist()
        try:
            n = int(tomb.count())
            S.cas_append_objects(
                {"tombstones": tomb},
                path,
                _ANN_META_NAME,
                lambda _m, _slot: None,
                counter_key="n_tombstone_batches",
            )
            return n
        finally:
            tomb.unpersist()
    batch = int(meta.get("n_tombstone_batches", 0))
    out_dir = S.write_batch(tomb, path, "tombstones", batch)
    n = spark.read.parquet(out_dir).count()
    meta["n_tombstone_batches"] = batch + 1
    S.commit_manifest(path, _ANN_META_NAME, meta)
    return int(n)


def _store_vectors(spark, path: str, meta: dict) -> DataFrame:
    """The store's LIVE rows: published vector batches minus published
    tombstones (broadcast LEFT ANTI — the wide ``vec`` column never
    shuffles; orphan batches of either kind are partition-pruned out)."""
    from palletjack_spark.functions import store as S

    if meta.get("layout") == "objects":
        vectors = S.live_object_batches(spark, path, "vectors", meta)
        tombs = S.live_object_batches(spark, path, "tombstones", meta)
        if tombs is not None:
            vectors = vectors.join(
                F.broadcast(tombs.select("vec_id")), "vec_id", "left_anti"
            )
        return vectors
    vectors = S.live_batches(spark, path, "vectors", meta["n_batches"])
    n_tomb = int(meta.get("n_tombstone_batches", 0))
    if n_tomb > 0:
        tombs = S.live_batches(spark, path, "tombstones", n_tomb).select(
            "vec_id"
        )
        vectors = vectors.join(F.broadcast(tombs), "vec_id", "left_anti")
    return vectors


def compact_vector_store(spark, path: str) -> dict:
    """Physically drop tombstoned rows: rewrite the LIVE rows as a fresh
    ``batch=0`` under a temp directory, atomically swap it in
    (``os.replace`` of the vectors/tombstones dirs), and reset the
    manifest to one batch / zero tombstones.  Quantizers are untouched —
    codes stay valid because compaction never re-encodes.  Run it when
    the tombstone set has grown past broadcast comfort; between
    compactions deletes stay O(tombstones).  Single-writer, like
    append.  Returns the updated manifest."""
    import shutil

    from palletjack_spark.functions import store as S

    meta = _store_meta(path)
    live = _store_vectors(spark, path, meta).select(
        "vec_id", "cell", "codes", "vec"
    )

    def finalize(staged: dict) -> dict:
        # count the STAGED parquet (cheap metadata-ish scan of what was
        # just written) instead of executing the live-rows anti-join
        # plan a second time
        n = spark.read.parquet(staged["vectors"]).count()
        meta.update(
            {
                "n_batches": 1,
                "n_vectors": [int(n)],
                "n_tombstone_batches": 0,
            }
        )
        return meta

    if meta.get("layout") == "objects":
        meta.setdefault("objects", {}).pop("tombstones", None)
        out = S.compact_objects(
            path, _ANN_META_NAME, meta, {"vectors": live},
            finalize_meta=finalize,
        )
    else:
        out = S.compact_swap(
            path, _ANN_META_NAME, meta, {"vectors": live},
            finalize_meta=finalize,
        )
    shutil.rmtree(os.path.join(path, "tombstones"), ignore_errors=True)
    return out


def vector_store_topk(
    spark,
    path: str,
    queries_df: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    shortlist: int = 64,
    exclude_self: bool = True,
    filter_df: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k over a persisted vector store, across base ∪ all
    PUBLISHED appends.  The query plan is ivf_pq_topk's minus the
    encode pass — the codes already sit at rest, so the first corpus
    touch IS the ADC scan: one zero-shuffle mapInPandas over
    ``(vec_id, cell, codes)`` (parquet column pruning keeps the wide
    ``vec`` column off this scan), a rank-window shortlist, and an
    exact re-score joining the shortlist back to the store's vectors.
    Batch partitions beyond the manifest's ``n_batches`` (orphans from
    a crashed append) are filtered out by partition pruning, and
    published tombstones (:func:`delete_vectors`) are anti-joined out
    broadcast-side before anything is scored.

    ``filter_df`` (one column of allowed vec ids) makes the query a
    FILTERED vector search with PRE-filter semantics — the q92h
    production-correct choice: the semi-join lands on the narrow
    (vec_id, cell, codes) rows BEFORE the ADC scan, so top-k is exact
    under the filter and never loses recall to post-filtering.  The
    codes stay at rest and no re-encode/re-train happens; cells are
    filter-agnostic, only the scanned rows shrink.  Wrap the filter in
    ``F.broadcast(...)`` when it is known-small; left unhinted, AQE
    picks the strategy from its actual size."""
    meta = _store_meta(path)
    idx = load_ann_index(spark, path)
    vectors = _store_vectors(spark, path, meta)
    codes_df = vectors.select("vec_id", "cell", "codes")
    if filter_df is not None:
        fcol = filter_df.columns[0]
        codes_df = codes_df.join(
            filter_df.select(F.col(fcol).alias("vec_id")),
            "vec_id",
            "leftsemi",
        )
    short, qids, qmat = _adc_shortlist(
        spark,
        codes_df,
        queries_df,
        idx["centroids"],
        idx["codebooks"],
        n_probes,
        shortlist,
        meta["id_col"],
        meta["vec_col"],
    )
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in zip(qids, qmat)],
        "query_id long, qvec array<double>",
    )
    cand = (
        vectors.select("vec_id", F.col("vec").alias("_v"))
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "vec_id", F.col("_v").alias("vec"), "qvec")
    )
    return _exact_rescore_topk(cand, k, exclude_self)


def _assign_encode_np(
    mat: np.ndarray, C: np.ndarray, codebooks: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Shared numpy core of IVF-PQ encoding: normalize, assign each row
    its nearest coarse cell (cosine), PQ-encode the residual per
    subspace.  Returns ``(cells, codes)``."""
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cells = (mat @ C.T).argmax(axis=1)
    sub = codebooks.shape[2]
    r = mat - C[cells]
    codes = np.empty((len(mat), codebooks.shape[0]), dtype="int32")
    for m in range(codebooks.shape[0]):
        blk = r[:, m * sub : (m + 1) * sub]
        d2 = ((blk[:, None, :] - codebooks[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = d2.argmin(axis=1)
    return cells, codes


def _adc_shortlist(
    spark,
    corpus_codes: DataFrame,
    queries_df: DataFrame,
    C: np.ndarray,
    codebooks: np.ndarray,
    n_probes: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
):
    """The query side of IVF-ADC, shared by :func:`ivf_pq_topk` and
    :func:`vector_store_topk`: collect the bounded query set, build the
    per-query ADC lookup tables and probed-cell masks, scan the
    ``(vec_id, cell, codes)`` rows zero-shuffle, and rank a per-query
    shortlist.  Returns ``(short_df, qids, qmat)`` — the shortlist ids
    plus the query vectors for the caller's exact re-score."""
    n_centroids = C.shape[0]
    m_subspaces, _n_codes, sub = codebooks.shape
    qids, qmat, qnorm = _collect_queries(queries_df, id_col, vec_col)
    qn = qmat / qnorm[:, None]
    probe_cells = np.argsort(-(qn @ C.T), axis=1)[:, :n_probes]  # (Q, P)
    # ADC tables over the residual codebooks + per-(query, cell) base term
    T = np.einsum("qms,mjs->qmj", qn.reshape(len(qn), m_subspaces, sub), codebooks)
    base = qn @ C.T  # (Q, ncells)
    probed = np.zeros((len(qids), n_centroids), dtype=bool)
    for qi in range(len(qids)):
        probed[qi, probe_cells[qi]] = True
    bT = spark.sparkContext.broadcast(T)
    bbase = spark.sparkContext.broadcast(base)
    bprobed = spark.sparkContext.broadcast(probed)
    bqids = spark.sparkContext.broadcast(qids)

    def adc_scan(it):
        Tl, basel, probedl, qi = bT.value, bbase.value, bprobed.value, bqids.value
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (B, M)
            cells = pdf["cell"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for q in range(len(qi)):
                mask = probedl[q][cells]
                if not mask.any():
                    continue
                c, cd, i = cells[mask], codes[mask], ids[mask]
                scores = basel[q][c] + Tl[q][
                    np.arange(cd.shape[1]), cd
                ].sum(axis=1)
                keep = min(shortlist, len(scores))
                top = np.argpartition(-scores, keep - 1)[:keep]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qi[q],
                            "vec_id": i[top],
                            "approx_ip": scores[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    partial = corpus_codes.mapInPandas(
        adc_scan, "query_id long, vec_id long, approx_ip double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_ip"), F.asc("vec_id"))
    short = (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= shortlist)
        .select("query_id", "vec_id")
    )
    return short, qids, qmat


def ivf_pq_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 16,
    shortlist: int = 64,
    train_rows: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    ann_index: dict | None = None,
) -> DataFrame:
    """IVF-PQ: the production ANN shape at 100 TB (round-5 verdict item
    8) — ``ivf_topk``'s deterministic coarse cells composed with
    ``pq_topk``'s ADC code scan, on RESIDUALS (Jégou et al., PAMI 2011
    §IV: quantize ``x − c(x)``, the classic IVF-ADC decomposition).

    Plan shape: ONE zero-shuffle mapInPandas pass assigns each corpus
    vector its nearest coarse cell and PQ-encodes the residual, so the
    stored record is (vec_id, cell, m small ints) — the vector itself is
    never shuffled and never re-read until the final exact re-score of a
    broadcast shortlist.  The ADC scan is a second zero-shuffle pass that
    scores a candidate only when its cell is probed by some query:
    ``score(q, x) ≈ q·c(x) + Σ_m T[q][m][code_m]`` where the first term
    is a per-(query, cell) scalar and the lookup tables are broadcast.
    Cells cut the scanned fraction to ~n_probes/n_centroids; codes cut
    the bytes per scanned row ~64×; both multiply.

    ``n_probes == n_centroids`` with ``shortlist ≥ corpus`` degenerates
    to exact brute force (every cell probed, every candidate kept, exact
    re-score) — the registered driver query runs there so the whole
    pipeline is hash-checkable; realistic settings are recall-tested in
    tests/test_llm.py.  Determinism: id-ordered bounded training sample,
    fixed-init k-means for both quantizers.

    ``ann_index`` (from :func:`load_ann_index`) supplies pre-trained
    coarse centroids + residual codebooks and skips training entirely —
    the build-once/read-many contract (round-6 verdict item 7): at
    100 TB the quantizers are a versioned sidecar artifact, not a
    per-query recompute."""
    spark = corpus_df.sparkSession
    if ann_index is not None:
        C = ann_index["centroids"]
        codebooks = ann_index["codebooks"]
        if len(C) != n_centroids or codebooks.shape[:2] != (m_subspaces, n_codes):
            raise ValueError(
                "ann_index shape mismatch: index has "
                f"{len(C)} centroids / {codebooks.shape[0]}x"
                f"{codebooks.shape[1]} codebooks, query asked for "
                f"{n_centroids} / {m_subspaces}x{n_codes}"
            )
        # dimension check (round-7 review): a sidecar trained on
        # different-dim embeddings passes the count checks above and
        # would otherwise die as an opaque executor-side numpy shape
        # error inside assign_encode.  One bounded 1-row job.
        row = corpus_df.select(F.size(vec_col).alias("d")).limit(1).collect()
        if row and row[0]["d"] != C.shape[1]:
            raise ValueError(
                f"ann_index dimension mismatch: index trained on "
                f"{C.shape[1]}-dim vectors, corpus '{vec_col}' is "
                f"{row[0]['d']}-dim"
            )
    else:
        C, codebooks = _train_ivf_pq(
            corpus_df,
            n_centroids=n_centroids,
            m_subspaces=m_subspaces,
            n_codes=n_codes,
            train_rows=train_rows,
            id_col=id_col,
            vec_col=vec_col,
        )
    bC = spark.sparkContext.broadcast(C)
    bCB = spark.sparkContext.broadcast(codebooks)

    def assign_encode(it):
        Cl, CB = bC.value, bCB.value
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(v, dtype="float64") for v in pdf[vec_col]])
            cells, codes = _assign_encode_np(mat, Cl, CB)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cell": cells.astype("int32"),
                    "codes": list(codes),
                }
            )

    corpus_codes = corpus_df.select(id_col, vec_col).mapInPandas(
        assign_encode, "vec_id long, cell int, codes array<int>"
    )

    short, qids, qmat = _adc_shortlist(
        spark, corpus_codes, queries_df, C, codebooks, n_probes, shortlist,
        id_col, vec_col,
    )
    qvecs = spark.createDataFrame(
        [(int(qid), [float(x) for x in vec]) for qid, vec in zip(qids, qmat)],
        "query_id long, qvec array<double>",
    )
    cand = (
        corpus_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
        .join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.transform("_v", lambda x: x.cast("double")).alias("vec"),
            "qvec",
        )
    )
    return _exact_rescore_topk(cand, k, exclude_self)


def contrastive_pairs(
    corpus_df: DataFrame,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive pair mining: per anchor, the nearest SAME-label vector
    (positive) and the nearest OTHER-label vector (hard negative) by
    cosine — the (anchor, positive, hard-negative) triplets embedding-
    model training consumes.

    Same blocked all-pairs GEMM as :func:`nn_graph` (labels ride along;
    each block-pair task computes two masked argmaxes instead of one),
    so shuffle volume stays n_blocks × corpus and the n² compute spreads
    over B(B+1)/2 independent tasks.  Cosines round to 4 decimals BEFORE
    ranking so the min-id tie-break matches the oracle's ORDER BY.
    Anchors lacking a positive (singleton label) or a negative (single
    label corpus) are dropped — a triplet needs both sides.
    """
    B = n_blocks
    base = corpus_df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.col(label_col).alias("lbl"),
    ).withColumn("blk", F.pmod("vec_id", F.lit(B)).cast("int"))
    exploded = base.select(
        "vec_id",
        "vec",
        "lbl",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("other"),
    ).select(
        "vec_id",
        "vec",
        "lbl",
        "blk",
        F.least("blk", "other").alias("gi"),
        F.greatest("blk", "other").alias("gj"),
    )

    def best_in_group(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        ids = pdf["vec_id"].to_numpy()
        lbls = pdf["lbl"].to_numpy()
        mat = np.stack([np.asarray(v, dtype="float64") for v in pdf["vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        sides = []
        if gi == gj:
            m = (pdf["blk"] == gi).to_numpy()
            sides.append((m, m))
        else:
            a = (pdf["blk"] == gi).to_numpy()
            b = (pdf["blk"] == gj).to_numpy()
            sides.append((a, b))
            sides.append((b, a))
        frames = []
        for qm, cm in sides:
            qi, ci = ids[qm], ids[cm]
            if len(qi) == 0 or len(ci) == 0:
                continue
            S = np.round(mat[qm] @ mat[cm].T, 4)
            S[qi[:, None] == ci[None, :]] = -np.inf
            same = lbls[qm][:, None] == lbls[cm][None, :]
            for kind, mask in (("pos", same), ("neg", ~same)):
                M = np.where(mask, S, -np.inf)
                best = M.max(axis=1)
                keep = best > -np.inf
                if not keep.any():
                    continue
                cand = np.where(
                    M == best[:, None], ci[None, :], np.iinfo("int64").max
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": qi[keep],
                            "kind": kind,
                            "cand_id": cand.min(axis=1)[keep],
                            "cosine": best[keep],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"vec_id": [], "kind": [], "cand_id": [], "cosine": []}
            )
        return pd.concat(frames, ignore_index=True)

    cands = exploded.groupBy("gi", "gj").applyInPandas(
        best_in_group, "vec_id long, kind string, cand_id long, cosine double"
    )
    w = Window.partitionBy("vec_id", "kind").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    best = (
        cands.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    pos = best.where(F.col("kind") == "pos").select(
        "vec_id",
        F.col("cand_id").alias("pos_id"),
        F.col("cosine").alias("pos_cos"),
    )
    neg = best.where(F.col("kind") == "neg").select(
        "vec_id",
        F.col("cand_id").alias("neg_id"),
        F.col("cosine").alias("neg_cos"),
    )
    return pos.join(neg, "vec_id")


def kmeans_converge(
    spark: SparkSession,
    qv: DataFrame,
    k: int = 8,
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """Run Q129's grid-quantized Lloyd's iteration to a data-dependent
    fixpoint: update centroids and reassign until NO vector changes
    cluster (or the round budget runs out).  Returns
    ``(assignments, rounds_run)`` where ``rounds_run`` counts centroid
    updates — the returned assignment is against the ``rounds_run``-th
    updated centroids, i.e. ``m{rounds_run + 1}`` in the unrolled-CTE
    numbering of ``queries.llm_ops._km_round_sql``.

    ``qv`` must carry (vec_id, qv: array<bigint>) — the grid-quantized
    shape q129 builds.  Each round is the same broadcast-centroids
    assignment + bounded k×d driver-side update as the declared 1-round
    q129, with assignments localCheckpointed; the stop test is one
    changed-assignment count per round.  Integer Lloyd's converges on
    real corpora in a handful of rounds (cost is non-increasing up to
    centroid-truncation noise), but truncation CAN in principle cycle —
    callers wanting a hard guarantee pass ``max_rounds``."""
    from palletjack_spark.queries.llm_ops import _km_assign, _km_update

    init = qv.where(F.col("vec_id") < k).orderBy("vec_id").collect()
    centroids = [(int(r["vec_id"]), list(r["qv"])) for r in init]
    assign = _km_assign(spark, qv, centroids).localCheckpoint()
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        centroids = _km_update(assign, qv)
        nxt = _km_assign(spark, qv, centroids).localCheckpoint()
        rounds += 1
        changed = (
            nxt.select("vec_id", F.col("cid").alias("c_new"))
            .join(assign, "vec_id")
            .where(F.col("c_new") != F.col("cid"))
            .count()
        )
        assign = nxt
        if changed == 0:
            return assign, rounds
    return assign, rounds


# --------------------------------------------------------------------------
# SQ8 scalar quantization (Q92j)
# --------------------------------------------------------------------------


def sq8_scales(
    corpus_df: DataFrame, vec_col: str, dim: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (lo, hi) over the corpus — ONE JVM-side aggregate
    (2×dim codegen'd min/max expressions, map-side combined, one-row
    result), the q129 deterministic-grid discipline: the quantizer is a
    pure function of the corpus, no sampling, no RNG."""
    aggs = [
        F.min(F.get(F.col(vec_col), i)).alias(f"lo{i}") for i in range(dim)
    ] + [F.max(F.get(F.col(vec_col), i)).alias(f"hi{i}") for i in range(dim)]
    row = corpus_df.agg(*aggs).first()
    lo = np.array([row[f"lo{i}"] for i in range(dim)], dtype="float64")
    hi = np.array([row[f"hi{i}"] for i in range(dim)], dtype="float64")
    return lo, hi


def _sq8_encode(mat: np.ndarray, lo: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """uint8 codes: floor((v - lo) * scale), clipped to [0, 255] — FLOOR,
    not round-half (the cross-engine quantization rule), though here both
    engines never see the codes: stage 2 re-ranks in full float."""
    return np.clip(np.floor((mat - lo[None, :]) * scale[None, :]), 0, 255).astype(
        "int32"
    )


def sq8_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    shortlist: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    scan_dims: int | None = None,
    n_centroids: int | None = None,
    n_probes: int | None = None,
    train_rows: int = 512,
) -> DataFrame:
    """ANN top-k via SQ8 scalar quantization + exact re-rank (Q92j) —
    the most common production ANN memory tier: int8 per dimension, 4×
    less scan bandwidth than float32, sitting between q92's full-float
    GEMM and q92e's PQ codes (and composing with q92i's Matryoshka
    truncation: quantize the truncated prefix for a 4×·ratio saving).

    Stage 1 is the SQ8 scan: per-dim (lo, hi) from :func:`sq8_scales`
    broadcast to every task, corpus rows quantized batch-locally to
    uint8 codes (the 4× bandwidth tier — at rest the codes column IS
    the stored form), then scored the FAISS-SQ way: dequantize
    ``code / scale + lo`` and cosine against the dequantized queries —
    the proxy differs from true cosine only by quantization error, so
    small shortlists recall well (a raw integer code dot would be an
    affine-distorted, unnormalized proxy and rank garbage).  Per-batch
    top-``shortlist`` per query (a superset of the global top-shortlist
    under any batching, so the result is partitioning-independent),
    then one narrow global WindowGroupLimit.  Stage 2 joins the
    shortlist ids back to the full-float vectors and re-ranks exactly
    (:func:`_exact_rescore_topk`).

    With ``shortlist`` >= corpus size stage 1 keeps everything and the
    result is hash-identical to :func:`cosine_topk` — the driver
    entry's exactness pin; realistic shortlists are recall-tested in
    tests/test_llm.py.

    Compositions (round-12 verdict item 7, turning the docstring claims
    into contracts — both are pure stage-1 restrictions, so at
    exhaustive settings results stay hash-identical to brute force):

    - ``scan_dims=d`` composes SQ8 with q92i's Matryoshka truncation:
      stage 1 quantizes and scores only the FIRST ``d`` dimensions (a
      4×·(d/dim) combined bandwidth cut — int8 codes over the MRL
      prefix), stage 2 still re-ranks exactly in FULL float dims.
    - ``n_centroids=c`` (with ``n_probes=p``) composes SQ8 with q92d's
      IVF cells: deterministic spherical-kmeans cells (ivf_topk's
      training discipline — id-ordered sample, fixed init), and stage 1
      scores a row for a query only when its cell is among the query's
      ``p`` probed cells — the scan fraction drops to ~p/c on top of
      the 4× code tier.  ``p == c`` probes everything.
    """
    spark = corpus_df.sparkSession
    qids, qmat, _qnorm = _collect_queries(queries_df, id_col, vec_col)
    full_dim = qmat.shape[1]
    if scan_dims is not None and not (0 < scan_dims <= full_dim):
        raise ValueError(f"scan_dims {scan_dims} not in [1, {full_dim}]")
    dim = scan_dims if scan_dims is not None else full_dim
    if n_probes is not None and n_centroids is None:
        raise ValueError(
            "sq8_topk: n_probes without n_centroids does nothing — the "
            "IVF scan-fraction cut you asked for needs cells to probe "
            "(pass n_centroids too)"
        )
    C = probed = None
    if n_centroids is not None:
        sample = (
            corpus_df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(train_rows)
            .collect()
        )
        if not sample:
            raise ValueError(
                "sq8_topk: the corpus is empty — nothing to train cells on"
            )
        train = np.array([list(r[1]) for r in sample], dtype="float64")
        train = train / np.maximum(
            np.linalg.norm(train, axis=1, keepdims=True), 1e-12
        )
        C = _kmeans_cosine(train, n_centroids)
        p = n_probes if n_probes is not None else n_centroids
        qn_full = qmat / np.maximum(
            np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12
        )
        probe_cells = np.argsort(-(qn_full @ C.T), axis=1)[:, :p]
        probed = np.zeros((len(qids), n_centroids), dtype=bool)
        for qi in range(len(qids)):
            probed[qi, probe_cells[qi]] = True
    qmat_scan = qmat[:, :dim]
    lo, hi = sq8_scales(corpus_df, vec_col, dim)
    span = hi - lo
    scale = np.where(span > 0, 255.0 / np.where(span > 0, span, 1.0), 0.0)
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)

    def _deq(codes: np.ndarray) -> np.ndarray:
        return codes.astype("float64") * inv[None, :] + lo[None, :]

    qdeq = _deq(_sq8_encode(qmat_scan, lo, scale))
    qnorm = np.sqrt((qdeq * qdeq).sum(axis=1))
    qnorm[qnorm == 0] = 1.0
    blo = spark.sparkContext.broadcast(lo)
    bscale = spark.sparkContext.broadcast(scale)
    binv = spark.sparkContext.broadcast(inv)
    bqids = spark.sparkContext.broadcast(qids)
    bqdeq = spark.sparkContext.broadcast(qdeq / qnorm[:, None])
    bC = spark.sparkContext.broadcast(C)
    bprobed = spark.sparkContext.broadcast(probed)

    def scan(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            if len(ids) == 0:
                continue
            full = np.asarray(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            cells = None
            if bC.value is not None:
                fn = full / np.maximum(
                    np.linalg.norm(full, axis=1, keepdims=True), 1e-12
                )
                cells = (fn @ bC.value.T).argmax(axis=1)
            mat = full[:, : len(blo.value)]
            codes = _sq8_encode(mat, blo.value, bscale.value)
            deq = codes.astype("float64") * binv.value[None, :] + blo.value[None, :]
            norms = np.sqrt((deq * deq).sum(axis=1))
            norms[norms == 0] = 1.0
            scores = (deq @ bqdeq.value.T) / norms[:, None]
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(bqids.value):
                if cells is not None:
                    keep_rows = np.nonzero(bprobed.value[qi][cells])[0]
                    if len(keep_rows) == 0:
                        continue
                else:
                    keep_rows = np.arange(len(ids))
                col = scores[keep_rows, qi]
                n_keep = min(shortlist, len(keep_rows))
                if n_keep < len(keep_rows):
                    part = np.argpartition(-col, n_keep - 1)[:n_keep]
                else:
                    part = np.arange(len(keep_rows))
                out_q.append(np.full(len(part), qid, dtype="int64"))
                out_v.append(ids[keep_rows[part]])
                out_s.append(col[part])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "qscore": np.concatenate(out_s),
                }
            )

    batch_top = corpus_df.select(id_col, vec_col).mapInPandas(
        scan, "query_id long, vec_id long, qscore double"
    )
    if exclude_self:
        batch_top = batch_top.where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("vec_id")
    )
    cand_ids = (
        batch_top.select(
            "query_id", "vec_id", F.row_number().over(w).alias("pj_r")
        )
        .where(F.col("pj_r") <= shortlist)
        .select("query_id", "vec_id")
    )
    qvecs = queries_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # the shortlist (n_q × shortlist narrow rows) broadcasts into one
    # more scan of the corpus — the wide float vectors never shuffle
    cand = (
        corpus_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
        .join(F.broadcast(cand_ids), "vec_id")
        .join(F.broadcast(qvecs), "query_id")
    )
    return _exact_rescore_topk(cand, k, exclude_self)


def _jl_signs(out_dims: int, in_dims: int) -> list[list[int]]:
    """Deterministic ±1 JL sign matrix: entry (i, j) (1-based, matching
    the SQL oracle's generate_series) is +1 when the md5 bucket of
    ``"i:j"`` is even — a HASH, not a seeded RNG, so every engine can
    regenerate it from the formula alone (the q47 md5-parity
    discipline)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:15], 16) % 2
            == 0
            else -1
            for j in range(1, in_dims + 1)
        ]
        for i in range(1, out_dims + 1)
    ]


def jl_project(
    df: DataFrame,
    out_dims: int,
    in_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss projection to ``out_dims`` via the
    deterministic ±1 sign matrix (Achlioptas 2001: ±1 entries satisfy
    the JL lemma with the same distortion bounds as Gaussians, and cost
    only adds/subtracts).  Returns (id, vec_col) with the projected
    array<double>.

    Scale shape: the matrix is BAKED INTO the expression as a literal
    (out_dims × in_dims ints — ~1k entries at 64→16; at production
    1536→128 it is ~200k entries, still a compile-time constant far
    below broadcast thresholds), and the projection is one row-local
    nested transform/aggregate fold — JVM-side whole-stage codegen,
    ZERO exchanges, no UDF.  Each output component sums j-in-order,
    matching the oracle's per-group accumulation exactly."""
    signs = _jl_signs(out_dims, in_dims)
    rows = ",".join(
        "array(" + ",".join(f"{s}.0D" for s in row) + ")" for row in signs
    )
    proj = (
        f"transform(array({rows}),"
        f" r -> aggregate(zip_with(r, {vec_col},"
        f" (a, b) -> a * cast(b as double)),"
        f" 0.0D, (acc, x) -> acc + x))"
    )
    return df.select(F.col(id_col), F.expr(proj).alias(vec_col))


def jl_two_stage_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    shortlist: int = 30,
    out_dims: int = 16,
    in_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval with a JL-projected stage-1 scan (the q92i
    funnel with a projection ANY embedding supports — MRL truncation
    needs nested-trained embeddings, JL needs nothing): score the
    shortlist in ``out_dims`` (bytes/FLOPs drop by in/out), then
    re-rank ONLY the shortlist with exact full-dim cosine."""
    short = cosine_topk(
        jl_project(corpus_df, out_dims, in_dims, id_col, vec_col),
        jl_project(queries_df, out_dims, in_dims, id_col, vec_col),
        k=shortlist,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "vec_id")
    qe = queries_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    ce = corpus_df.select(id_col, F.col(vec_col).alias("ce"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = (
        dot(F.col("qe"), F.col("ce"))
        / F.sqrt(dot(F.col("ce"), F.col("ce")))
        / F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ce, id_col)
        .select("query_id", id_col, F.round(cos, 4).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), id_col)
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).where(F.col("rank") <= k)


def binary_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
) -> DataFrame:
    """1-bit binary quantization of centered embeddings: bit i = sign of
    component i, packed into two BIGINT halves (lo = dims 1-32, hi =
    33-``in_dims``) — 8 bytes per vector where float32 takes 256, the
    32× memory tier below q92j's SQ8.  Equivalent to ``in_dims``
    axis-aligned hyperplanes through the origin, so Hamming distance
    between codes estimates the angle (the simhash identity).  Packing
    is one row-local integer fold — JVM codegen, zero exchanges; two
    halves (not one 64-bit word) keep every partial sum far from BIGINT
    overflow in BOTH engines.

    ``in_dims`` must match the embedding width (round-12 ADVICE: the
    fold bounds were hardcoded at 64, which threw ARRAY_INDEX under
    ANSI for shorter vectors and silently truncated longer ones — now
    the bounds derive from the declared width, and >64 dims is a hard
    error rather than silent truncation; rotate/project down first)."""
    if not 1 <= in_dims <= 64:
        raise ValueError(
            f"binary_quantize packs at most 64 dims into two BIGINT "
            f"halves; got in_dims={in_dims} (JL-project or rotate down "
            f"to <=64 first)"
        )
    n_lo = min(32, in_dims)
    n_hi = in_dims - n_lo

    def half(lo_bit: int, n_bits: int) -> str:
        return (
            f"aggregate(sequence(1, {n_bits}), cast(0 as bigint),"
            f" (acc, i) -> acc + IF(element_at({vec_col}, i + {lo_bit}) > 0,"
            f" shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint)))"
        )

    return df.select(
        F.col(id_col),
        F.expr(half(0, n_lo)).alias("lo"),
        (
            F.expr(half(32, n_hi)) if n_hi > 0 else F.lit(0).cast("bigint")
        ).alias("hi"),
    )


def bq_two_stage_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    shortlist: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
) -> DataFrame:
    """Two-stage retrieval over binary codes (the Lucene/Elastic-style
    BQ funnel): stage 1 ranks by Hamming distance between 8-byte codes
    — pure integer ``bit_count(xor(...))``, bit-identical on every
    engine, no rounding discipline needed at all — and stage 2 re-ranks
    the shortlist with exact full-dim cosine.  Tie-break (ham ASC,
    id ASC) is total, so the shortlist is deterministic."""
    ccodes = binary_quantize(corpus_df, id_col, vec_col, in_dims)
    qcodes = binary_quantize(queries_df, id_col, vec_col, in_dims)
    return _hamming_two_stage(
        ccodes, qcodes, corpus_df, queries_df, k, shortlist, id_col, vec_col
    )


def _hamming_two_stage(
    ccodes: DataFrame,
    qcodes: DataFrame,
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared BQ funnel tail: Hamming stage-1 over (lo, hi) code pairs
    (broadcast query codes — pure integer ``bit_count(xor)``), total
    (ham ASC, id ASC) shortlist, exact full-dim cosine re-rank."""
    qcodes = qcodes.select(
        F.col(id_col).alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    ham = (
        ccodes.join(F.broadcast(qcodes))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            (
                F.bit_count(F.expr("lo ^ qlo"))
                + F.bit_count(F.expr("hi ^ qhi"))
            ).alias("ham"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ham"), F.asc(id_col))
    short = (
        ham.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= shortlist)
        .select("query_id", id_col)
    )
    qe = queries_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe")
    )
    ce = corpus_df.select(id_col, F.col(vec_col).alias("ce"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cos = (
        dot(F.col("qe"), F.col("ce"))
        / F.sqrt(dot(F.col("ce"), F.col("ce")))
        / F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    scored = (
        short.join(F.broadcast(qe), "query_id")
        .join(ce, id_col)
        .select("query_id", id_col, F.round(cos, 4).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), id_col)
    return scored.withColumn(
        "rank", F.row_number().over(w2).cast("int")
    ).where(F.col("rank") <= k)


def itq_rotation(
    corpus_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
    train_rows: int = 512,
    iters: int = 50,
) -> tuple[np.ndarray, np.ndarray]:
    """Learn the ITQ rotation (Gong & Lazebnik 2013, "Iterative
    Quantization") for binary codes: alternate the sign assignment
    ``B = sign(V R)`` with the orthogonal-Procrustes update
    ``R = U Vt`` of ``svd(V.T B)``, minimizing the quantization loss
    ``||B - V R||_F`` — the LEARNED rotation q92o's docstring names as
    the production upgrade over identity-rotation sign bits.

    Vectors wider than ``in_dims`` (the production shape: 768/1536-dim
    embeddings vs 64 code bits) PCA-project to the code width first —
    the full Gong-Lazebnik recipe — and the projection folds into the
    returned rotation, so encoding stays one centered matmul.  Measured
    on a 600×256 anisotropic synthetic (recall@10 at shortlist 30):
    sign(first 64 dims) 0.32, sign(PCA-64) 0.29, PCA-ITQ 0.66 — the
    rotation, not the projection, carries the lift.

    Deterministic, no RNG (the q129/q92g discipline): the train sample
    is the ``train_rows`` smallest ids (one bounded driver collect —
    the same cap contract as the PQ/IVF trainers), init is the
    identity, LAPACK's SVD is deterministic for a fixed input, and PCA
    component signs are canonicalized.  Returns ``(mu, R)``: the
    train-sample mean (codes quantize the CENTERED vectors — sign bits
    split mass at the data centroid, not at zero) and the
    column-orthonormal rotation (square at native width, d×in_dims
    when PCA folds in)."""
    if not 1 <= in_dims <= 64:
        # same gate as binary_quantize (round-14 ADVICE): itq_encode
        # packs bits into two BIGINT halves, so >64 code bits would
        # shift int64 by 63+ positions — numpy overflow plus silent bit
        # aliasing producing garbage Hamming codes, not a typed error.
        raise ValueError(
            f"itq_rotation learns at most 64 code bits (two BIGINT "
            f"halves); got in_dims={in_dims}"
        )
    rows = (
        corpus_df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_rows)
        .collect()
    )
    if not rows:
        raise ValueError(
            "itq_rotation: the train sample is empty — the corpus has no "
            "rows (or every row was filtered before training)"
        )
    V = np.array([list(r[1]) for r in rows], dtype=np.float64)
    if V.shape[1] < in_dims:
        raise ValueError(
            f"itq_rotation: vectors are {V.shape[1]}-dim, narrower than "
            f"the {in_dims} code bits"
        )
    mu = V.mean(axis=0)
    V = V - mu
    if V.shape[1] > in_dims:
        # production embeddings are wider than the code (768/1536 dims
        # vs 64 bits): the full Gong-Lazebnik recipe PCA-projects to
        # the code width FIRST, then learns the rotation in that
        # subspace.  Deterministic: covariance eigvecs via SVD of the
        # centered train sample, sign-canonicalized per component
        # (LAPACK's SVD is deterministic but column signs are an
        # arbitrary convention — pin them so retrains agree).
        _u, _s, Wt = np.linalg.svd(V, full_matrices=False)
        W = Wt[:in_dims].T  # (d, in_dims) top principal directions
        signs = np.sign(W[np.abs(W).argmax(axis=0), np.arange(in_dims)])
        signs[signs == 0] = 1.0
        W = W * signs
        V = V @ W
    else:
        W = np.eye(in_dims)
    R = np.eye(in_dims)
    for _ in range(iters):
        B = np.where(V @ R >= 0, 1.0, -1.0)
        U, _s, Vt = np.linalg.svd(V.T @ B)
        R = U @ Vt
    # encode is sign((x - mu) @ (W R)) — fold the PCA into the returned
    # rotation so itq_encode stays one centered matmul
    return mu, W @ R


def itq_encode(
    df: DataFrame,
    mu: np.ndarray,
    R: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Rotate-then-sign binary codes: ``sign((x - mu) R)`` packed into
    two BIGINT halves — one Arrow-batched mapInPandas (vectorized
    center + matmul + bit-pack per batch, zero exchanges); the rotation
    (d×bits floats — square for native-width inputs, rectangular when
    the rotation folds a PCA projection from wider embeddings) ships in
    the task closure like the PQ codebooks."""
    code_bits = R.shape[1]
    n_lo = min(32, code_bits)

    def enc(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Y = (X - mu) @ R
            bits = Y > 0
            lo = (
                bits[:, :n_lo]
                .astype(np.int64)
                .dot(1 << np.arange(n_lo, dtype=np.int64))
            )
            if code_bits > 32:
                hi = (
                    bits[:, 32:code_bits]
                    .astype(np.int64)
                    .dot(1 << np.arange(code_bits - 32, dtype=np.int64))
                )
            else:
                hi = np.zeros(len(pdf), dtype=np.int64)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "lo": lo, "hi": hi}
            )

    return df.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} long, lo long, hi long"
    )


#: on-disk format version of the persisted ITQ rotation sidecar
_ITQ_FORMAT_VERSION = 1
_ITQ_META_NAME = "_itq_meta.json"


def save_itq_rotation(
    corpus_df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
    train_rows: int = 512,
    iters: int = 50,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the ITQ rotation once and persist it as a versioned
    sidecar (round-13 verdict gap #4: q92g/q92k gave the PQ quantizers
    a build-once/read-many artifact, but itq_bq_topk re-trained its
    rotation EVERY invocation — the production BQ tier couldn't ship a
    frozen rotation).  Layout mirrors :func:`save_ann_index`:
    ``path/itq`` is a tiny parquet dataset of tagged rows —
    ``(kind='mu', i=0, vec)`` for the train-sample center and
    ``(kind='rot', i=row, vec)`` for the d×bits rotation — plus
    ``path/_itq_meta.json`` recording the format version, shapes and
    training params so a loader validates before trusting the artifact.
    The whole artifact is ``(d+1)·bits`` doubles — a few KB.  Returns
    the in-memory ``(mu, R)`` it persisted."""
    import json

    spark = corpus_df.sparkSession
    mu, R = itq_rotation(
        corpus_df, id_col, vec_col, in_dims, train_rows, iters
    )
    rows = [("mu", 0, [float(x) for x in mu])] + [
        ("rot", int(i), [float(x) for x in R[i]]) for i in range(R.shape[0])
    ]
    spark.createDataFrame(
        rows, "kind string, i int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "itq"))
    meta = {
        "format_version": _ITQ_FORMAT_VERSION,
        "dim": int(R.shape[0]),
        "code_bits": int(R.shape[1]),
        "in_dims": int(in_dims),
        "train_rows": int(train_rows),
        "iters": int(iters),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    tmp = os.path.join(path, _ITQ_META_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _ITQ_META_NAME))
    return mu, R


def load_itq_rotation(
    spark, path: str
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Load a persisted ITQ rotation written by
    :func:`save_itq_rotation` — ZERO training jobs (no corpus scan, no
    Procrustes iterations; the poisoned-trainer test pins it), one
    bounded collect of d+1 tiny rows.  Validates the format version and
    declared shapes (torn artifacts hard-error) before returning
    ``(mu, R, meta)``.  Doubles round-trip parquet exactly, so encoding
    with the loaded rotation is bit-identical to the in-memory one it
    was saved from."""
    import json

    with open(os.path.join(path, _ITQ_META_NAME)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _ITQ_FORMAT_VERSION:
        raise ValueError(
            f"unsupported ITQ sidecar format_version "
            f"{meta.get('format_version')} at {path} "
            f"(supported: {_ITQ_FORMAT_VERSION})"
        )
    d, bits = int(meta["dim"]), int(meta["code_bits"])
    mu = np.zeros(d, dtype="float64")
    R = np.zeros((d, bits), dtype="float64")
    seen_mu = seen_r = 0
    for r in spark.read.parquet(os.path.join(path, "itq")).collect():
        if r["kind"] == "mu":
            if len(r["vec"]) != d:
                raise ValueError(
                    f"ITQ sidecar at {path} is torn: mu is "
                    f"{len(r['vec'])}-dim vs declared {d}"
                )
            mu[:] = r["vec"]
            seen_mu += 1
        else:
            if len(r["vec"]) != bits:
                raise ValueError(
                    f"ITQ sidecar at {path} is torn: rotation row "
                    f"{r['i']} is {len(r['vec'])}-wide vs declared {bits}"
                )
            R[r["i"]] = r["vec"]
            seen_r += 1
    if seen_mu != 1 or seen_r != d:
        raise ValueError(
            f"ITQ sidecar at {path} is torn: {seen_mu} mu rows / "
            f"{seen_r} rotation rows vs declared 1 / {d}"
        )
    return mu, R, meta


def itq_bq_topk_store(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    path: str,
    k: int = 10,
    shortlist: int = 30,
    id_col: str | None = None,
    vec_col: str | None = None,
) -> DataFrame:
    """:func:`itq_bq_topk` over a FROZEN, persisted rotation: load the
    sidecar (zero training jobs), encode corpus and queries with the
    stored ``(mu, R)``, run the identical Hamming-shortlist /
    exact-re-rank funnel.  Column or dimension mismatches against the
    sidecar's manifest hard-error (the q92g param-mismatch discipline:
    a store queried under different semantics is a silent wrong
    answer)."""
    spark = corpus_df.sparkSession
    mu, R, meta = load_itq_rotation(spark, path)
    id_col = id_col or meta["id_col"]
    vec_col = vec_col or meta["vec_col"]
    if id_col != meta["id_col"] or vec_col != meta["vec_col"]:
        raise ValueError(
            f"ITQ sidecar at {path} was trained with columns "
            f"({meta['id_col']!r}, {meta['vec_col']!r}); query asked for "
            f"({id_col!r}, {vec_col!r})"
        )
    row = corpus_df.select(F.size(vec_col).alias("d")).limit(1).collect()
    if row and row[0]["d"] != int(meta["dim"]):
        raise ValueError(
            f"ITQ sidecar at {path} rotates {meta['dim']}-dim vectors; "
            f"corpus '{vec_col}' is {row[0]['d']}-dim"
        )
    ccodes = itq_encode(corpus_df, mu, R, id_col, vec_col)
    qcodes = itq_encode(queries_df, mu, R, id_col, vec_col)
    return _hamming_two_stage(
        ccodes, qcodes, corpus_df, queries_df, k, shortlist, id_col, vec_col
    )


def itq_bq_topk(
    corpus_df: DataFrame,
    queries_df: DataFrame,
    k: int = 10,
    shortlist: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dims: int = 64,
    train_rows: int = 512,
    iters: int = 50,
) -> DataFrame:
    """Two-stage retrieval over LEARNED-rotation binary codes (q92o's
    documented plug point, round 13): learn the ITQ rotation on a
    bounded corpus sample, encode corpus and queries with the SAME
    (mu, R), then run the identical Hamming-shortlist / exact-re-rank
    funnel as :func:`bq_two_stage_topk`.

    Measured recall@10 (500-vector fixture, shortlist 30, all queries,
    vs exact cosine): identity-rotation BQ 0.478, centered identity
    0.480, ITQ 0.594 — the rotation aligns the quantization hypercube
    with the data's principal directions, spending the 64 bits where
    the variance is (pinned in tests/test_llm.py).  Scale shape: the
    train collect is bounded (train_rows × d), encoding is one
    zero-exchange mapInPandas per side, and stage 1 streams 8-byte
    codes — everything else inherits bq_two_stage_topk's plan."""
    mu, R = itq_rotation(
        corpus_df, id_col, vec_col, in_dims, train_rows, iters
    )
    ccodes = itq_encode(corpus_df, mu, R, id_col, vec_col)
    qcodes = itq_encode(queries_df, mu, R, id_col, vec_col)
    return _hamming_two_stage(
        ccodes, qcodes, corpus_df, queries_df, k, shortlist, id_col, vec_col
    )
