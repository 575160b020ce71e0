"""Rank-fusion for hybrid retrieval (SURVEY §2.2 Q151).

Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR'09): given N
independently-ranked shortlists over the same id space, score each
candidate ``sum_legs scale // (k + rank)`` and re-rank.  RRF is the
standard head over a lexical leg (BM25) and a semantic leg (ANN) in
retrieval / data-curation pipelines; with k=60 it is robust to the legs'
score scales because only RANKS enter the formula.

Integer discipline (the q130/q125b fixed-point rule): the reciprocal is
``scale div (k + rank)`` in int64 — truncating division agrees between
Spark's ``div`` and DuckDB's ``//``, so the fused scores hash-match the
oracle exactly; float reciprocals would differ in the last ulp and break
cross-engine comparison.

Scale shape: each leg is already a bounded shortlist (top-n per leg, n
in the tens to thousands — never corpus-sized), so the fusion is a
sequence of full-outer joins co-partitioned on the id column: ONE
exchange per leg of O(shortlist) rows, then a row-local score sum.  At
100 TB the legs' shortlists are what shrinks the corpus; fusion itself
never touches corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: standard RRF dampening constant (SIGIR'09 uses 60)
RRF_K = 60

#: integer scale for the reciprocal — 1e6 keeps ~5 significant digits of
#: 1/(k+rank) while the per-candidate sum stays far below int64 range
RRF_SCALE = 1_000_000


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str,
    k: int = RRF_K,
    scale: int = RRF_SCALE,
) -> DataFrame:
    """Fuse ranked shortlists into one RRF-scored candidate table.

    ``legs`` maps a leg name to a DataFrame with columns ``(id_col,
    rank)`` — rank 1-based, one row per shortlisted candidate.  Returns
    one row per candidate appearing in ANY leg: ``(id_col,
    <leg>_rank ... , rrf_score)`` with ``<leg>_rank`` = 0 when the leg
    did not shortlist the candidate (0, not NULL: absent-leg semantics
    stay hashable and need no nullable-int handling downstream) and
    ``rrf_score = sum_legs scale div (k + rank)`` over the present legs.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    fused: DataFrame | None = None
    for name, df in legs.items():
        leg = df.select(
            F.col(id_col),
            F.col("rank").cast("int").alias(f"{name}_rank"),
        )
        fused = leg if fused is None else fused.join(leg, id_col, "full_outer")
    score = None
    for name in legs:
        contrib = F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.expr(f"{scale} div ({k} + CAST({name}_rank AS BIGINT))"),
        ).otherwise(F.lit(0).cast("long"))
        score = contrib if score is None else score + contrib
    return fused.select(
        F.col(id_col),
        *[
            F.coalesce(F.col(f"{name}_rank"), F.lit(0)).alias(f"{name}_rank")
            for name in legs
        ],
        score.cast("long").alias("rrf_score"),
    )
