"""Semantic guarantees behind the retrieval/sketch operators (Q141–Q143)
and the new analytics operators' edge semantics — the provable claims the
oracle equality rests on, exercised directly so a refactor can't silently
weaken them."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Q141: Misra-Gries summaries never lose a true heavy hitter


@settings(max_examples=40, deadline=None)
@given(
    tokens=st.lists(
        # bimodal draw: ~half the mass on 6 head tokens (so true heavy
        # hitters exist) over a 200-token tail (vocabulary > _MG_M=64 so
        # the kth-subtraction reduction — the branch the guarantee rests
        # on — actually fires; round-7 review)
        st.one_of(
            st.sampled_from([f"h{i}" for i in range(6)]),
            st.sampled_from([f"t{i}" for i in range(200)]),
        ),
        min_size=1,
        max_size=400,
    ),
    n_batches=st.integers(min_value=1, max_value=4),
)
def test_mg_summary_superset_of_heavy_hitters(tokens, n_batches):
    """Pigeonhole + the Agarwal et al. merge-reduction: any token with
    partition frequency > n/m must keep a positive weight in the
    partition's summary, for ANY batch slicing of the partition."""
    from palletjack_spark.queries.retrieval import _MG_M, _MG_TOTAL, _mg_summaries

    size = max(1, len(tokens) // n_batches)
    batches = [
        pd.DataFrame({"token": tokens[i : i + size]})
        for i in range(0, len(tokens), size)
    ]
    out = pd.concat(list(_mg_summaries(iter(batches))))
    total = int(out.loc[out["token"] == _MG_TOTAL, "weight"].iloc[0])
    assert total == len(tokens)
    survivors = set(out["token"]) - {_MG_TOTAL}
    exact = pd.Series(tokens).value_counts()
    for tok, cnt in exact.items():
        if cnt * _MG_M > total:
            assert tok in survivors, (tok, cnt, total, survivors)


def test_mg_summary_bounded_memory():
    """The reduction keeps the summary at ≤ m entries after every batch,
    even with a vocabulary far larger than m."""
    from palletjack_spark.queries.retrieval import _MG_M, _MG_TOTAL, _mg_summaries

    batches = [
        pd.DataFrame({"token": [f"w{i}_{j}" for i in range(1000) for j in range(2)]})
        for _ in range(3)
    ]
    out = pd.concat(list(_mg_summaries(iter(batches))))
    assert len(out) <= _MG_M + 1  # + the sentinel row
    assert _MG_TOTAL in set(out["token"])


# ---------------------------------------------------------------------------
# Q142: deletion signatures are complete for edit distance ≤ 1


def _d1(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _lev_le1(a: str, b: str) -> bool:
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # one substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    return b in {a[:i] + c + a[i:] for i in range(la + 1) for c in set(b)}


@settings(max_examples=150, deadline=None)
@given(
    a=st.text(alphabet="abc", min_size=0, max_size=8),
    b=st.text(alphabet="abc", min_size=0, max_size=8),
)
def test_deletion_signatures_complete_for_lev_le_1(a, b):
    """If lev(a,b) ≤ 1 the two deletion neighborhoods intersect — the
    completeness claim the q142 candidate join relies on.  (The converse
    is false — shared signatures at distance 2 exist — which is why the
    operator verifies with exact levenshtein.)"""
    if _lev_le1(a, b):
        assert _d1(a) & _d1(b), (a, b)


# ---------------------------------------------------------------------------
# Q144: skyline tie semantics


def test_skyline_ties_co_survive(spark):
    """Two parts with identical (price, qty) dominate each other under
    neither definition — both must appear; a same-qty point at a higher
    price must be dominated away.  Checked against the fixture's
    brute-force frontier."""
    from palletjack_spark.queries import REGISTRY

    rows = REGISTRY["q144_skyline"].fn(spark, SF_DIR).collect()
    pts = {(r["part_key"], r["price"], r["total_qty"]) for r in rows}
    assert pts, "fixture skyline must be non-empty"
    # no surviving point dominates another surviving point
    for _, p1, q1 in pts:
        for _, p2, q2 in pts:
            assert not (
                (p1 <= p2 and q1 >= q2) and (p1 < p2 or q1 > q2)
            ), (p1, q1, p2, q2)


# ---------------------------------------------------------------------------
# Q143: the integer BM25 factors stay far from int64 overflow


def test_bm25_integer_bounds():
    """idf ≤ 1e6 by construction and the worst-case product
    idf · tf·2200 · 1000 stays under int64 even at tf = dl = 10^6 —
    the no-overflow claim in the q143 docstring."""
    idf_max = 1_000_000
    tf = dl = 1_000_000
    num = tf * 2200
    worst = idf_max * num * 1000
    assert worst < (1 << 63) - 1
    assert dl > 0


def test_deletion_signature_candidates_subquadratic():
    """The q142 scale claim in numbers: on realistic distinct strings the
    signature join's candidate-pair count stays near-linear in n — it is
    the quadratic cross join (n²/2 pairs) that the operator avoids.
    Pure-Python mirror of the join (dict-bucket by signature)."""
    import random

    rng = random.Random(7)
    n = 5000
    strings = {
        "".join(rng.choice("abcdefgh") for _ in range(12)) for _ in range(n)
    }
    buckets: dict[str, list[str]] = {}
    for s in strings:
        for sig in _d1(s):
            buckets.setdefault(sig, []).append(s)
    pairs = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((min(members[i], members[j]), max(members[i], members[j])))
    n = len(strings)
    assert len(pairs) < 10 * n, (len(pairs), n * (n - 1) // 2)


# ---------------------------------------------------------------------------
# Q151: RRF fusion semantics


def test_rrf_fuse_integer_scores_and_absent_legs(spark):
    """A candidate in both legs sums both reciprocals; a candidate in
    one leg gets rank 0 for the other and only its own contribution —
    all in exact int64 (1e6 div (60+rank)), never floats."""
    from palletjack_spark.functions.fusion import rrf_fuse

    bm25 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    ann = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank int"
    )
    out = {
        r["doc_id"]: r
        for r in rrf_fuse({"bm25": bm25, "ann": ann}, "doc_id").collect()
    }
    assert set(out) == {10, 20, 30, 40}
    # both legs: bm25 rank 2 + ann rank 1 -> 1e6//62 + 1e6//61
    assert out[20]["rrf_score"] == 1_000_000 // 62 + 1_000_000 // 61
    assert (out[20]["bm25_rank"], out[20]["ann_rank"]) == (2, 1)
    # single-leg candidates: absent leg contributes 0 and ranks as 0
    assert out[10]["rrf_score"] == 1_000_000 // 61
    assert (out[10]["bm25_rank"], out[10]["ann_rank"]) == (1, 0)
    assert out[40]["rrf_score"] == 1_000_000 // 62
    assert (out[40]["bm25_rank"], out[40]["ann_rank"]) == (0, 2)
    # dtypes: ranks int, score long (the hash-comparability contract)
    schema = {
        f.name: f.dataType.simpleString()
        for f in rrf_fuse({"bm25": bm25, "ann": ann}, "doc_id").schema.fields
    }
    assert schema == {
        "doc_id": "bigint",
        "bm25_rank": "int",
        "ann_rank": "int",
        "rrf_score": "bigint",
    }


def test_rrf_fuse_three_legs(spark):
    """N-leg generality: a third leg folds into the same id-co-grouped
    join chain and the score sums all present reciprocals."""
    from palletjack_spark.functions.fusion import rrf_fuse

    legs = {
        "a": spark.createDataFrame([(1, 1)], "doc_id long, rank int"),
        "b": spark.createDataFrame([(1, 2)], "doc_id long, rank int"),
        "c": spark.createDataFrame([(1, 3), (2, 1)], "doc_id long, rank int"),
    }
    rows = {r["doc_id"]: r for r in rrf_fuse(legs, "doc_id").collect()}
    assert rows[1]["rrf_score"] == (
        1_000_000 // 61 + 1_000_000 // 62 + 1_000_000 // 63
    )
    assert rows[2]["rrf_score"] == 1_000_000 // 61
    assert (rows[2]["a_rank"], rows[2]["b_rank"], rows[2]["c_rank"]) == (0, 0, 1)


def test_tiny_corpus_ann_index_roundtrips(spark, tmp_path):
    """Round-17 sweep: _kmeans_cosine returned FEWER centroids than
    requested when the training sample was smaller than n_centroids
    (unlike _kmeans_l2, which pads) — save_ann_index then stamped the
    REQUESTED count into the manifest and load_ann_index rejected the
    store's own artifact as torn.  The trainer now pads by repeating
    rows, so a tiny corpus saves, loads, and queries."""
    import numpy as np
    from pyspark.sql import functions as F

    from palletjack_spark.functions import similarity as SIM
    from palletjack_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 5)
    assert emb.count() == 5
    path = str(tmp_path / "tiny_ann")
    idx = SIM.save_ann_index(emb, path, n_centroids=16, m_subspaces=4,
                             n_codes=8)
    assert idx["centroids"].shape[0] == 16  # padded to the declared count
    loaded = SIM.load_ann_index(spark, path)
    assert np.array_equal(loaded["centroids"], idx["centroids"])
    assert np.array_equal(loaded["codebooks"], idx["codebooks"])
    # the loaded quantizers drive a query end to end
    out = SIM.ivf_pq_topk(
        emb, emb.where(F.col("vec_id") < 2), k=2, n_centroids=16,
        n_probes=16, m_subspaces=4, n_codes=8, shortlist=16,
        ann_index=loaded,
    )
    assert out.count() > 0


def test_corrupt_ann_sidecar_is_typed_error_not_wrap_or_alloc(spark, tmp_path):
    """Round-16 sweep (similarity.py quantizer loader): a corrupt
    manifest must not size multi-GB allocations, and a corrupt
    quantizer row with a negative index must not WRAP via numpy
    indexing into a silently misplaced codeword."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from palletjack_spark.functions import similarity as SIM
    from palletjack_spark.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 64)
    path = str(tmp_path / "ann")
    SIM.save_ann_index(emb, path, n_centroids=4, m_subspaces=4, n_codes=4)
    meta_path = os.path.join(path, "_ann_meta.json")
    meta = json.load(open(meta_path))

    # allocation bomb: declared shape is rejected before np.zeros
    bad = dict(meta, n_centroids=1 << 40)
    json.dump(bad, open(meta_path, "w"))
    with pytest.raises(ValueError, match="implausible"):
        SIM.load_ann_index(spark, path)

    # product bomb (round-16 ADVICE): every field individually under
    # the per-field cap, but n_centroids*dim = 2^40 elements — an 8 TB
    # np.zeros if only the fields were checked
    bad = dict(meta, n_centroids=1 << 20, dim=1 << 20)
    json.dump(bad, open(meta_path, "w"))
    with pytest.raises(ValueError, match="implausible"):
        SIM.load_ann_index(spark, path)
    bad = dict(meta, m_subspaces=1 << 10, n_codes=1 << 10, sub_dim=1 << 10)
    json.dump(bad, open(meta_path, "w"))
    with pytest.raises(ValueError, match="implausible"):
        SIM.load_ann_index(spark, path)
    json.dump(meta, open(meta_path, "w"))

    # negative row index: typed error, never a wrapped write
    q = os.path.join(path, "quantizers")
    rows = spark.read.parquet(q).collect()
    rows[0] = type(rows[0])(kind=rows[0]["kind"], i=-1, j=rows[0]["j"],
                            vec=rows[0]["vec"])
    spark.createDataFrame(
        rows, "kind string, i int, j int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(q)
    with pytest.raises(ValueError, match="corrupt"):
        SIM.load_ann_index(spark, path)
