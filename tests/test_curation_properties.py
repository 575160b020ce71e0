"""Property-based invariants for the round-4 curation operators — the
oracle differential pins one fixture; these pin the algebraic properties
on randomized corpora (few examples: each example runs Spark jobs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs(spark, texts, sources=None):
    rows = [
        (i, t, (sources or ["s%d" % (i % 3)] * len(texts))[i])
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


@given(texts=corpus_strategy)
@_SETTINGS
def test_cap_domains_invariants(spark, texts):
    """Caps hold, blocked domains vanish, output ids ⊆ input ids, and the
    selection is order-independent."""
    from palletjack_spark.functions.curation import cap_domains

    df = _docs(spark, texts)
    out = cap_domains(df, "doc_id", "source", cap=2, blocklist=("s0",)).toPandas()
    assert (out.groupby("source").size() <= 2).all()
    assert "s0" not in set(out["source"])
    assert set(out["doc_id"]) <= set(range(len(texts)))
    shuffled = df.orderBy(F.rand(7))
    again = cap_domains(
        shuffled, "doc_id", "source", cap=2, blocklist=("s0",)
    ).toPandas()
    assert sorted(out["doc_id"]) == sorted(again["doc_id"])


@given(texts=corpus_strategy)
@_SETTINGS
def test_cross_doc_dupgrams_invariants(spark, texts):
    """Fractions live in [0,1]; appending an exact copy of a doc drives
    both copies' dup_frac to 1.0; short docs produce no row."""
    from palletjack_spark.functions.dedup import cross_doc_dupgrams

    df = _docs(spark, texts)
    out = cross_doc_dupgrams(df, "text", "doc_id").toPandas()
    assert ((out["dup_frac"] >= 0) & (out["dup_frac"] <= 1)).all()
    short_ids = {i for i, t in enumerate(texts) if len(t.split()) < 4}
    assert short_ids.isdisjoint(set(out["doc_id"]))
    long_ids = [i for i, t in enumerate(texts) if len(t.split()) >= 4]
    if long_ids:
        victim = long_ids[0]
        dup_id = len(texts)
        with_dup = df.union(
            df.sparkSession.createDataFrame(
                [(dup_id, texts[victim], "sX")],
                "doc_id long, text string, source string",
            )
        )
        out2 = cross_doc_dupgrams(with_dup, "text", "doc_id").toPandas()
        by_id = out2.set_index("doc_id")["dup_frac"]
        assert by_id[victim] == 1.0 and by_id[dup_id] == 1.0


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4
        ).filter(lambda v: sum(x * x for x in v) > 1e-3),
        min_size=2,
        max_size=8,
    )
)
@_SETTINGS
def test_semantic_dedup_invariants(spark, vecs):
    """The lowest id of every cluster always keeps; positively scaling a
    vector never changes the verdicts (cosine invariance)."""
    from palletjack_spark.functions.similarity import semantic_dedup

    rows = [(i, i % 2, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    out = {r["vec_id"]: r["keep"] for r in
           semantic_dedup(df, "embedding", "vec_id", "label", tau=0.8).collect()}
    for cluster in (0, 1):
        members = [i for i, _ in enumerate(vecs) if i % 2 == cluster]
        if members:
            assert out[min(members)] is True
    scaled = [(i, i % 2, [x * 3.0 for x in v]) for i, v in enumerate(vecs)]
    df2 = spark.createDataFrame(
        scaled, "vec_id long, label long, embedding array<float>"
    )
    out2 = {r["vec_id"]: r["keep"] for r in
            semantic_dedup(df2, "embedding", "vec_id", "label", tau=0.8).collect()}
    assert out == out2


@given(texts=corpus_strategy)
@_SETTINGS
def test_importance_weights_self_target_scores_one(spark, texts):
    """When the target IS the raw corpus, every document's score is
    exactly 1.0 (t_mass == r_mass term by term)."""
    from palletjack_spark.functions.curation import importance_weights

    df = _docs(spark, texts)
    out = importance_weights(df, df, "text", "doc_id").toPandas()
    assert (out["score"] == 1.0).all()
    assert (out["t_mass"] == out["r_mass"]).all()


@given(texts=corpus_strategy)
@_SETTINGS
def test_cdc_chunks_partition_properties(spark, texts):
    """Round-12 q159 kernel: chunks reconstruct the token stream exactly
    (concatenation in chunk order = original tokens), every chunk is
    non-empty, and the split matches a pure-python CDC reference."""
    import hashlib

    from palletjack_spark.functions.dedup import CDC_DIVISOR, cdc_chunks

    df = _docs(spark, texts)
    rows = cdc_chunks(df, "text", "doc_id").collect()

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % CDC_DIVISOR

    for i, text in enumerate(texts):
        toks = [w for w in text.split(" ") if w]
        ref, cur = [], []
        for w in toks:
            if bucket(w) == 0:
                if cur:
                    ref.append(cur)
                cur = [w]
            else:
                cur.append(w)
        if cur:
            ref.append(cur)
        mine = sorted(
            (r for r in rows if r["doc_id"] == i), key=lambda r: r["chunk_id"]
        )
        assert [r["n_toks"] for r in mine] == [len(c) for c in ref]
        assert [r["chunk_hash"] for r in mine] == [
            hashlib.md5(" ".join(c).encode()).hexdigest() for c in ref
        ]


@given(texts=corpus_strategy)
@_SETTINGS
def test_bigram_pairs_row_local_extraction(spark, texts):
    """Round-12 q157 kernel: the zip_with pair extraction emits exactly
    the adjacent pairs of the compacted token list, in any partitioning."""
    from palletjack_spark.functions.text import _lm_pairs

    df = _docs(spark, texts).repartition(5)
    rows = _lm_pairs(df, "text", "doc_id").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append((r["w1"], r["w2"]))
    for i, text in enumerate(texts):
        toks = [w for w in text.split(" ") if w]
        want = list(zip(toks, toks[1:]))
        assert sorted(got.get(i, [])) == sorted(want)


@given(
    vec=st.lists(
        st.floats(
            min_value=-2.0, max_value=2.0, allow_nan=False, width=32
        ),
        min_size=64,
        max_size=64,
    )
)
@_SETTINGS
def test_binary_quantize_pack_property(spark, vec):
    """Round-12 q92o kernel: packed halves equal the reference bit set
    for arbitrary float vectors (including exact zeros -> bit 0)."""
    from palletjack_spark.functions.similarity import binary_quantize

    df = spark.createDataFrame(
        [(1, [float(v) for v in vec])], "vec_id long, embedding array<double>"
    )
    r = binary_quantize(df).collect()[0]
    lo = sum(1 << i for i in range(32) if vec[i] > 0)
    hi = sum(1 << (i - 32) for i in range(32, 64) if vec[i] > 0)
    assert (r["lo"], r["hi"]) == (lo, hi)


# --- q159b: FastCDC-bounded chunking vs a pure-Python reference ----------


def _is_boundary(tok: str, divisor: int) -> bool:
    import hashlib

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % divisor == 0


def _ref_bounded_chunks(text: str, divisor: int, min_len: int, max_len: int):
    """Pure-Python reference for cdc_chunks_bounded's exact semantics:
    cut BEFORE token x iff the current chunk holds max_len tokens, or x
    is a boundary and the chunk holds >= min_len."""
    toks = [t for t in text.split(" ") if t != ""]
    chunks, cur = [], []
    for x in toks:
        if cur and (
            len(cur) >= max_len
            or (_is_boundary(x, divisor) and len(cur) >= min_len)
        ):
            chunks.append(cur)
            cur = [x]
        else:
            cur.append(x)
    if cur:
        chunks.append(cur)
    return chunks


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(WORDS + ["omega", "kappa", "mu"]),
            min_size=0,
            max_size=40,
        ).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    min_len=st.integers(min_value=1, max_value=4),
    extra=st.integers(min_value=0, max_value=8),
)
@_SETTINGS
def test_cdc_bounded_matches_reference_and_invariants(
    spark, texts, min_len, extra
):
    """q159b: Spark fold == pure-Python reference chunk for chunk;
    chunks partition the tokens; every chunk <= max_len; every
    non-final chunk >= min_len."""
    import hashlib

    from palletjack_spark.functions.dedup import CDC_DIVISOR, cdc_chunks_bounded

    max_len = min_len + extra
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = (
        cdc_chunks_bounded(
            df, "text", "doc_id", min_len=min_len, max_len=max_len
        )
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_hash"], r["n_toks"])
        )
    for i, text in enumerate(texts):
        ref = _ref_bounded_chunks(text, CDC_DIVISOR, min_len, max_len)
        want = [
            (j, hashlib.md5(" ".join(c).encode()).hexdigest(), len(c))
            for j, c in enumerate(ref)
        ]
        assert by_doc.get(i, []) == want, (i, text)
        toks = [t for t in text.split(" ") if t != ""]
        assert [t for c in ref for t in c] == toks  # partition
        assert all(len(c) <= max_len for c in ref)
        assert all(len(c) >= min_len for c in ref[:-1])


@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=30).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
@_SETTINGS
def test_cdc_bounded_degenerates_to_unbounded(spark, texts):
    """min_len=1, max_len=∞ must reproduce q159's unbounded chunking
    exactly — the bounds are pure normalization, not a new chunker."""
    from palletjack_spark.functions.dedup import cdc_chunks, cdc_chunks_bounded

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = sorted(
        tuple(r) for r in cdc_chunks(df, "text", "doc_id").collect()
    )
    got = sorted(
        tuple(r)
        for r in cdc_chunks_bounded(
            df, "text", "doc_id", min_len=1, max_len=1 << 30
        ).collect()
    )
    assert got == want
