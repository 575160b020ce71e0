"""LLM-pipeline operator tests beyond the SQL oracle: LSH recall vs brute
force, SimHash locality, dedup on crafted duplicates, multimodal plumbing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from palletjack_spark.functions.dedup import exact_dedup, minhash_lsh_pairs, simhash
from palletjack_spark.functions.multimodal import (
    attach_fake_binary,
    decode_image_stub,
    extract_binary_features,
)
from palletjack_spark.functions.similarity import cosine_topk, lsh_bucket_topk
from palletjack_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def crafted_docs(spark):
    """Docs with known duplicates and near-duplicates."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about spark query engines at scale"),
        (4, "completely different content about spark query engines at scale"),
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_finds_crafted_dups(spark, crafted_docs):
    out = {
        r["keeper_id"]: r["dup_cnt"]
        for r in exact_dedup(crafted_docs, "text", "doc_id").collect()
    }
    assert out[0] == 2 and out[3] == 2 and out[5] == 1


def test_minhash_finds_near_dups(spark, crafted_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            crafted_docs, "text", "doc_id", threshold=0.4
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # exact dup
    assert (3, 4) in pairs and pairs[(3, 4)] == 1.0
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert not any(5 in p for p in pairs)  # unrelated not paired


def test_simhash_locality(spark, crafted_docs):
    h = {r["doc_id"]: r["simhash"] for r in simhash(crafted_docs, "text", "doc_id").collect()}
    assert h[0] == h[1]  # identical text → identical fingerprint
    ham_near = bin(h[0] ^ h[2]).count("1")
    ham_far = bin(h[0] ^ h[3]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated


def test_lsh_beats_random_scan_on_fixture(spark):
    """The fixture embeddings are iid-random (nearest cosine ~0.37, i.e.
    near-orthogonal) — adversarial for any LSH.  The mechanism test is
    therefore *lift*: recall must beat the fraction of the corpus the
    buckets actually scanned (random candidate selection has lift 1.0)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    n_corpus = emb.count()
    exact = cosine_topk(emb, queries, k=10).toPandas()
    approx = lsh_bucket_topk(
        emb, queries, k=10, n_planes=8, n_probes=4, n_tables=6
    ).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    avg_recall = sum(recalls) / len(recalls)
    # expected scan fraction: n_tables * (1 + n_probes) buckets of 2^8
    scan_fraction = 6 * (1 + 4) / 256
    assert avg_recall >= 1.5 * scan_fraction, (avg_recall, scan_fraction)


def test_lsh_high_recall_on_clustered_data(spark):
    """On clustered embeddings (the realistic near-dup geometry LSH is
    built for) bucket probing must recover nearly all true neighbors."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((10, 64)) * 3.0
    rows = []
    for i in range(300):
        c = centers[i % 10]
        rows.append((i, [float(x) for x in c + rng.standard_normal(64) * 0.3]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10).toPandas()
    approx = lsh_bucket_topk(
        emb, queries, k=10, n_planes=8, n_probes=4, n_tables=6
    ).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_cosine_topk_self_similarity(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    with_self = cosine_topk(emb, queries, k=1, exclude_self=False).toPandas()
    # each query's own vector is its best match at cosine 1.0
    assert (with_self["query_id"] == with_self["vec_id"]).all()
    assert (with_self["cosine"] == 1.0).all()


def test_multimodal_plumbing(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    assets = attach_fake_binary(docs, "text", "doc_id")
    feats = extract_binary_features(assets).toPandas()
    assert len(feats) == 100
    assert set(feats["modality"]) <= {"image", "audio", "video"}
    assert (feats["n_bytes"] > 0).all()
    assert feats["width"].between(16, 79).all()
    # deterministic: same payload → same checksum on re-run
    again = extract_binary_features(assets).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("asset_id").reset_index(drop=True),
        again.sort_values("asset_id").reset_index(drop=True),
    )


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG")
    d = decode_image_stub(b"\x89PNG", fake=True)
    assert set(d) == {"width", "height", "mode"}


def test_ivf_full_probe_is_exact(spark):
    """Probing every IVF cell must reproduce brute force bit-for-bit."""
    from palletjack_spark.functions.similarity import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    full = ivf_topk(emb, queries, k=10, n_centroids=8, n_probes=8).toPandas()
    bf = cosine_topk(emb, queries, k=10).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        full[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )


def test_ivf_partial_probe_recall(spark):
    from palletjack_spark.functions.similarity import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, n_probes=6).toPandas()
    exact = cosine_topk(emb, queries, k=10).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_nn_graph_matches_brute_force_top1(spark):
    """nn_graph == cosine_topk(k=1) with every vector as its own query."""
    from palletjack_spark.functions.similarity import nn_graph

    emb = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 100)
    nn = nn_graph(emb, n_blocks=4).toPandas()
    bf = cosine_topk(emb, emb, k=1).toPandas().rename(
        columns={"query_id": "vec_id", "vec_id": "nn_id"}
    )
    cols = ["vec_id", "nn_id", "cosine"]
    pd.testing.assert_frame_equal(
        nn[cols].sort_values("vec_id").reset_index(drop=True),
        bf[cols].sort_values("vec_id").reset_index(drop=True),
    )


def test_multimodal_resize_and_frames(spark):
    from palletjack_spark.functions.multimodal import resize_images, sample_frames

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    assets = attach_fake_binary(docs, "text", "doc_id")
    resized = resize_images(assets, target_w=8, target_h=8).toPandas()
    assert (resized["n_bytes"] == 8 * 8 * 3).all()
    assert resized["payload"].apply(len).eq(8 * 8 * 3).all()
    frames = sample_frames(assets, frame_bytes=64, max_frames=3).toPandas()
    assert frames.groupby("asset_id")["frame_no"].max().le(2).all()
    assert frames["frame_payload"].apply(len).le(64).all()
    # deterministic across runs
    again = sample_frames(assets, frame_bytes=64, max_frames=3).toPandas()
    k = ["asset_id", "frame_no"]
    pd.testing.assert_frame_equal(
        frames.sort_values(k).reset_index(drop=True),
        again.sort_values(k).reset_index(drop=True),
    )
