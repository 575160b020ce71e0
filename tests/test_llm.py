"""LLM-pipeline operator tests beyond the SQL oracle: LSH recall vs brute
force, SimHash locality, dedup on crafted duplicates, multimodal plumbing."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from palletjack_spark.functions.dedup import exact_dedup, minhash_lsh_pairs, simhash
from palletjack_spark.functions.multimodal import (
    attach_fake_binary,
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
    # image dims come from REAL header parsing and must match the
    # closed-form synthetic dimensions
    img = feats[feats["modality"] == "image"]
    assert len(img) > 0
    assert (img["width"] == 8 + img["asset_id"] % 16).all()
    assert (img["height"] == 8 + (img["asset_id"] * 7) % 16).all()
    # video dims/frame counts come from the REAL AVI RIFF parse
    vid = feats[feats["modality"] == "video"]
    assert len(vid) > 0
    assert (vid["width"] == 8 + (vid["asset_id"] * 5) % 12).all()
    assert (vid["height"] == 6 + (vid["asset_id"] * 3) % 10).all()
    assert (vid["n_frames"] == 2 + vid["asset_id"] % 7).all()
    # audio has no codec: dims decode to null
    assert feats[feats["modality"] == "audio"]["width"].isna().all()
    # deterministic: same payload → same checksum on re-run
    again = extract_binary_features(assets).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("asset_id").reset_index(drop=True),
        again.sort_values("asset_id").reset_index(drop=True),
    )


def test_attach_modality_prefilter_matches_postfilter(spark):
    """r17 optimization: ``modalities=`` pre-filters the id cycle BEFORE
    the opaque encode stage (Catalyst cannot prune through mapInPandas),
    so single-modality consumers skip 2/3 of the encode work.  The
    contract is equivalence: pre-filtered output == full output filtered
    afterwards, payload bytes included."""
    docs = load_table(spark, SF_DIR, "documents").limit(60)
    full = (
        attach_fake_binary(docs, "text", "doc_id")
        .where(F.col("modality") == "image")
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    pre = (
        attach_fake_binary(docs, "text", "doc_id", modalities=("image",))
        .toPandas()
        .sort_values("asset_id")
        .reset_index(drop=True)
    )
    assert len(pre) == len(full) > 0
    assert (pre["asset_id"] == full["asset_id"]).all()
    assert (pre["modality"] == "image").all()
    assert all(
        bytes(a) == bytes(b) for a, b in zip(pre["payload"], full["payload"])
    )
    # unknown modality is a typed error, not a silent empty filter
    import pytest as pytest_

    with pytest_.raises(ValueError, match="unknown modalities"):
        attach_fake_binary(docs, "text", "doc_id", modalities=("imag",))
    # the encode stage is spread across the cluster's cores even from a
    # single input split (CPU-bound Python work)
    spread = attach_fake_binary(docs, "text", "doc_id", modalities=("image",))
    assert (
        spread.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


def test_mulaw_assets_decode_through_plugin_seam(spark):
    """q94e's pipeline shape: µ-law-companded WAV assets flow through the
    same extract_audio_features path as PCM, dispatched by FORMAT_DECODERS;
    metadata is exact and probe samples are the dequantized amplitudes."""
    import numpy as np

    from palletjack_spark.functions.audiocodec import (
        mulaw_decode_codewords,
        mulaw_encode,
    )
    from palletjack_spark.functions.multimodal import extract_audio_features

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    assets = attach_fake_binary(docs, "text", "doc_id", audio_codec="mulaw")
    feats = extract_audio_features(assets).toPandas()
    assert len(feats) > 0
    assert (feats["sample_rate"] == 8000).all()
    assert (feats["channels"] == 1 + feats["asset_id"] % 2).all()
    assert (feats["n_samples"] == 100 + (feats["asset_id"] * 11) % 400).all()
    raw_first = (feats["asset_id"] % 256) - 1024
    want_first = mulaw_decode_codewords(
        mulaw_encode(raw_first.to_numpy(np.int64))
    )
    assert (feats["first_sample"].to_numpy(np.int64) == want_first).all()


def test_skipped_payloads_are_counted(spark):
    """Round-3 ADVICE: undecodable payloads must not vanish silently —
    the skip count is surfaced via the accumulator attached to the result."""
    import pandas as pd_

    from palletjack_spark.functions.multimodal import (
        extract_audio_features,
        sample_frames,
    )

    good = attach_fake_binary(
        load_table(spark, SF_DIR, "documents").limit(12), "text", "doc_id"
    ).toPandas()
    # corrupt one audio and one video payload
    for modality in ("audio", "video"):
        i = good[good["modality"] == modality].index[0]
        good.at[i, "payload"] = b"\x00garbage"
    broken = spark.createDataFrame(
        good, "asset_id long, modality string, payload binary, width int,"
        " height int, n_bytes long"
    )
    aud = extract_audio_features(broken)
    n_aud = aud.count()
    assert aud._pjs_skipped.value == 1
    assert n_aud == len(good[good["modality"] == "audio"]) - 1
    vid = sample_frames(broken)
    vid.count()
    assert vid._pjs_skipped.value == 1
    assert isinstance(good, pd_.DataFrame)


def test_image_codec_roundtrip():
    """encode→decode identity for both real codecs, plus dispatch errors."""
    import numpy as np

    from palletjack_spark.functions.imagecodec import (
        UnsupportedImageError,
        decode_image,
        encode_bmp,
        encode_ppm,
        resize_nearest,
        synthetic_image,
    )

    px = synthetic_image(seed=42, w=13, h=9)  # odd width exercises BMP pad
    for enc in (encode_bmp, encode_ppm):
        d = decode_image(enc(px))
        assert (d["width"], d["height"], d["mode"]) == (13, 9, "RGB")
        assert np.array_equal(d["pixels"], px)
    small = resize_nearest(px, 4, 4)
    assert small.shape == (4, 4, 3)
    with pytest.raises(UnsupportedImageError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):  # keeps the stub contract
        decode_image(b"")


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


def test_ivf_pq_full_probe_exhaustive_shortlist_is_exact(spark):
    """IVF-PQ at full probe + exhaustive shortlist must reproduce brute
    force bit-for-bit (the q92f driver contract): every cell probed,
    every candidate kept, exact re-score."""
    from palletjack_spark.functions.similarity import ivf_pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    full = ivf_pq_topk(
        emb, queries, k=10, n_centroids=8, n_probes=8, shortlist=1_000_000
    ).toPandas()
    bf = cosine_topk(emb, queries, k=10).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        full[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )


def test_ann_index_persist_load_bit_identical_no_retrain(
    spark, tmp_path, monkeypatch
):
    """Round-6 verdict item 7: q92g's persisted-quantizer path must be
    hash-equal to the inline path, and loading must be a bounded read,
    never a recompute — asserted by poisoning the k-means trainers after
    the save and re-running the query from the sidecar."""
    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    kw = dict(k=5, n_centroids=8, n_probes=8, shortlist=1_000_000)
    inline = sim.ivf_pq_topk(emb, queries, **kw).toPandas()

    idx_dir = str(tmp_path / "ann")
    sim.save_ann_index(emb, idx_dir, n_centroids=8)

    def _poisoned(*a, **k):
        raise AssertionError("training ran on the persisted path")

    monkeypatch.setattr(sim, "_kmeans_cosine", _poisoned)
    monkeypatch.setattr(sim, "_kmeans_l2", _poisoned)
    monkeypatch.setattr(sim, "_train_ivf_pq", _poisoned)
    idx = sim.load_ann_index(spark, idx_dir)
    persisted = sim.ivf_pq_topk(emb, queries, ann_index=idx, **kw).toPandas()

    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        persisted[cols].sort_values(cols).reset_index(drop=True),
        inline[cols].sort_values(cols).reset_index(drop=True),
    )


def test_ann_index_sidecar_validation(spark, tmp_path):
    """The versioned manifest rejects unknown format versions and torn
    quantizer datasets before any query trusts them."""
    import json

    import pytest

    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    idx_dir = str(tmp_path / "ann")
    sim.save_ann_index(emb, idx_dir, n_centroids=8)

    meta_path = f"{idx_dir}/{sim._ANN_META_NAME}"
    meta = json.load(open(meta_path))
    # shape mismatch vs the query's parameters is rejected
    idx = sim.load_ann_index(spark, idx_dir)
    queries = emb.where(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="shape mismatch"):
        sim.ivf_pq_topk(emb, queries, n_centroids=4, ann_index=idx)
    # torn dataset: declared counts disagree with the stored rows
    meta["n_centroids"] = 9
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="torn"):
        sim.load_ann_index(spark, idx_dir)
    # future format version is refused loudly
    meta["format_version"] = 99
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="format_version"):
        sim.load_ann_index(spark, idx_dir)


def test_q92g_sidecar_keyed_on_content_fingerprint(spark, tmp_path, monkeypatch):
    """Round-8 ADVICE: q92g's persisted-quantizer cache must be keyed on a
    content fingerprint of the embeddings files, not the sf_dir string — a
    regenerated fixture at the same path gets a fresh sidecar, and a
    corrupt leftover under the fingerprint path is rebuilt, not an error."""
    import shutil
    import tempfile

    import palletjack_spark.functions.similarity as sim
    from palletjack_spark.queries.registry import REGISTRY

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.copy(f"{SF_DIR}/embeddings.parquet", f"{sf}/embeddings.parquet")
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    fn = REGISTRY["q92g_ivf_pq_persisted"].fn
    r1 = fn(spark, sf).toPandas()
    dirs1 = sorted(p.name for p in tmp_path.glob("pjspark_annidx_*"))
    assert len(dirs1) == 1

    # same content -> same sidecar reused (no second dir)
    fn(spark, sf).count()
    assert sorted(p.name for p in tmp_path.glob("pjspark_annidx_*")) == dirs1

    # regenerated fixture (same path, new mtime) -> NEW sidecar
    os.utime(f"{sf}/embeddings.parquet")
    fn(spark, sf).count()
    dirs2 = sorted(p.name for p in tmp_path.glob("pjspark_annidx_*"))
    assert len(dirs2) == 2 and dirs1[0] in dirs2

    # corrupt meta under the fingerprint path -> rebuilt, same results
    newest = [d for d in dirs2 if d not in dirs1][0]
    (tmp_path / newest / sim._ANN_META_NAME).write_text("{not json")
    r3 = fn(spark, sf).toPandas()
    cols = list(r1.columns)
    pd.testing.assert_frame_equal(
        r1[cols].sort_values(cols).reset_index(drop=True),
        r3[cols].sort_values(cols).reset_index(drop=True),
    )


def test_q137_packed_argmax_overflow_fails_loudly(spark, tmp_path):
    """Round-6 ADVICE: a doc_id >= 2^31 (or score >= 2^32) must hit
    raise_error, not silently wrap the packed int64 into a wrong argmax."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from palletjack_spark.queries import REGISTRY

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1 << 31], type=pa.int64()),
            "text": ["ok text", "overflow row"],
            "lang": ["en", "en"],
            "source": ["web1", "web1"],
            "n_chars": pa.array([7, 12], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = REGISTRY["q137_groupwise_argmax"].fn(spark, str(tmp_path))
    with pytest.raises(Exception, match="q137 packed argmax out of range"):
        df.collect()


def test_pq_and_ivf_pq_empty_corpus_raise_valueerror(spark):
    """Round-6 ADVICE: the non-empty-sample guard must run BEFORE the
    axis=1 normalization, so an empty corpus raises the intended
    ValueError, not numpy AxisError."""
    import pytest

    from palletjack_spark.functions.similarity import ivf_pq_topk, pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    empty = emb.where(F.col("vec_id") < 0)
    queries = emb.where(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="non-empty corpus sample"):
        ivf_pq_topk(empty, queries, k=3)
    with pytest.raises(ValueError, match="non-empty corpus sample"):
        pq_topk(empty, queries, k=3)


def test_ivf_pq_realistic_settings_recall(spark):
    """IVF-PQ at sub-linear settings (probe 6/16 cells, shortlist 64 of a
    ~6k corpus): scanning ~3/8 of the corpus as 8-byte residual codes
    must still recall most of the true top-10 after exact re-score."""
    from palletjack_spark.functions.similarity import ivf_pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = ivf_pq_topk(
        emb, queries, k=10, n_centroids=16, n_probes=6, shortlist=64
    ).toPandas()
    exact = cosine_topk(emb, queries, k=10).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


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
    # real BMP re-encode: 54-byte header + 8 rows of 24 B (pad-free)
    assert (resized["n_bytes"] == 54 + 8 * 24).all()
    assert resized["payload"].apply(len).eq(54 + 8 * 24).all()
    assert (resized["width"] == 8).all() and (resized["height"] == 8).all()
    frames = sample_frames(assets, max_frames=3).toPandas()
    assert frames.groupby("asset_id")["frame_no"].max().le(2).all()
    # dims come from the AVI header parse; sampled count = min(n_frames, 3)
    assert (frames["width"] == 8 + (frames["asset_id"] * 5) % 12).all()
    assert (frames["height"] == 6 + (frames["asset_id"] * 3) % 10).all()
    n_frames = 2 + frames["asset_id"] % 7
    counts = frames.groupby("asset_id")["frame_no"].count()
    expect = n_frames.groupby(frames["asset_id"]).first().clip(upper=3)
    assert counts.eq(expect).all()
    # each sampled frame re-encodes as a real BMP of the source dims
    import numpy as np

    from palletjack_spark.functions.imagecodec import decode_image
    from palletjack_spark.functions.videocodec import synthetic_video

    row = frames.iloc[0]
    d = decode_image(bytes(row["frame_payload"]))
    assert (d["width"], d["height"]) == (row["width"], row["height"])
    src = synthetic_video(
        int(row["asset_id"]) % 256, row["width"], row["height"],
        int(2 + row["asset_id"] % 7),
    )
    assert np.array_equal(d["pixels"], src[int(row["src_frame"])])
    # deterministic across runs
    again = sample_frames(assets, max_frames=3).toPandas()
    k = ["asset_id", "frame_no"]
    pd.testing.assert_frame_equal(
        frames.sort_values(k).reset_index(drop=True),
        again.sort_values(k).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# degenerate-bucket guards (VERDICT r1 #5): a hot LSH bucket must not emit
# O(bucket²) candidates, and capped runs must keep dup groups connected
# while leaving under-cap buckets oracle-exact
# ---------------------------------------------------------------------------

def _connected_components(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a in parent and b in parent:
            parent[find(a)] = find(b)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), set()).add(i)
    return list(groups.values())


@pytest.fixture(scope="module")
def hot_bucket_docs(spark):
    """300 byte-identical docs (one degenerate bucket in EVERY band) plus a
    small distinct corpus with known near-dups."""
    hot = "identical boilerplate document repeated across the corpus " * 4
    rows = [(i, hot) for i in range(300)]
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows += [
        (1000, base),
        (1001, base.replace("lazy", "sleepy")),
        (1002, "completely different content about spark query engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_hot_bucket_chains(spark, hot_bucket_docs):
    from palletjack_spark.functions.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            hot_bucket_docs, "text", "doc_id", threshold=0.5, bucket_cap=50
        ).collect()
    }
    hot_ids = set(range(300))
    hot_pairs = [p for p in pairs if p[0] in hot_ids and p[1] in hot_ids]
    # chain mode: O(bucket) pairs, NOT 300*299/2 = 44850
    assert len(hot_pairs) < 3000, len(hot_pairs)
    assert all(pairs[p] == 1.0 for p in hot_pairs)
    # the whole hot group stays transitively connected
    comps = _connected_components(hot_ids, hot_pairs)
    assert len(comps) == 1 and comps[0] == hot_ids
    # under-cap docs keep exhaustive behavior: differential vs uncapped
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            hot_bucket_docs.where("doc_id >= 1000"),
            "text",
            "doc_id",
            threshold=0.5,
        ).collect()
    }
    cold_pairs = {p for p in pairs if p[0] >= 1000 and p[1] >= 1000}
    assert cold_pairs == uncapped


def test_simhash_hot_bucket_chains(spark, hot_bucket_docs):
    from palletjack_spark.functions.dedup import simhash_pairs

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(
            hot_bucket_docs, "text", "doc_id", bucket_cap=50
        ).collect()
    }
    hot_ids = set(range(300))
    hot_pairs = [p for p in got if p[0] in hot_ids and p[1] in hot_ids]
    assert len(hot_pairs) < 3000, len(hot_pairs)
    assert all(got[p] == 0 for p in hot_pairs)
    comps = _connected_components(hot_ids, hot_pairs)
    assert len(comps) == 1 and comps[0] == hot_ids
    # the near-dup among distinct docs must still be found (recall intact
    # for under-cap buckets)
    assert any(p == (1000, 1001) for p in got)


def test_connected_components_crafted(spark):
    """Chain, star, triangle+tail, singletons-absent: the contraction must
    label every node with its component minimum, converging in O(log n)
    rounds even on a 64-node chain (the bucket-cap chain shape)."""
    from palletjack_spark.functions.dedup import connected_components

    edges = (
        # 64-node chain: 0-1-2-...-63
        [(i, i + 1) for i in range(63)]
        # star centred at 100
        + [(100, v) for v in (101, 102, 103, 104)]
        # triangle with a tail, listed in arbitrary order
        + [(202, 201), (200, 202), (201, 200), (203, 202)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert {n for n in got if got[n] == 0} == set(range(64))
    assert {n for n in got if got[n] == 100} == {100, 101, 102, 103, 104}
    assert {n for n in got if got[n] == 200} == {200, 201, 202, 203}
    assert len(got) == 64 + 5 + 4  # no phantom nodes


def test_connected_components_one_action_per_round(spark, monkeypatch):
    """Round-3 verdict item 7: convergence is decided by ONE driver action
    per round — a fused (count, hash-sum) signature aggregate — instead of
    count() + exceptAll().isEmpty().  Counted at the DataFrame-action layer
    (AQE splits one action into several Spark jobs, so job counts lie)."""
    import pyspark.sql.classic.dataframe as dfmod

    from palletjack_spark.functions.dedup import connected_components

    calls = {"collect": 0, "count": 0, "isEmpty": 0}
    orig_collect = dfmod.DataFrame.collect
    monkeypatch.setattr(
        dfmod.DataFrame,
        "collect",
        lambda self: (calls.__setitem__("collect", calls["collect"] + 1),
                      orig_collect(self))[1],
    )
    orig_count = dfmod.DataFrame.count
    monkeypatch.setattr(
        dfmod.DataFrame,
        "count",
        lambda self: (calls.__setitem__("count", calls["count"] + 1),
                      orig_count(self))[1],
    )
    orig_empty = dfmod.DataFrame.isEmpty
    monkeypatch.setattr(
        dfmod.DataFrame,
        "isEmpty",
        lambda self: (calls.__setitem__("isEmpty", calls["isEmpty"] + 1),
                      orig_empty(self))[1],
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long"
    )
    # a 9-node chain can't star-converge in one round — the round-13
    # guard makes that LOUD (silently returning a non-star edge set
    # produced inconsistent component labels downstream).
    # local_max_edges=0 pins the DISTRIBUTED path (the default size gate
    # would contract 8 edges driver-side and never iterate).
    import pytest

    with pytest.raises(ValueError, match="did not converge"):
        connected_components(pairs, max_iterations=1, local_max_edges=0)
    # one initial signature + one per-round signature, nothing else
    assert calls == {"collect": 2, "count": 0, "isEmpty": 0}


def test_connected_components_local_path_matches_distributed(spark):
    """The r17 small-graph fast path (bounded take + union-find) must
    produce the identical labelling as the star-contraction loop on
    graphs covering chains, stars, triangles, merges and singleton edges
    — and the size gate must flip paths exactly at the edge count."""
    import random

    from palletjack_spark.functions.dedup import connected_components

    rng = random.Random(17)
    edges = (
        [(i, i + 1) for i in range(40)]              # chain
        + [(500, 500 + k) for k in range(1, 9)]      # star
        + [(900, 901), (901, 902), (902, 900)]       # triangle
        + [(40, 500)]                                # merge chain into star
        + [(rng.randrange(2000, 2100), rng.randrange(2000, 2100))
           for _ in range(60)]                       # random clutter
    )
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, local_max_edges=0).collect()
    }
    assert local == dist and local
    # gate boundary: cap below the deduplicated edge count must also take
    # the distributed path and still agree
    n_edges = (
        spark.createDataFrame([(a, b) for a, b in edges], "id_a long, id_b long")
        .selectExpr("id_a u", "id_b v")
        .where("u <> v").distinct().count()
    )
    tiny_gate = {
        (r["node"], r["component"])
        for r in connected_components(pairs, local_max_edges=max(1, n_edges - 1)).collect()
    }
    assert tiny_gate == dist


def test_apply_components_keeps_canonical(spark, crafted_docs):
    """Dedup materialization: the min-id member of each near-dup cluster
    survives; untouched docs pass through."""
    from palletjack_spark.functions.dedup import (
        apply_components,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    comp = connected_components(pairs)
    out = sorted(
        r["doc_id"]
        for r in apply_components(crafted_docs, comp, "doc_id").collect()
    )
    # clusters {0,1,2} -> keep 0; {3,4} -> keep 3; 5 untouched
    assert out == [0, 3, 5]


def test_repetition_filter_drops_spam(spark):
    """Gopher-rule signals: a repeated-boilerplate doc must trip the
    dup-2gram threshold, a single-word spam doc the top-word threshold;
    normal prose passes."""
    from palletjack_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "click here to win " * 20),     # dup 2-grams ≈ 1
            (2, "spam " * 50),                  # top word = 1.0
            (3, "the quick brown fox jumps over a lazy dog near banks"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            df.withColumn("text", F.trim("text")), "text", "doc_id"
        ).collect()
    }
    assert not out[1]["keep"] and out[1]["dup_2gram_frac"] > 0.9
    assert not out[2]["keep"] and out[2]["top_word_frac"] == 1.0
    assert out[3]["keep"] and out[3]["dup_word_frac"] == 0.0


def test_cross_doc_dupgrams_crafted(spark, crafted_docs):
    """Exact dups score dup_frac 1.0 and are dropped; unique docs keep."""
    from palletjack_spark.functions.dedup import cross_doc_dupgrams

    out = {
        r["doc_id"]: r
        for r in cross_doc_dupgrams(crafted_docs, "text", "doc_id").collect()
    }
    assert out[0]["dup_frac"] == 1.0 and not out[0]["keep"]  # dup of 1
    assert out[3]["dup_frac"] == 1.0 and not out[3]["keep"]  # dup of 4
    assert 5 not in out  # 3 tokens < gram length -> no grams, no row
    # near-dup of 0 shares most but not all 4-gram positions
    assert 0.0 < out[2]["dup_frac"] < 1.0
    # a long unique doc keeps with zero duplicated positions
    uniq = crafted_docs.union(
        crafted_docs.sparkSession.createDataFrame(
            [(9, "entirely novel words nobody else wrote in any other row")],
            "doc_id long, text string",
        )
    )
    out9 = {
        r["doc_id"]: r for r in cross_doc_dupgrams(uniq, "text", "doc_id").collect()
    }[9]
    assert out9["dup_frac"] == 0.0 and out9["keep"]


def test_semantic_dedup_crafted(spark):
    """Same-cluster duplicate drops; cross-cluster duplicate and
    orthogonal same-cluster vectors keep; lowest id survives."""
    from palletjack_spark.functions.similarity import semantic_dedup

    e1 = [1.0] + [0.0] * 7
    e2 = [0.0, 1.0] + [0.0] * 6
    rows = [
        (0, 0, e1),   # keeper
        (1, 0, e1),   # same-cluster dup of 0 -> dropped
        (2, 0, e2),   # same cluster, orthogonal -> kept
        (3, 1, e1),   # dup of 0 but other cluster -> kept (cluster-scoped)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(df, "embedding", "vec_id", "label", tau=0.9).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: True}


def test_badword_stats_crafted(spark):
    from palletjack_spark.functions.text import badword_stats

    df = spark.createDataFrame(
        [(0, "slow slow big dup clean"), (1, "clean words only here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in badword_stats(df, "text", "doc_id").collect()}
    assert out[0]["n_bad"] == 4 and not out[0]["keep"]
    assert out[1]["n_bad"] == 0 and out[1]["keep"] and out[1]["bad_frac"] == 0.0


def test_pq_exhaustive_shortlist_equals_brute_force(spark):
    """pq_topk with shortlist >= corpus degenerates to exact brute force
    (the q92e driver contract)."""
    from palletjack_spark.functions.similarity import pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    pq = pq_topk(emb, queries, k=10, shortlist=1_000_000).toPandas()
    bf = cosine_topk(emb, queries, k=10).toPandas()
    cols = ["query_id", "vec_id", "cosine", "rank"]
    a = pq[cols].sort_values(cols).reset_index(drop=True)
    b = bf[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_pq_realistic_shortlist_recall(spark):
    """PQ at sub-linear settings (shortlist=64 of a 500-row corpus) must
    recall most of the true top-10 — ADC tables are lossy but the exact
    re-score fixes ranking within the shortlist."""
    from palletjack_spark.functions.similarity import pq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    approx = pq_topk(emb, queries, k=10, shortlist=64).toPandas()
    exact = cosine_topk(emb, queries, k=10).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_bpe_replace_composition_is_fixpoint():
    """Q124b declares merge application as THREE composed replace passes;
    property-check (hypothesis) that three leftmost-non-overlapping
    passes reach the fixpoint for any word up to 32 symbols — Python's
    str.replace shares the exact semantics Spark and DuckDB replace use
    (tested side-by-side during round 6)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=400, deadline=None)
    @given(
        st.text(alphabet="abc", min_size=2, max_size=32),
        st.sampled_from([("a", "a"), ("a", "b"), ("b", "c"), ("c", "c")]),
    )
    def check(word, pair):
        x, y = pair
        sym = "|" + "|".join(word) + "|"
        pat, rep = f"|{x}|{y}|", f"|{x}{y}|"
        three = sym.replace(pat, rep).replace(pat, rep).replace(pat, rep)
        assert three.replace(pat, rep) == three, (word, pair, three)

    check()


def test_kmeans_full_convergence_matches_duckdb_unrolling(spark, duck):
    """Round-8 engine-forward hardening (verdict "What's missing" 3):
    the loop-to-fixpoint form of q129 (kmeans_converge) reaches a
    stable assignment on the fixture embeddings and matches a DuckDB
    unrolling of exactly the rounds the loop ran — closing the
    "bounded rounds only" caveat without touching the benched 1-round
    contract."""
    from palletjack_spark.functions.similarity import kmeans_converge
    from palletjack_spark.queries.llm_ops import (
        _KM_GRAPH_SQL,
        _KM_K,
        _KM_SCALE,
        _km_round_sql,
    )
    from palletjack_spark.tables import load_table
    from tests.conftest import SF_DIR

    qv = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> cast(floor(x * {_KM_SCALE}) as bigint))"
        ).alias("qv"),
    )
    assign, rounds = kmeans_converge(spark, qv, k=_KM_K, max_rounds=32)
    assert rounds >= 2, "fixture embeddings must iterate past the benched 1"
    assert rounds < 32, "did not converge within the safety budget"

    got = {
        int(r["vec_id"]): (int(r["cid"]), int(r["dist2"]))
        for r in assign.collect()
    }

    unrolled = ",\n".join(_km_round_sql(r) for r in range(1, rounds + 1))
    sql = f"""
    WITH {_KM_GRAPH_SQL},
    {unrolled}
    SELECT vec_id, CAST(cid AS BIGINT) AS cid, CAST(dist AS BIGINT) AS dist
    FROM m{rounds + 1}
    """
    want = {int(r[0]): (int(r[1]), int(r[2])) for r in duck.execute(sql).fetchall()}
    assert got == want


def test_dup_span_excise_planted(spark):
    """Q152 (Lee et al. span removal) on planted duplicates: shared runs
    merge into maximal spans (overlapping 4-grams coalesce), clean_text
    drops exactly the covered positions, unique docs emit no row, and a
    fully-duplicated doc rewrites to the empty string."""
    from palletjack_spark.functions.dedup import dup_span_excise

    df = spark.createDataFrame(
        [
            (1, "u1 u2 A B C D E u3 u4"),   # shared run at positions 3-7
            (2, "w1 A B C D E w2 w3 w4 w5"),  # same run at positions 2-6
            (3, "x1 x2 x3 x4 x5"),          # unique -> no row
            (4, "P Q R S m1 m2 m3 m4 T U V W"),  # two separated shared runs
            (5, "P Q R S n1 n2 n3 n4 T U V W"),
            (6, "F G H I"),                 # exact dup pair, fully covered
            (7, "F G H I"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_excise(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 4, 5, 6, 7}

    # overlapping 4-grams of the 5-token run merge into ONE span
    assert out[1]["spans_str"] == "3-7"
    assert out[1]["n_spans"] == 1 and out[1]["covered_tokens"] == 5
    assert out[1]["clean_text"] == "u1 u2 u3 u4"
    assert out[2]["spans_str"] == "2-6"
    assert out[2]["clean_text"] == "w1 w2 w3 w4 w5"

    # two separated shared runs stay two spans, numerically ordered
    for d, mids in ((4, "m1 m2 m3 m4"), (5, "n1 n2 n3 n4")):
        assert out[d]["spans_str"] == "1-4,9-12"
        assert out[d]["n_spans"] == 2 and out[d]["covered_tokens"] == 8
        assert out[d]["clean_text"] == mids

    # fully-covered docs rewrite to ''
    for d in (6, 7):
        assert out[d]["spans_str"] == "1-4"
        assert out[d]["covered_tokens"] == 4
        assert out[d]["clean_text"] == ""


def test_cluster_representative_prefers_quality_over_min_id(spark):
    """Q153: the keeper is the highest-QUALITY cluster member (ties to
    the lowest id) — the policy difference vs q101's min-id convention.
    Doc 9 (clean) must beat doc 1 (same content + repetition lowering
    its type-token ratio) despite the higher id; identical-text ties
    keep the lowest id; unclustered docs emit no row."""
    from palletjack_spark.functions.dedup import cluster_representatives

    common = " ".join(f"word{i:02d}" for i in range(24))  # 167 chars, 24 toks
    df = spark.createDataFrame(
        [
            (1, common + " xx xx xx xx xx xx", "s"),  # ttr 25/30 -> 2833
            (9, common, "s"),                         # ttr 1.0   -> 3000
            (20, common + " tail20 tail21", "t"),     # tie pair in block t
            (21, common + " tail20 tail21", "t"),
            (30, "zz " * 40 + "unique solo", "s"),    # no near-dup -> no row
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in cluster_representatives(df, "text", "doc_id", "source").collect()
    }
    assert set(out) == {1, 9, 20, 21}
    assert out[9]["keep"] and not out[1]["keep"]          # quality wins
    assert out[9]["quality"] == 3000 and out[1]["quality"] < 3000
    assert out[1]["component"] == out[9]["component"] == 1
    assert out[20]["keep"] and not out[21]["keep"]        # tie -> lowest id
    assert out[20]["quality"] == out[21]["quality"]


def test_fuzzy_decontaminate_planted(spark):
    """Q154: a train doc that is a light edit of an eval doc is flagged
    with its exact milli-Jaccard; unrelated train docs are not; the
    exact verify keeps precision 1.0 even when banding collides."""
    from palletjack_spark.functions.dedup import fuzzy_decontaminate

    base = " ".join(f"tok{i:03d}" for i in range(60))
    edited = base.replace("tok030", "EDIT") + " suffix"
    train = spark.createDataFrame(
        [(1, edited), (2, "completely different content " * 10)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(train, ev, "text", "doc_id").collect()
    }
    assert set(out) == {1}
    assert out[1]["eval_id"] == 100
    assert 500 <= out[1]["jaccard_milli"] < 1000
    # raising the bar above the pair's true Jaccard drops it — the
    # threshold gates on the EXACT score, not the banding collision
    none = fuzzy_decontaminate(
        train, ev, "text", "doc_id", threshold_milli=1000
    ).collect()
    assert none == []


def test_cluster_representative_rejects_out_of_range_ids(spark):
    """The (quality, id) bigint pack is only injective for ids in
    [0, 2^50); out-of-range ids must raise loudly instead of silently
    corrupting the argmax (round-10 ADVICE)."""
    import pytest

    from palletjack_spark.functions.dedup import cluster_representatives

    common = " ".join(f"word{i:02d}" for i in range(24))
    df = spark.createDataFrame(
        [(2**50, common, "s"), (-3, common + " x", "s")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(Exception, match="2\\^50"):
        cluster_representatives(df, "text", "doc_id", "source").collect()


def test_incremental_dedup_store_lifecycle(spark, tmp_path):
    """Q156's full ingest loop: save store -> dedup batch 1 -> append
    accepted -> dedup batch 2 against the GROWN store.  Decisions match
    a keep-first batch recompute over the union; the manifest versions;
    parameter-mismatched stores are refused."""
    import pytest as _pytest

    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.functions.dedup import (
        append_signatures,
        incremental_dedup,
        load_signature_store,
        save_signature_store,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    rows = [
        (10, base * 4),
        (11, "completely different content about spark engines " * 5),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    store_dir = str(tmp_path / "store")
    save_signature_store(corpus, "text", "doc_id", store_dir)
    store = load_signature_store(spark, store_dir)
    assert store.count() == 2

    # batch 1: one near-dup of doc 10 (light edit), one novel, one
    # within-batch dup of the novel doc (keep-first: 21 keeps, 22 drops)
    b1 = spark.createDataFrame(
        [
            (20, base * 4 + "extra tail words"),
            (21, "fresh unseen prose about metadata indexes " * 5),
            (22, "fresh unseen prose about metadata indexes " * 5 + "x"),
        ],
        "doc_id long, text string",
    )
    dec1, acc1 = incremental_dedup(b1, "text", "doc_id", store)
    got1 = {r["doc_id"]: (r["accepted"], r["dup_of"]) for r in dec1.collect()}
    assert got1[20] == (False, 10)
    assert got1[21] == (True, -1)
    assert got1[22] == (False, 21)
    assert sorted(r["doc_id"] for r in acc1.collect()) == [21]

    # append accepted, version bumps, store grows by exactly the accepted
    assert append_signatures(acc1, store_dir) == 2
    store2 = load_signature_store(spark, store_dir)
    assert store2.count() == 3

    # batch 2: a near-dup of batch-1's ACCEPTED doc now rejects against
    # the grown store — the incremental loop closes
    b2 = spark.createDataFrame(
        [(30, "fresh unseen prose about metadata indexes " * 5 + " tail")],
        "doc_id long, text string",
    )
    dec2, _ = incremental_dedup(b2, "text", "doc_id", store2)
    (r30,) = dec2.collect()
    assert (r30["accepted"], r30["dup_of"]) == (False, 21)

    # a store written under different banding is refused, not misread
    with _pytest.raises(IndexFormatError, match="bands"):
        load_signature_store(spark, store_dir, bands=4, rows=4)
    with _pytest.raises(IndexFormatError, match="not a signature store"):
        load_signature_store(spark, str(tmp_path / "nope"))


def test_sq8_topk_exact_at_full_shortlist_and_recall_realistic(spark):
    """Q92j: with an exhaustive shortlist the SQ8 path is hash-identical
    to brute force (quantization only gates the SHORTLIST; stage 2
    re-ranks in full float); at a realistic shortlist (2-6x k) the
    dequantized-cosine proxy recalls >= 0.95 on the synthetic
    embeddings.  Constant dimensions (span 0) must not produce NaNs."""
    from pyspark.sql import functions as F

    from palletjack_spark.functions.similarity import cosine_topk, sq8_topk
    from palletjack_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    exact_rows = cosine_topk(emb, q, k=10).collect()
    exact = {(r["query_id"], r["vec_id"]) for r in exact_rows}

    full = sq8_topk(emb, q, k=10, shortlist=1_000_000).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact_rows))

    approx = {
        (r["query_id"], r["vec_id"])
        for r in sq8_topk(emb, q, k=10, shortlist=32).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.95

    # constant-dim robustness: append a constant dimension to every row
    emb2 = emb.withColumn(
        "embedding", F.concat("embedding", F.array(F.lit(3.5)))
    )
    q2 = emb2.where(F.col("vec_id") < 3)
    got = sq8_topk(emb2, q2, k=5, shortlist=1_000_000).collect()
    assert len(got) == 15 and all(r["cosine"] == r["cosine"] for r in got)


def test_vector_store_append_incremental_exact(spark, tmp_path, monkeypatch):
    """Round-12 verdict item 4 (q92k): a persisted vector store absorbs
    a new batch with ZERO training jobs (trainers poisoned after the
    base build), the append touches only the new batch (batch=0 files
    byte-untouched, one new batch directory), and a full-probe
    exhaustive-shortlist query across base ∪ append is hash-equal to
    brute force over the union."""
    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 7)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    store = str(tmp_path / "store")
    sim.save_vector_store(base, store, n_centroids=8, layout="slots")

    base_files = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(os.path.join(store, "vectors", "batch=0"))
            for f in fs
        )
    }
    assert base_files

    def _poisoned(*a, **k):
        raise AssertionError("training ran during append")

    monkeypatch.setattr(sim, "_kmeans_cosine", _poisoned)
    monkeypatch.setattr(sim, "_kmeans_l2", _poisoned)
    monkeypatch.setattr(sim, "_train_ivf_pq", _poisoned)
    n = sim.append_vectors(batch, store)
    assert n == batch.count() and n > 0

    # append touched ONLY the new batch: batch=0 is byte-identical and
    # exactly one new batch partition appeared
    assert {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(os.path.join(store, "vectors", "batch=0"))
            for f in fs
        )
    } == base_files
    batches = sorted(
        d for d in os.listdir(os.path.join(store, "vectors"))
        if d.startswith("batch=")
    )
    assert batches == ["batch=0", "batch=1"]
    meta = sim._store_meta(store)
    assert meta["n_batches"] == 2 and len(meta["n_vectors"]) == 2

    queries = emb.where(F.col("vec_id") < 3)
    got = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    bf = cosine_topk(emb, queries, k=5).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )

    # sub-linear settings keep useful recall across base ∪ append
    approx = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=4, shortlist=64
    ).toPandas()
    exact_sets = bf.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_vector_store_validation_and_orphan_batches(spark, tmp_path):
    """The store manifest hard-errors on the q92g/q156 discipline
    violations (quantizer-only sidecar, column mismatch, dim mismatch),
    and an unpublished orphan batch — a crashed append — is invisible to
    queries and overwritten by the next append."""
    import pytest

    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 7)
    batch = emb.where(F.col("vec_id") % 10 == 7)
    queries = emb.where(F.col("vec_id") < 2)

    # a quantizer-only sidecar is not a vector store
    qonly = str(tmp_path / "qonly")
    sim.save_ann_index(base, qonly, n_centroids=8)
    with pytest.raises(ValueError, match="quantizer-only"):
        sim.append_vectors(batch, qonly)
    with pytest.raises(ValueError, match="quantizer-only"):
        sim.vector_store_topk(spark, qonly, queries)

    store = str(tmp_path / "store")
    sim.save_vector_store(base, store, n_centroids=8, layout="slots")
    # column mismatch hard-errors (silent wrong answers otherwise)
    with pytest.raises(ValueError, match="built with columns"):
        sim.append_vectors(batch, store, id_col="other_id")
    # dimension mismatch hard-errors before any executor work
    bad = spark.createDataFrame(
        [(1_000_000, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        sim.append_vectors(bad, store)

    # an orphan batch dir (crashed append: data written, manifest not
    # bumped) is ignored by queries...
    before = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    orphan = os.path.join(store, "vectors", "batch=1")
    spark.createDataFrame(
        [(9_999_999, 0, [0] * 8, [0.0] * 64)],
        "vec_id long, cell int, codes array<int>, vec array<double>",
    ).write.mode("overwrite").parquet(orphan)
    after = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        before[cols].sort_values(cols).reset_index(drop=True),
        after[cols].sort_values(cols).reset_index(drop=True),
    )
    # ...and the next real append overwrites it and publishes
    n = sim.append_vectors(batch, store)
    assert n == batch.count()
    assert sim._store_meta(store)["n_batches"] == 2
    ids = {
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(store, "vectors"))
        .select("vec_id").collect()
    }
    assert 9_999_999 not in ids


def test_sq8_composes_with_mrl_truncation_exact(spark):
    """Round-12 verdict item 7: the q92j docstring's composition claims
    become contracts.  SQ8 over the 32-dim Matryoshka prefix
    (scan_dims=32) with an exhaustive shortlist keeps every candidate in
    stage 1, and the full-dim exact re-rank makes the result
    hash-identical to brute force — the scan pays 4x (int8) x 2x
    (truncation) less bandwidth for free at these settings."""
    from palletjack_spark.functions.similarity import sq8_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    got = sq8_topk(
        emb, queries, k=5, shortlist=1_000_000, scan_dims=32
    ).toPandas()
    bf = cosine_topk(emb, queries, k=5).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )
    # truncated scan at a realistic shortlist still recalls usefully
    approx = sq8_topk(emb, queries, k=5, shortlist=32, scan_dims=32).toPandas()
    exact_sets = bf.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_sq8_composes_with_ivf_cells_exact(spark):
    """SQ8 x IVF: full probe (n_probes == n_centroids) scores every
    cell, so the composition is hash-identical to brute force; partial
    probe restricts the scan to ~p/c of the corpus and still recalls."""
    from palletjack_spark.functions.similarity import sq8_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    got = sq8_topk(
        emb, queries, k=5, shortlist=1_000_000,
        n_centroids=8, n_probes=8,
    ).toPandas()
    bf = cosine_topk(emb, queries, k=5).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )
    approx = sq8_topk(
        emb, queries, k=5, shortlist=64, n_centroids=8, n_probes=4
    ).toPandas()
    exact_sets = bf.groupby("query_id")["vec_id"].apply(set)
    approx_sets = approx.groupby("query_id")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_vector_store_delete_and_compact(spark, tmp_path):
    """q92l: tombstoned deletes are visible the moment the manifest
    lands (no batch rewritten — byte-checked), equal to brute force over
    the survivors at exhaustive settings, and compact_vector_store
    physically drops them (one batch, zero tombstones, same results)."""
    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    store = str(tmp_path / "store")
    sim.save_vector_store(emb, store, n_centroids=8, layout="slots")
    batch0 = {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(os.path.join(store, "vectors", "batch=0"))
            for f in fs
        )
    }
    doomed = emb.where(F.col("vec_id") % 17 == 3)
    n = sim.delete_vectors(doomed, store)
    assert n == doomed.count() and n > 0
    # delete never rewrote a vector batch
    assert {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in sorted(
            os.path.join(r, f)
            for r, _d, fs in os.walk(os.path.join(store, "vectors", "batch=0"))
            for f in fs
        )
    } == batch0

    queries = emb.where(F.col("vec_id") < 3)
    got = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    survivors = emb.where(F.col("vec_id") % 17 != 3)
    bf = cosine_topk(survivors, queries, k=5).toPandas()
    cols = ["query_id", "vec_id", "rank", "cosine"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )
    # deleted ids never appear even at partial probe
    approx = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=4, shortlist=64
    ).toPandas()
    assert not (approx["vec_id"] % 17 == 3).any()

    # compaction: physically drops tombstoned rows, results unchanged
    meta = sim.compact_vector_store(spark, store)
    assert meta["n_batches"] == 1 and meta["n_tombstone_batches"] == 0
    assert not os.path.exists(os.path.join(store, "tombstones"))
    live = spark.read.parquet(os.path.join(store, "vectors"))
    assert live.where(F.col("vec_id") % 17 == 3).count() == 0
    assert live.count() == survivors.count()
    after = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    pd.testing.assert_frame_equal(
        after[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )
    # deleting an absent id is a no-op for results
    sim.delete_vectors(
        spark.createDataFrame([(987654321,)], "vec_id long"), store
    )
    again = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000
    ).toPandas()
    pd.testing.assert_frame_equal(
        again[cols].sort_values(cols).reset_index(drop=True),
        bf[cols].sort_values(cols).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# q157: stupid-backoff bigram LM scoring


def test_bigram_lm_hand_computed_bits(spark):
    """Crafted corpus where every surprisal is hand-computable."""
    from palletjack_spark.functions.text import bigram_lm_score

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame([(10, "a b x")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in bigram_lm_score(train, score, "text", "doc_id").collect()
    }
    r = out[10]
    # train bigrams: (a,b)x3, (b,a)x1, (b,c)x1 -> h1(a)=3, h1(b)=2
    # unigrams: a x3, b x3, c x1 -> total = 7
    # score doc 10: (a,b) seen -> bits = floor(log2(3/3)) = 0
    #              (b,x) unseen, x OOV -> bits = 2 + floor(log2(7/1)) = 4
    assert r["n_bigrams"] == 2
    assert r["total_bits"] == 4
    assert r["n_backoff"] == 1
    assert abs(r["avg_bits"] - 2.0) < 1e-12


def test_bigram_lm_short_docs_have_no_bigrams(spark):
    from palletjack_spark.functions.text import bigram_lm_score

    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "solo"), (11, ""), (12, "a b")], "doc_id long, text string"
    )
    rows = bigram_lm_score(train, score, "text", "doc_id").collect()
    ids = {r["doc_id"] for r in rows}
    # 0- and 1-token docs produce no bigram rows at all
    assert ids == {12}


def test_bigram_lm_backoff_uses_unigram_mass(spark):
    """An unseen bigram of two SEEN words backs off to c2, not OOV."""
    from palletjack_spark.functions.text import bigram_lm_score

    train = spark.createDataFrame(
        [(1, "x y x y x y x y"), (2, "z q")], "doc_id long, text string"
    )
    # bigram (y,z) unseen; z seen once; total = 10 -> 2 + floor(log2(10)) = 5
    score = spark.createDataFrame([(10, "y z")], "doc_id long, text string")
    r = bigram_lm_score(train, score, "text", "doc_id").collect()[0]
    assert r["total_bits"] == 5 and r["n_backoff"] == 1


# ---------------------------------------------------------------------------
# q159: content-defined chunk dedup


def _cdc_bucket(w: str) -> int:
    import hashlib

    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 8


def test_cdc_chunks_split_exactly_at_boundary_tokens(spark):
    from palletjack_spark.functions.dedup import cdc_chunks

    words = [f"tok{i}" for i in range(40)]
    bounds = [i for i, w in enumerate(words) if _cdc_bucket(w) == 0]
    assert bounds, "fixture needs at least one boundary word"
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = cdc_chunks(df, "text", "doc_id").orderBy("chunk_id").collect()
    # reference split in pure python: new chunk at every bucket-0 token
    chunks, cur = [], []
    for w in words:
        if _cdc_bucket(w) == 0:
            if cur:
                chunks.append(cur)
            cur = [w]
        else:
            cur.append(w)
    if cur:
        chunks.append(cur)
    assert [r["n_toks"] for r in rows] == [len(c) for c in chunks]
    import hashlib

    assert [r["chunk_hash"] for r in rows] == [
        hashlib.md5(" ".join(c).encode()).hexdigest() for c in chunks
    ]


def test_cdc_edit_locality(spark):
    """The CDC property: a prepended token only changes chunks up to the
    first boundary — everything after re-aligns and hash-matches."""
    from palletjack_spark.functions.dedup import cdc_chunks

    words = [f"tok{i}" for i in range(60)]
    bounds = [i for i, w in enumerate(words) if _cdc_bucket(w) == 0]
    assert bounds and bounds[0] > 0
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(["inserted"] + words))],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df, "text", "doc_id").collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    # every chunk starting at or after the first boundary is shared;
    # only the head chunk (before bounds[0]) differs
    n_shared_expected = sum(
        1 for i, w in enumerate(words) if _cdc_bucket(w) == 0
    )
    assert len(h1 & h2) == n_shared_expected
    assert len(h1 - h2) == 1 and len(h2 - h1) == 1


def test_cdc_stats_count_within_doc_repeats(spark):
    from palletjack_spark.functions.dedup import cdc_chunk_stats

    # find a boundary word so the repeated passage forms whole chunks;
    # the fillers must NOT be boundaries ("aaa"/"ccc" hash to bucket 4)
    b = next(w for w in (f"w{i}" for i in range(200)) if _cdc_bucket(w) == 0)
    assert _cdc_bucket("aaa") != 0 and _cdc_bucket("ccc") != 0
    passage = f"{b} aaa ccc"
    df = spark.createDataFrame(
        [(1, f"{passage} {passage}")], "doc_id long, text string"
    )
    r = cdc_chunk_stats(df, "text", "doc_id").collect()[0]
    assert r["n_chunks"] == 2 and r["n_dup_chunks"] == 2
    assert r["dup_ratio_milli"] == 1000


def test_cdc_chunking_is_exchange_free(spark):
    from palletjack_spark.functions.dedup import cdc_chunks

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        cdc_chunks(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Window" not in plan, plan


def test_vector_store_filtered_query_exact_and_no_training(
    spark, tmp_path, monkeypatch
):
    """q92m: a filtered store query pre-filters the at-rest codes —
    exact under the filter at exhaustive settings, equal to brute force
    over the filtered corpus, with quantizer training POISONED after the
    base build (a filtered query must never re-train or re-encode)."""
    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    store = str(tmp_path / "store")
    sim.save_vector_store(emb, store, n_centroids=8)

    def _poisoned(*a, **k):  # pragma: no cover - must never run
        raise AssertionError("filtered store query triggered training")

    monkeypatch.setattr(sim, "_kmeans_cosine", _poisoned)
    monkeypatch.setattr(sim, "_kmeans_l2", _poisoned)
    monkeypatch.setattr(sim, "_train_ivf_pq", _poisoned)
    allowed = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    queries = emb.where(F.col("vec_id") < 3)
    got = sim.vector_store_topk(
        spark, store, queries, k=5, n_probes=8, shortlist=1_000_000,
        filter_df=allowed,
    )
    want = sim.cosine_topk(
        emb.join(allowed, "vec_id", "leftsemi"), queries, k=5
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # every returned neighbour satisfies the filter
    assert all(r["vec_id"] % 3 == 0 for r in got.collect())


def test_vector_store_filtered_query_fewer_than_k_survivors(spark, tmp_path):
    """Pre-filter semantics: when fewer than k vectors survive the
    filter, the query returns exactly the survivors — never pads from
    outside the filter (the post-filter failure mode)."""
    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    store = str(tmp_path / "store")
    sim.save_vector_store(emb, store, n_centroids=8)
    allowed = emb.where(F.col("vec_id").isin(11, 12)).select("vec_id")
    queries = emb.where(F.col("vec_id") < 2)
    got = sim.vector_store_topk(
        spark, store, queries, k=10, n_probes=8, shortlist=1_000_000,
        filter_df=allowed,
    ).collect()
    assert {r["vec_id"] for r in got} <= {11, 12}
    for qid in (0, 1):
        assert sum(1 for r in got if r["query_id"] == qid) == 2


# ---------------------------------------------------------------------------
# q92n: JL random-projection two-stage retrieval


def test_jl_project_matches_numpy_sign_product(spark):
    import numpy as np

    from palletjack_spark.functions.similarity import _jl_signs, jl_project

    vec = [float(i % 7) - 3.0 for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<double>"
    )
    got = jl_project(df, 16, 64).collect()[0]["embedding"]
    S = np.array(_jl_signs(16, 64), dtype=np.float64)
    want = S @ np.array(vec)
    assert np.allclose(got, want, rtol=0, atol=1e-12)


def test_jl_exhaustive_shortlist_is_exact(spark):
    """Funnel contract: a shortlist >= corpus makes stage 1 a no-op
    restriction — results identical to brute force."""
    from palletjack_spark.functions.similarity import (
        cosine_topk,
        jl_two_stage_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    got = jl_two_stage_topk(emb, q, k=10, shortlist=1_000_000)
    want = cosine_topk(emb, q, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_jl_realistic_recall_documented_tradeoff(spark):
    """Measured recall on the near-isotropic fixture (see q92n
    docstring): shortlist dominates because JL preserves distances
    without amplifying the fixture's tiny cosine gaps."""
    from palletjack_spark.functions.similarity import (
        cosine_topk,
        jl_two_stage_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    want = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, q, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in jl_two_stage_topk(
            emb, q, k=10, shortlist=100, out_dims=32
        ).collect()
    }
    assert len(got & want) / len(want) >= 0.70


def test_jl_projection_is_exchange_free(spark):
    from palletjack_spark.functions.similarity import jl_project

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = (
        jl_project(emb, 16, 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# q47e: weighted priority sampling


def test_priority_sample_matches_python_reference(spark):
    """Priorities, τ, and the max(w, τ) estimator recomputed in pure
    Python over the same corpus."""
    import hashlib

    from palletjack_spark.queries.registry import REGISTRY

    rows = REGISTRY["q47e_priority_sample"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "n_chars"
    ).collect()

    def prio(doc_id, n_chars):
        hk = int(
            hashlib.md5(f"{doc_id}#prio".encode()).hexdigest()[:15], 16
        )
        w = max(n_chars, 1)
        return round(float(w) / ((float(hk) + 1.0) / float(1 << 60)), 4)

    ref = sorted(
        ((prio(d["doc_id"], d["n_chars"]), d["doc_id"]) for d in docs),
        key=lambda t: (-t[0], t[1]),
    )
    tau = ref[50][0]
    want_ids = [doc_id for _p, doc_id in ref[:50]]
    got = {r["doc_id"]: r for r in rows}
    assert sorted(got) == sorted(want_ids)
    for p, doc_id in ref[:50]:
        assert got[doc_id]["prio"] == p
        assert got[doc_id]["w_est"] == max(float(got[doc_id]["w"]), tau)


def test_priority_sample_degenerate_small_corpus(spark):
    """Corpus <= k: every row selected and w_est == w (τ undefined —
    the greatest() null-skip path on both engines)."""
    from palletjack_spark.queries import registry as reg

    small = spark.createDataFrame(
        [(i, f"doc {i}", "en", "s", 10 + i) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import palletjack_spark.queries.filters as filt

    orig = reg.t
    try:
        reg.t = lambda *_a, **_k: small
        filt.t = reg.t
        rows = reg.REGISTRY["q47e_priority_sample"].fn(spark, SF_DIR).collect()
    finally:
        reg.t = orig
        filt.t = orig
    assert len(rows) == 5
    assert all(r["w_est"] == float(r["w"]) for r in rows)


def test_priority_sample_plan_is_take_ordered(spark):
    """The corpus top-(k+1) must be TakeOrderedAndProject — never a
    global sort or a single-partition window over the corpus."""
    from palletjack_spark.queries.registry import REGISTRY

    plan = (
        REGISTRY["q47e_priority_sample"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


# ---------------------------------------------------------------------------
# q157b: persisted LM count store


def _lm_rows(df):
    return sorted(map(tuple, df.collect()))


def test_lm_store_incremental_equals_batch_retrain(spark, tmp_path):
    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") % 5 == 1)
    delta = docs.where((F.col("doc_id") % 5).isin(2, 3, 4))
    score = docs.where(F.col("doc_id") % 5 == 0)
    store = str(tmp_path / "lm")
    T.save_lm_store(base, "text", "doc_id", store)
    T.append_lm_counts(delta, "text", "doc_id", store)
    got = T.bigram_lm_score_store(spark, score, "text", "doc_id", store)
    want = T.bigram_lm_score(
        docs.where(F.col("doc_id") % 5 != 0), score, "text", "doc_id"
    )
    assert _lm_rows(got) == _lm_rows(want)


def test_lm_store_orphan_batch_invisible_and_compaction_neutral(
    spark, tmp_path
):
    import os

    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") % 5 == 1)
    score = docs.where(F.col("doc_id") % 5 == 0).limit(20)
    store = str(tmp_path / "lm")
    T.save_lm_store(base, "text", "doc_id", store)
    T.append_lm_counts(
        docs.where(F.col("doc_id") % 5 == 2), "text", "doc_id", store
    )
    before = _lm_rows(
        T.bigram_lm_score_store(spark, score, "text", "doc_id", store)
    )
    # a crashed append: batch dir exists, manifest never bumped
    orphan, _ = T._lm_counts(
        docs.where(F.col("doc_id") % 5 == 3), "text", "doc_id"
    )
    orphan.write.mode("overwrite").parquet(
        os.path.join(store, "bigrams", "batch=2")
    )
    assert (
        _lm_rows(T.bigram_lm_score_store(spark, score, "text", "doc_id", store))
        == before
    )
    # compaction folds published batches only, results pinned unchanged
    meta = T.compact_lm_store(spark, store)
    assert meta["n_batches"] == 1
    assert (
        _lm_rows(T.bigram_lm_score_store(spark, score, "text", "doc_id", store))
        == before
    )


def test_lm_store_text_col_mismatch_hard_errors(spark, tmp_path):
    import pytest

    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    store = str(tmp_path / "lm")
    T.save_lm_store(docs, "text", "doc_id", store)
    with pytest.raises(ValueError, match="built over"):
        T.append_lm_counts(docs, "lang", "doc_id", store)


# ---------------------------------------------------------------------------
# q92o: binary-quantized two-stage retrieval


def test_binary_quantize_matches_python_reference(spark):
    from palletjack_spark.functions.similarity import binary_quantize

    vec = [(-1.0) ** i * (0.5 if i != 7 else 0.0) for i in range(64)]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<double>"
    )
    r = binary_quantize(df).collect()[0]
    lo = sum(1 << i for i in range(32) if vec[i] > 0)
    hi = sum(1 << (i - 32) for i in range(32, 64) if vec[i] > 0)
    assert (r["lo"], r["hi"]) == (lo, hi)


def test_bq_exhaustive_shortlist_is_exact(spark):
    from palletjack_spark.functions.similarity import (
        bq_two_stage_topk,
        cosine_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    got = bq_two_stage_topk(emb, q, k=10, shortlist=1_000_000)
    want = cosine_topk(emb, q, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bq_realistic_recall(spark):
    """Measured on the near-isotropic fixture (q92o docstring): 64 sign
    bits beat 16 projected JL floats at the same shortlist."""
    from palletjack_spark.functions.similarity import (
        bq_two_stage_topk,
        cosine_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 20)
    want = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, q, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in bq_two_stage_topk(emb, q, k=10, shortlist=100).collect()
    }
    assert len(got & want) / len(want) >= 0.75


def test_bq_packing_is_exchange_free(spark):
    from palletjack_spark.functions.similarity import binary_quantize

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = (
        binary_quantize(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# q101b: incremental connected components


def test_incremental_components_bridge_merges_old_components(spark):
    """The case dup_of alone cannot handle: a new node bridging two OLD
    components must merge them — and the fold must equal batch CC."""
    from palletjack_spark.functions.dedup import (
        connected_components,
        incremental_components,
    )

    old_labels = spark.createDataFrame(
        [(10, 10), (11, 10), (20, 20), (21, 20)], "node long, component long"
    )
    # new doc 30 matches one member of EACH old component
    matches = spark.createDataFrame(
        [(30, 11), (30, 21)], "doc_id long, pj_oid long"
    )
    got = {
        r["node"]: r["component"]
        for r in incremental_components(matches, old_labels).collect()
    }
    # batch truth: edges (10-11),(20-21),(30-11),(30-21) -> one component, min 10
    batch_pairs = spark.createDataFrame(
        [(11, 10), (21, 20), (30, 11), (30, 21)], "id_a long, id_b long"
    )
    want = {
        r["node"]: r["component"]
        for r in connected_components(batch_pairs).collect()
    }
    assert got == want
    assert set(got.values()) == {10}


def test_incremental_components_untouched_labels_survive(spark):
    from palletjack_spark.functions.dedup import incremental_components

    old_labels = spark.createDataFrame(
        [(10, 10), (11, 10), (50, 50), (51, 50)], "node long, component long"
    )
    matches = spark.createDataFrame(
        [(99, 11)], "doc_id long, pj_oid long"
    )
    got = {
        r["node"]: r["component"]
        for r in incremental_components(matches, old_labels).collect()
    }
    # the 50-component is untouched; 99 joins the 10-component
    assert got[50] == 50 and got[51] == 50
    assert got[99] == 10 and got[10] == 10 and got[11] == 10


def test_incremental_components_new_only_edges(spark):
    """Edges entirely within the new batch (no old labels at all) form
    fresh components with min-id canonical labels."""
    from palletjack_spark.functions.dedup import incremental_components

    old_labels = spark.createDataFrame(
        [], "node long, component long"
    )
    matches = spark.createDataFrame(
        [(7, 3), (9, 7)], "doc_id long, pj_oid long"
    )
    got = {
        r["node"]: r["component"]
        for r in incremental_components(matches, old_labels).collect()
    }
    assert got == {3: 3, 7: 3, 9: 3}


def test_stratified_priority_sample_per_stratum_contract(spark):
    """q47f: per-lang k cap, per-stratum tau, degenerate strata return
    all members with w_est == w; plan keeps the WindowGroupLimit."""
    from palletjack_spark.queries.registry import REGISTRY

    df = REGISTRY["q47f_stratified_priority_sample"].fn(spark, SF_DIR)
    # the rank<=11 filter plans as WindowGroupLimit; the query's
    # localCheckpoint hides it from the FINAL plan, so assert on the
    # pre-checkpoint shape
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents")
    win = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    pre = (
        docs.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= 11)
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    docs = load_table(spark, SF_DIR, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, rs in by_lang.items():
        assert len(rs) == min(10, sizes[lang])
        if sizes[lang] <= 10:
            assert all(r["w_est"] == float(r["w"]) for r in rs)
        else:
            assert all(r["w_est"] >= float(r["w"]) for r in rs)


def test_signature_store_orphan_batch_invisible_and_compaction(spark, tmp_path):
    """Round-12 crash-publication fix: a crashed append's batch dir is
    invisible until the manifest lands, legacy flat stores hard-error,
    and compaction is result-neutral."""
    import os

    import pytest

    from palletjack_spark.errors import IndexFormatError
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "sig")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 5 == 1), "text", "doc_id", store
    )
    D.append_signatures(
        D._signatures_one_shuffle(
            docs.where(F.col("doc_id") % 5 == 2), "text", "doc_id"
        ),
        store,
    )
    before = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    # crashed append: batch dir exists, manifest never bumped
    D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 5 == 3), "text", "doc_id"
    ).write.mode("overwrite").parquet(
        os.path.join(store, "signatures", "batch=2")
    )
    after = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    assert after == before
    meta = D.compact_signature_store(spark, store)
    assert meta["n_batches"] == 1
    assert (
        sorted(
            r["doc_id"] for r in D.load_signature_store(spark, store).collect()
        )
        == before
    )
    # legacy flat layout hard-errors
    import json

    legacy = str(tmp_path / "legacy")
    os.makedirs(legacy)
    m = D._sig_meta("doc_id", D.MINHASH_K, D.LSH_BANDS, D.LSH_ROWS)
    del m["n_batches"]
    m["layout"] = "flat"
    with open(os.path.join(legacy, D._SIG_META_NAME), "w") as f:
        json.dump(m, f)
    with pytest.raises(IndexFormatError, match="legacy flat layout"):
        D.load_signature_store(spark, legacy)


def test_binary_quantize_dim_parameter(spark):
    """Round-12 ADVICE: fold bounds derive from ``in_dims`` — short
    vectors pack no phantom bits (and no ANSI ARRAY_INDEX error), >64
    dims is a hard error instead of silent truncation."""
    from palletjack_spark.functions.similarity import binary_quantize

    vec40 = [(-1.0) ** i for i in range(40)]
    df = spark.createDataFrame(
        [(1, vec40)], "vec_id long, embedding array<double>"
    )
    r = binary_quantize(df, in_dims=40).collect()[0]
    assert r["lo"] == sum(1 << i for i in range(32) if vec40[i] > 0)
    assert r["hi"] == sum(1 << (i - 32) for i in range(32, 40) if vec40[i] > 0)

    vec20 = [1.0] * 20
    df20 = spark.createDataFrame(
        [(7, vec20)], "vec_id long, embedding array<double>"
    )
    r20 = binary_quantize(df20, in_dims=20).collect()[0]
    assert (r20["lo"], r20["hi"]) == ((1 << 20) - 1, 0)

    with pytest.raises(ValueError, match="at most 64"):
        binary_quantize(df, in_dims=65)


def test_bigram_lm_cache_bounded_to_last_invocation(spark):
    """Round-12 ADVICE: the LM count-table caches no longer accumulate —
    each invocation evicts the previous pair, bounding executor storage
    at one table pair regardless of how many times q157/q157b/q160 run."""
    from palletjack_spark.functions import text as T

    train = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string"
    )
    score = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    T.bigram_lm_score(train, score, "text", "doc_id").collect()
    first = list(T._LM_CACHES)
    assert len(first) == 2 and all(df.storageLevel.useMemory for df in first)
    # a DIFFERENT train corpus: same-plan re-caching would mask the
    # eviction (Spark's CacheManager keys on the logical plan)
    train2 = spark.createDataFrame(
        [(3, "p q r p q")], "doc_id long, text string"
    )
    T.bigram_lm_score(train2, score, "text", "doc_id").collect()
    assert all(not df.storageLevel.useMemory for df in first)
    assert len(T._LM_CACHES) == 2


def test_q157b_second_invocation_reuses_store(spark, monkeypatch):
    """Round-12 ADVICE: the q157b readiness check matches the build
    path's 3 published batches, so a second invocation must reuse the
    fingerprinted store instead of silently rebuilding it."""
    from palletjack_spark.functions import text as T
    from palletjack_spark.queries import REGISTRY

    q = REGISTRY["q157b_incremental_lm_score"].fn
    want = _lm_rows(q(spark, SF_DIR))

    def _boom(*a, **k):
        raise AssertionError("store rebuilt — readiness check failed")

    monkeypatch.setattr(T, "save_lm_store", _boom)
    monkeypatch.setattr(T, "append_lm_counts", _boom)
    assert _lm_rows(q(spark, SF_DIR)) == want


def test_signature_compaction_crash_window_recovers(spark, tmp_path, monkeypatch):
    """Round-12 ADVICE: compaction must never have a state where the
    live dataset dir is gone AND the only copy sits in a temp dir the
    next compaction deletes.  Inject a crash between the aside-rename
    and the promote-rename; the store must still read (recovery renames
    the aside back) and a subsequent compaction must succeed, all
    result-neutral."""
    import os

    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "sig")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 5 == 1), "text", "doc_id", store,
        layout="batched",
    )
    D.append_signatures(
        D._signatures_one_shuffle(
            docs.where(F.col("doc_id") % 5 == 2), "text", "doc_id"
        ),
        store,
    )
    want = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )

    real_replace = os.replace

    def crash_before_promote(src, dst):
        if "_compact_tmp" in str(src) and str(dst).endswith("signatures"):
            raise OSError("injected crash before promote")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_before_promote)
    with pytest.raises(OSError, match="injected crash"):
        D.compact_signature_store(spark, store)
    monkeypatch.setattr(os, "replace", real_replace)

    # mid-swap state: live dir absent, data set ASIDE — readers recover
    assert not os.path.exists(os.path.join(store, "signatures"))
    assert os.path.exists(os.path.join(store, "signatures.old.tmp"))
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    assert got == want
    # and the next compaction completes and stays result-neutral
    meta = D.compact_signature_store(spark, store)
    assert meta["n_batches"] == 1
    assert not os.path.exists(os.path.join(store, "signatures.old.tmp"))
    assert (
        sorted(
            r["doc_id"] for r in D.load_signature_store(spark, store).collect()
        )
        == want
    )


def test_lm_compaction_partial_swap_is_readable(spark, tmp_path, monkeypatch):
    """Two-dataset stores (LM bigrams + unigrams): a crash after the
    FIRST dataset promoted but before the second leaves one compacted
    and one set aside — reads must recover the aside and score
    identically (compaction is count-preserving, so the compacted
    dataset under the OLD manifest reads batch=0 = the full table)."""
    import os

    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") % 5 == 1)
    delta = docs.where(F.col("doc_id") % 5 == 2)
    score = docs.where(F.col("doc_id") % 5 == 0)
    store = str(tmp_path / "lm")
    T.save_lm_store(base, "text", "doc_id", store, layout="slots")
    T.append_lm_counts(delta, "text", "doc_id", store)
    want = _lm_rows(
        T.bigram_lm_score_store(spark, score, "text", "doc_id", store)
    )

    real_replace = os.replace

    def crash_before_second_promote(src, dst):
        if "_compact_tmp" in str(src) and str(dst).endswith("unigrams"):
            raise OSError("injected crash before second promote")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_before_second_promote)
    with pytest.raises(OSError, match="injected crash"):
        T.compact_lm_store(spark, store)
    monkeypatch.setattr(os, "replace", real_replace)

    # bigrams promoted (compacted batch=0), unigrams aside, manifest OLD
    assert T._lm_meta(store)["n_batches"] == 2
    assert os.path.exists(os.path.join(store, "unigrams.old.tmp"))
    got = _lm_rows(
        T.bigram_lm_score_store(spark, score, "text", "doc_id", store)
    )
    assert got == want
    meta = T.compact_lm_store(spark, store)
    assert meta["n_batches"] == 1
    assert _lm_rows(
        T.bigram_lm_score_store(spark, score, "text", "doc_id", store)
    ) == want


def test_itq_rotation_is_orthogonal_and_deterministic(spark):
    """q92p: the learned ITQ rotation is a true rotation (R Rᵀ = I) and
    deterministic — two independent learns on the same corpus agree."""
    import numpy as np

    from palletjack_spark.functions.similarity import itq_rotation

    emb = load_table(spark, SF_DIR, "embeddings")
    mu1, R1 = itq_rotation(emb, iters=20)
    mu2, R2 = itq_rotation(emb, iters=20)
    assert np.allclose(R1 @ R1.T, np.eye(64), atol=1e-9)
    assert np.array_equal(R1, R2) and np.array_equal(mu1, mu2)


def test_itq_persisted_rotation_loads_without_training(
    spark, tmp_path, monkeypatch
):
    """q92q (round 14): the persisted ITQ sidecar round-trips exactly —
    a store query encodes bit-identically to the inline train (doubles
    round-trip parquet exactly), with ZERO training jobs on the load
    path (trainer poisoned), and version/shape/column mismatches
    hard-error instead of silently rotating with the wrong artifact."""
    import json
    import os

    import numpy as np
    import pytest

    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    side = str(tmp_path / "itq")
    mu0, R0 = sim.save_itq_rotation(emb, side)

    inline = sorted(
        tuple(r)
        for r in sim.itq_bq_topk(emb, queries, k=10, shortlist=30).collect()
    )

    def _poisoned(*a, **k):
        raise AssertionError("ITQ training ran on the load path")

    monkeypatch.setattr(sim, "itq_rotation", _poisoned)
    mu, R, meta = sim.load_itq_rotation(spark, side)
    assert np.array_equal(mu, mu0) and np.array_equal(R, R0)  # exact
    stored = sorted(
        tuple(r)
        for r in sim.itq_bq_topk_store(
            emb, queries, side, k=10, shortlist=30
        ).collect()
    )
    assert stored == inline  # bit-identical funnel over the frozen R

    # column mismatch hard-errors
    with pytest.raises(ValueError, match="trained with columns"):
        sim.itq_bq_topk_store(emb, queries, side, id_col="other_id")
    # dimension mismatch hard-errors
    narrow = emb.select("vec_id", F.slice("embedding", 1, 8).alias("embedding"))
    with pytest.raises(ValueError, match="-dim"):
        sim.itq_bq_topk_store(narrow, narrow, side)
    # version mismatch hard-errors
    mpath = os.path.join(side, "_itq_meta.json")
    with open(mpath) as f:
        m = json.load(f)
    m["format_version"] = 99
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format_version"):
        sim.load_itq_rotation(spark, side)
    # torn artifact (declared shape disagrees with the rows) hard-errors
    m["format_version"] = 1
    m["dim"] = m["dim"] + 7
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="torn"):
        sim.load_itq_rotation(spark, side)


def test_itq_sidecar_composes_with_a_vector_store(spark, tmp_path):
    """The ITQ sidecar (itq/ + _itq_meta.json) and the IVF-PQ vector
    store (vectors/ + quantizers/ + _ann_meta.json) can share ONE store
    path — a production corpus ships all its retrieval tiers from one
    directory.  Both query paths must work and neither manifest may
    clobber the other."""
    import json
    import os

    import palletjack_spark.functions.similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.where(F.col("vec_id") < 3)
    store = str(tmp_path / "combo")
    sim.save_vector_store(emb, store, n_centroids=8)
    sim.save_itq_rotation(emb, store)
    # both manifests coexist
    with open(os.path.join(store, "_ann_meta.json")) as f:
        assert json.load(f)["n_batches"] == 1
    with open(os.path.join(store, "_itq_meta.json")) as f:
        assert json.load(f)["code_bits"] == 64
    # both query tiers answer from the same path, both exact at
    # exhaustive settings — hash-equal to brute force and to each other
    brute = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in cosine_topk(emb, queries, k=5).collect()
    )
    pq_rows = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in sim.vector_store_topk(
            spark, store, queries, k=5, n_probes=8, shortlist=1_000_000,
        ).collect()
    )
    itq_rows = sorted(
        (r["query_id"], r["vec_id"], r["rank"])
        for r in sim.itq_bq_topk_store(
            emb, queries, store, k=5, shortlist=1_000_000
        ).collect()
    )
    assert pq_rows == brute and itq_rows == brute


def test_itq_rotation_rejects_unpackable_code_widths(spark):
    """Round-14 ADVICE: itq_rotation validated only that vectors are
    wide enough, not that ``in_dims`` fits the two-BIGINT packing that
    binary_quantize gates at 64 — in_dims > 64 reached itq_encode's
    int64 shifts of 63+ positions (numpy overflow + silent bit
    aliasing → garbage Hamming codes).  Must be a typed error."""
    import pytest

    from palletjack_spark.functions.similarity import itq_rotation

    emb = load_table(spark, SF_DIR, "embeddings")
    for bad in (0, -1, 65, 128):
        with pytest.raises(ValueError, match="64 code bits"):
            itq_rotation(emb, in_dims=bad)


def test_itq_exhaustive_shortlist_is_exact(spark):
    """q92p driver discipline: with the shortlist exhaustive the funnel
    is hash-identical to brute force while every ITQ stage executes."""
    from palletjack_spark.functions.similarity import cosine_topk, itq_bq_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    want = sorted(
        tuple(r) for r in cosine_topk(emb, q, k=10).collect()
    )
    got = sorted(
        tuple(r)
        for r in itq_bq_topk(emb, q, k=10, shortlist=1_000_000).collect()
    )
    assert got == want


def test_itq_recall_lift_over_identity_bq(spark):
    """q92p's reason to exist: at the same 30-candidate shortlist the
    learned rotation recalls MORE of the true top-10 than identity
    sign bits (docstring pins 0.478 → 0.594 over all 500 queries; this
    50-query slice asserts the lift with a margin)."""
    from palletjack_spark.functions.similarity import (
        bq_two_stage_topk,
        cosine_topk,
        itq_bq_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 50)
    want = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, q, k=10).collect()
    }
    ident = {
        (r["query_id"], r["vec_id"])
        for r in bq_two_stage_topk(emb, q, k=10, shortlist=30).collect()
    }
    itq = {
        (r["query_id"], r["vec_id"])
        for r in itq_bq_topk(emb, q, k=10, shortlist=30).collect()
    }
    r_ident = len(ident & want) / len(want)
    r_itq = len(itq & want) / len(want)
    assert r_itq >= r_ident + 0.05, (r_ident, r_itq)


def test_cdc_bounded_chunking_is_exchange_free(spark):
    """q159b inherits q159's zero-exchange plan: the min/max state rides
    the same row-local fold."""
    from palletjack_spark.functions.dedup import cdc_chunks_bounded

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        cdc_chunks_bounded(df, "text", "doc_id", min_len=2, max_len=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Window" not in plan, plan


def test_append_after_compaction_crash_recovers_first(spark, tmp_path, monkeypatch):
    """Review finding (round 13): an APPEND arriving right after a
    compaction crash in the rename window must recover the set-aside
    data before writing — otherwise it recreates the dataset dir with
    only its own batch, readers skip recovery forever, and the next
    compaction deletes the aside (silent loss of every prior batch)."""
    import os

    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "sig")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 5 == 1), "text", "doc_id", store,
        layout="batched",
    )
    old_ids = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )

    real_replace = os.replace

    def crash_before_promote(src, dst):
        if "_compact_tmp" in str(src) and str(dst).endswith("signatures"):
            raise OSError("injected crash before promote")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_before_promote)
    with pytest.raises(OSError, match="injected crash"):
        D.compact_signature_store(spark, store)
    monkeypatch.setattr(os, "replace", real_replace)
    assert not os.path.exists(os.path.join(store, "signatures"))

    # the very next operation is an APPEND, not a read
    new_sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 5 == 2), "text", "doc_id"
    )
    D.append_signatures(new_sig, store)
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    new_ids = sorted(r["doc_id"] for r in new_sig.select("doc_id").collect())
    assert got == sorted(old_ids + new_ids)  # nothing lost
    assert not os.path.exists(os.path.join(store, "signatures.old.tmp"))


def test_concurrent_signature_appends_lose_nothing(spark, tmp_path):
    """Round-13 multi-writer contract: N threads appending to one store
    concurrently — every batch publishes exactly once, no rows lost, no
    slots clobbered (the single-writer path would have two writers both
    land batch=N and silently drop one)."""
    import threading

    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "mw")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store
    )
    slices = [
        D._signatures_one_shuffle(
            docs.where(F.col("doc_id") % 7 == m), "text", "doc_id"
        )
        for m in range(1, 5)
    ]
    slots, errs = [], []

    def run(sig):
        try:
            slots.append(D.append_signatures_concurrent(sig, store))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(slots) == [1, 2, 3, 4]  # every slot claimed exactly once
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 4).select("doc_id").collect()
    )
    assert got == want


def test_concurrent_vector_appends_lose_nothing(spark, tmp_path):
    """Round-14 (r13 gap #3): CAS multi-writer appends were wired to
    the signature store only — N threads appending encoded batches to
    ONE vector store must each publish exactly one slot, with the
    manifest's per-batch ``n_vectors`` ledger consistent and every id
    queryable afterwards."""
    import json
    import threading

    import palletjack_spark.functions.similarity as sim
    from palletjack_spark.functions import store as S

    emb = load_table(spark, SF_DIR, "embeddings")
    store = str(tmp_path / "mwvec")
    sim.save_vector_store(
        emb.where(F.col("vec_id") % 7 == 0), store, n_centroids=8,
        layout="slots",
    )
    slices = [emb.where(F.col("vec_id") % 7 == m) for m in range(1, 5)]
    slots, errs = [], []

    def run(batch):
        try:
            slots.append(sim.append_vectors_concurrent(batch, store))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(slots) == [1, 2, 3, 4]  # every slot claimed exactly once
    with open(os.path.join(store, "_ann_meta.json")) as f:
        meta = json.load(f)
    assert int(meta["n_batches"]) == 5
    # the per-slot row ledger matches what each writer actually landed
    want_ids = sorted(
        r["vec_id"]
        for r in emb.where(F.col("vec_id") % 7 <= 4).select("vec_id").collect()
    )
    assert sum(meta["n_vectors"]) == len(want_ids)
    got_ids = sorted(
        r["vec_id"]
        for r in S.live_batches(spark, store, "vectors", meta["n_batches"])
        .select("vec_id")
        .collect()
    )
    assert got_ids == want_ids  # nothing lost, nothing doubled


def test_concurrent_lm_appends_lose_nothing(spark, tmp_path):
    """Round-14 (r13 gap #3): N threads merging count deltas into ONE
    LM store — both tables of each batch publish in one manifest
    commit, and the summed live tables equal a one-shot count over the
    union corpus (counts are additive, so multi-writer ≡ sequential)."""
    import json
    import threading

    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "mwlm")
    T.save_lm_store(docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store)
    slices = [docs.where(F.col("doc_id") % 7 == m) for m in range(1, 5)]
    slots, errs = [], []

    def run(batch):
        try:
            slots.append(
                T.append_lm_counts_concurrent(batch, "text", "doc_id", store)
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(slots) == [1, 2, 3, 4]
    with open(os.path.join(store, "_lm_meta.json")) as f:
        assert int(json.load(f)["n_batches"]) == 5
    big, uni = T.load_lm_tables(spark, store)
    ref_big, ref_uni = T._lm_counts(
        docs.where(F.col("doc_id") % 7 <= 4), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )


def test_vector_and_lm_store_epoch_replays_are_noops(spark, tmp_path):
    """Round-14: the at-least-once-replay epoch guard is shared by all
    three incremental stores (store.epoch_seen/record_epoch) — a
    replayed epoch must not double-publish a vector batch or
    double-count LM deltas."""
    import json

    import palletjack_spark.functions.similarity as sim
    from palletjack_spark.functions import text as T

    # vector store
    emb = load_table(spark, SF_DIR, "embeddings")
    vstore = str(tmp_path / "epvec")
    sim.save_vector_store(emb.where(F.col("vec_id") % 5 == 0), vstore, n_centroids=8)
    batch = emb.where(F.col("vec_id") % 5 == 1)
    n = sim.append_vectors(batch, vstore, epoch="e:0")
    assert n == batch.count() > 0
    with open(os.path.join(vstore, "_ann_meta.json")) as f:
        before = json.load(f)
    assert before["epochs"] == ["e:0"]
    assert sim.append_vectors(batch, vstore, epoch="e:0") == 0  # replay
    with open(os.path.join(vstore, "_ann_meta.json")) as f:
        assert json.load(f) == before  # manifest byte-identical
    assert sim.append_vectors(batch, vstore, epoch="e:1") == n  # next epoch

    # LM store
    docs = load_table(spark, SF_DIR, "documents")
    lstore = str(tmp_path / "eplm")
    T.save_lm_store(docs.where(F.col("doc_id") % 5 == 0), "text", "doc_id", lstore)
    lbatch = docs.where(F.col("doc_id") % 5 == 1)
    T.append_lm_counts(lbatch, "text", "doc_id", lstore, epoch="e:0")
    big1, uni1 = T.load_lm_tables(spark, lstore)
    snap = (
        sorted(tuple(r) for r in big1.collect()),
        sorted(tuple(r) for r in uni1.collect()),
    )
    T.append_lm_counts(lbatch, "text", "doc_id", lstore, epoch="e:0")  # replay
    big2, uni2 = T.load_lm_tables(spark, lstore)
    assert (
        sorted(tuple(r) for r in big2.collect()),
        sorted(tuple(r) for r in uni2.collect()),
    ) == snap  # no double-counted deltas
    with open(os.path.join(lstore, "_lm_meta.json")) as f:
        assert json.load(f)["n_batches"] == 2


def test_cas_append_multi_partial_rename_crash_is_invisible(
    spark, tmp_path, monkeypatch
):
    """cas_append_multi renames one staged dir per dataset; the renames
    are not one atomic step.  A crash BETWEEN them (bigrams renamed,
    unigrams not) must leave only unpublished batch=N orphans — readers
    see the old state, and the next (healthy) append overwrites the
    orphan and publishes both tables in one commit."""
    import os as _os

    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "mwcrash")
    T.save_lm_store(docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store, layout="slots")
    big0, uni0 = T.load_lm_tables(spark, store)
    before = (
        sorted(tuple(r) for r in big0.collect()),
        sorted(tuple(r) for r in uni0.collect()),
    )

    real_replace = _os.replace
    state = {"renames": 0}

    def crash_on_second_batch_rename(src, dst):
        if "batch=1" in str(dst):
            state["renames"] += 1
            if state["renames"] == 2:
                raise OSError("injected crash between dataset renames")
        real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crash_on_second_batch_rename)
    batch = docs.where(F.col("doc_id") % 7 == 1)
    with pytest.raises(OSError, match="injected crash"):
        T.append_lm_counts_concurrent(batch, "text", "doc_id", store)
    monkeypatch.setattr(_os, "replace", real_replace)

    # the manifest never advanced: readers see exactly the old state
    big1, uni1 = T.load_lm_tables(spark, store)
    assert (
        sorted(tuple(r) for r in big1.collect()),
        sorted(tuple(r) for r in uni1.collect()),
    ) == before
    # the next healthy append overwrites the orphan and publishes both
    slot = T.append_lm_counts_concurrent(batch, "text", "doc_id", store)
    assert slot == 1
    big2, uni2 = T.load_lm_tables(spark, store)
    ref_big, ref_uni = T._lm_counts(
        docs.where(F.col("doc_id") % 7 <= 1), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big2.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni2.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )


def test_cas_append_stolen_claim_never_double_publishes(
    spark, tmp_path, monkeypatch
):
    """Round-14 ADVICE: writer A stalls past the claim TTL between its
    batch rename and its manifest commit; thief B steals the claim,
    clobbers A's renamed-but-unpublished batch and publishes its own
    rows at that slot.  A must detect the stolen claim (nonce
    mismatch), NOT commit slot N, re-stage its rows and publish them at
    a fresh slot — previously both writers returned "success" while
    A's rows were silently gone."""
    import os as _os
    import shutil as _shutil

    from palletjack_spark.functions import dedup as D
    from palletjack_spark.functions import store as S

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "steal")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store,
        layout="batched",
    )
    a_sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 1), "text", "doc_id"
    )
    b_sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 2), "text", "doc_id"
    )
    claim = _os.path.join(store, "signatures", ".claim-1")
    slot1 = _os.path.join(store, "signatures", "batch=1")
    real_replace = _os.replace
    state = {"fired": False}

    def replace_with_thief(src, dst):
        real_replace(src, dst)
        # fire exactly once, on A's stage->batch=1 rename (manifest
        # commits also use os.replace; they must pass through)
        if state["fired"] or not str(dst).endswith("batch=1"):
            return
        state["fired"] = True
        monkeypatch.setattr(_os, "replace", real_replace)
        # thief B (A "stalled past the TTL"): overwrite the claim with
        # B's nonce, clobber A's unpublished batch, publish B's rows
        with open(claim, "w") as f:
            f.write("thief-nonce")
        _shutil.rmtree(dst)
        b_sig.write.mode("overwrite").parquet(dst)
        meta = S.load_manifest(store, D._SIG_META_NAME)
        meta["version"] = int(meta.get("version", 1)) + 1
        meta["n_batches"] = 2
        S.commit_manifest(store, D._SIG_META_NAME, meta)

    monkeypatch.setattr(_os, "replace", replace_with_thief)
    slot = D.append_signatures_concurrent(a_sig, store)
    assert state["fired"]
    assert slot == 2  # A retried a fresh slot, never committed slot 1
    meta = S.load_manifest(store, D._SIG_META_NAME)
    assert int(meta["n_batches"]) == 3
    # B's rows live at slot 1, A's at slot 2 — nothing lost, nothing
    # double-published
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 2).select("doc_id").collect()
    )
    assert got == want
    b_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(slot1).select("doc_id").collect()
    )
    assert b_ids == sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 == 2).select("doc_id").collect()
    )
    # A must NOT have unlinked the stolen claim — it belongs to B now
    with open(claim) as f:
        assert f.read() == "thief-nonce"


def test_round13_functions_guards(spark, tmp_path):
    """Round-13 review sweep over the functions modules: misuse and
    degenerate inputs fail loudly (or behave) instead of crashing raw
    or silently voiding documented guarantees."""
    import pytest

    from palletjack_spark.functions import dedup as D
    from palletjack_spark.functions import graph as G
    from palletjack_spark.functions import similarity as S
    from palletjack_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    # simhash_pairs: pigeonhole needs blocks > max_hamming
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_pairs(docs, "text", "doc_id", max_hamming=4, blocks=4)
    # badwords: quote-bearing entries parse (the LDNOOBW shape), empty
    # blocklist means nothing is bad
    rows = T.badword_stats(
        spark.createDataFrame(
            [(1, "don't stop don't")], "doc_id long, text string"
        ),
        "text",
        "doc_id",
        words=("don't",),
    ).collect()
    assert rows[0]["n_bad"] == 2
    empty_rows = T.badword_stats(docs, "text", "doc_id", words=()).collect()
    assert all(r["n_bad"] == 0 for r in empty_rows)
    # empty corpus: typed errors, not numpy AxisError
    emb_empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        S.ivf_topk(emb_empty, emb_empty)
    one_q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="empty"):
        S.sq8_topk(emb_empty, one_q, n_centroids=2)
    # ...and empty QUERY sets fail typed at the shared collector
    with pytest.raises(ValueError, match="no query vectors"):
        S.sq8_topk(one_q, emb_empty)
    # n_probes without n_centroids would silently full-scan
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="n_probes without n_centroids"):
        S.sq8_topk(emb, emb.limit(1), n_probes=2)
    # empty graph: empty ranks, no ZeroDivisionError
    empty_nodes = spark.createDataFrame([], "node long")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert G.pagerank_converge(empty_edges, empty_nodes).count() == 0
    # reserved-name collision on cross_doc_dupgrams' own output columns
    from palletjack_spark.errors import InvalidSelectionError as _ISE

    with pytest.raises(Exception, match="reserved|keep"):
        D.cross_doc_dupgrams(
            docs.withColumnRenamed("doc_id", "keep"), "text", id_col="keep"
        )


def test_compact_signature_store_with_nondefault_params(spark, tmp_path):
    """Round-13 review: compaction is parameter-agnostic — it must load
    the store with its OWN manifest params, not the session defaults."""
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents").limit(40)
    store = str(tmp_path / "npstore")
    D.save_signature_store(
        docs, "text", "doc_id", store, k=8, bands=4, rows=2
    )
    before = sorted(
        r["doc_id"]
        for r in D.load_signature_store(
            spark, store, k=8, bands=4, rows=2
        ).collect()
    )
    meta = D.compact_signature_store(spark, store)
    assert meta["n_batches"] == 1
    after = sorted(
        r["doc_id"]
        for r in D.load_signature_store(
            spark, store, k=8, bands=4, rows=2
        ).collect()
    )
    assert after == before


def test_itq_pca_handles_wide_embeddings(spark):
    """Round-13 runway item 5: production embeddings are wider than the
    64 code bits — itq_rotation PCA-projects to the code width first
    (the full Gong-Lazebnik recipe, folded into one rectangular
    rotation so the encode stays a single centered matmul).  On a
    600×256 anisotropic synthetic (exponentially decaying spectrum):
    sign(first 64 dims) 0.32, sign(PCA-64) 0.29, PCA-ITQ 0.66 recall@10
    at shortlist 30 — pinned here with a margin via the Spark funnel on
    a 50-query slice."""
    import hashlib

    import numpy as np

    from palletjack_spark.functions.similarity import (
        cosine_topk,
        itq_bq_topk,
        itq_rotation,
    )

    seed = int(hashlib.md5(b"pj-256").hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    n, d = 600, 256
    scales = np.exp(-np.arange(d) / 40.0)
    M = rng.standard_normal((n, d)) * scales
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in M[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    q = df.where(F.col("vec_id") < 50)

    # the learned rotation is rectangular (256 -> 64) and orthonormal
    mu, R = itq_rotation(df, in_dims=64, iters=25)
    assert R.shape == (256, 64)
    assert np.allclose(R.T @ R, np.eye(64), atol=1e-9)

    want = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, q, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in itq_bq_topk(df, q, k=10, shortlist=30, iters=25).collect()
    }
    assert len(got & want) / len(want) >= 0.5  # vs ~0.32 for raw signs

    # exhaustive shortlist stays exactly brute force at 256 dims too
    exact = sorted(
        tuple(r)
        for r in itq_bq_topk(
            df, q.limit(3), k=5, shortlist=1_000_000, iters=25
        ).collect()
    )
    brute = sorted(
        tuple(r) for r in cosine_topk(df, q.limit(3), k=5).collect()
    )
    assert exact == brute
