"""Round-16 (verdict item 6): the rename-free OBJECT data layout
(store.cas_append_objects / live_object_batches / compact_objects /
sweep_orphan_objects) — batches land once at immutable object dirs, the
manifest lists them, and the fenced generation commit is the only
synchronization.  No os.replace exists anywhere on this data path, so
the reader-visible displaced-slot transient of the slot layout cannot
occur by construction.

Protocol-level tests drive a pyarrow-backed DataFrame stand-in (no
Spark job per append); the Spark-facing LM-store integration rides the
parameterized stress suite in test_store_backends.py and the
end-to-end test at the bottom here."""

from __future__ import annotations

import glob
import json
import os
import threading
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palletjack_spark.functions import store as S
from palletjack_spark.tables import load_table
from tests.conftest import SF_DIR

MANIFEST = "meta.json"


class FakeDF:
    def __init__(self, writer: str, seq: int):
        self._tbl = pa.table({"writer": [writer], "seq": [seq]})

    @property
    def write(self):
        return self

    def mode(self, _mode):
        return self

    def parquet(self, path: str):
        os.makedirs(path, exist_ok=True)
        pq.write_table(self._tbl, os.path.join(path, "part-0.parquet"))


BACKENDS = {
    "posix": lambda: S.PosixClaimBackend(),
    "conditional_put": lambda: S.ConditionalPutClaimBackend(),
}


@pytest.fixture(params=sorted(BACKENDS))
def claims(request):
    return BACKENDS[request.param]()


def _new_store(tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)
    S.commit_manifest(store, MANIFEST, {"n_batches": 0, "objects": {}})
    return store


def _append(store, writer, seq, claims, epoch=None):
    def update(meta, n):
        meta[f"slot{n}"] = f"{writer}:{seq}"

    return S.cas_append_objects(
        {"data": FakeDF(writer, seq)},
        store,
        MANIFEST,
        update,
        claims=claims,
        epoch=epoch,
    )


def _read_listed(store, meta):
    con = duckdb.connect()
    try:
        rows = set()
        for rel in meta["objects"].get("data", []):
            rows |= {
                tuple(r)
                for r in con.execute(
                    "select writer, seq from read_parquet(?)",
                    [os.path.join(store, "data", rel, "*.parquet")],
                ).fetchall()
            }
        return rows
    finally:
        con.close()


def test_object_append_and_listed_read(tmp_path, claims):
    store = _new_store(tmp_path)
    assert _append(store, "a", 0, claims) == 0
    assert _append(store, "b", 1, claims) == 1
    meta = S.load_manifest(store, MANIFEST)
    assert meta["n_batches"] == 2 and meta["commit_gen"] == 2
    assert len(meta["objects"]["data"]) == 2
    assert _read_listed(store, meta) == {("a", 0), ("b", 1)}
    assert meta["slot0"] == "a:0" and meta["slot1"] == "b:1"


def test_contended_object_appends_lose_nothing(tmp_path, claims):
    """8 threads race the fence on one store: every batch publishes
    exactly once, slots are globally unique, objects all listed."""
    store = _new_store(tmp_path)
    slots, errs = [], []

    def run(i):
        try:
            slots.append(_append(store, f"w{i}", i, claims))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(slots) == list(range(8))
    meta = S.load_manifest(store, MANIFEST)
    assert meta["n_batches"] == 8
    assert len(meta["objects"]["data"]) == 8
    assert _read_listed(store, meta) == {(f"w{i}", i) for i in range(8)}
    # and no unreferenced object dirs exist (every write published)
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "data", "obj-*"))
    }
    assert on_disk == set(meta["objects"]["data"])


def test_replayed_epoch_drops_its_objects(tmp_path, claims):
    store = _new_store(tmp_path)
    assert _append(store, "w", 0, claims, epoch="e1") == 0
    before = set(glob.glob(os.path.join(store, "data", "obj-*")))
    assert _append(store, "w", 0, claims, epoch="e1") == -1
    after = set(glob.glob(os.path.join(store, "data", "obj-*")))
    assert after == before  # the replay's object write was removed
    assert S.load_manifest(store, MANIFEST)["n_batches"] == 1


def test_sweep_removes_only_unreferenced_and_aged(tmp_path, claims):
    store = _new_store(tmp_path)
    _append(store, "w", 0, claims)
    # a crashed append: object written, never committed
    orphan = os.path.join(store, "data", "obj-deadbeef")
    FakeDF("crashed", 9).parquet(orphan)
    # age guard: a fresh orphan (a live append mid-flight) is kept
    assert S.sweep_orphan_objects(store, MANIFEST, "data", claims=claims) == []
    assert os.path.isdir(orphan)
    # aged orphan: swept; the listed object survives any age
    old = time.time() - 10_000
    os.utime(orphan, (old, old))
    removed = S.sweep_orphan_objects(
        store, MANIFEST, "data", min_age_s=3600, claims=claims
    )
    assert removed == ["obj-deadbeef"]
    meta = S.load_manifest(store, MANIFEST)
    assert _read_listed(store, meta) == {("w", 0)}


def test_compact_objects_collapses_and_guards(tmp_path, claims):
    store = _new_store(tmp_path)
    for i in range(3):
        _append(store, "w", i, claims)
    meta = S.load_manifest(store, MANIFEST)
    out = S.compact_objects(
        store,
        MANIFEST,
        dict(meta, n_batches=1),
        {"data": FakeDF("compacted", 99)},
        claims=claims,
    )
    assert len(out["objects"]["data"]) == 1
    assert out["commit_gen"] == meta["commit_gen"] + 1
    # superseded objects deleted; exactly the new one remains
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "data", "obj-*"))
    }
    assert on_disk == set(out["objects"]["data"])
    assert _read_listed(store, out) == {("compacted", 99)}
    # a stale-manifest compaction is refused
    with pytest.raises(RuntimeError, match="advanced past"):
        S.compact_objects(
            store,
            MANIFEST,
            dict(meta, n_batches=1),  # pre-compaction commit_gen
            {"data": FakeDF("x", 0)},
            claims=claims,
        )
    # appends continue after compaction
    assert _append(store, "w", 42, claims) == 1


def test_concurrent_commit_fails_compaction_not_data(tmp_path):
    """An append racing a compaction loses no data: the fence rejects
    the compaction with an error, its staged object is dropped, and the
    append's commit stands."""
    store = _new_store(tmp_path)
    base = S.ConditionalPutClaimBackend()
    _append(store, "w", 0, base)
    meta = S.load_manifest(store, MANIFEST)
    fired = {"done": False}

    class AppendWinsTheFence(S.ConditionalPutClaimBackend):
        def __init__(self, inner):
            super().__init__()
            self._kv = inner._kv
            self._lock = inner._lock

        def try_create(self, key, value):
            if ".gen-" in os.path.basename(key) and not fired["done"]:
                fired["done"] = True
                _append(store, "racer", 7, base)  # sneaks in first
            return super().try_create(key, value)

    with pytest.raises(RuntimeError, match="concurrent commit"):
        S.compact_objects(
            store,
            MANIFEST,
            dict(meta, n_batches=1),
            {"data": FakeDF("compacted", 0)},
            claims=AppendWinsTheFence(base),
        )
    assert fired["done"]
    fresh = S.load_manifest(store, MANIFEST)
    assert fresh["n_batches"] == 2
    assert _read_listed(store, fresh) == {("w", 0), ("racer", 7)}
    # the refused compaction's staged object was dropped
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(store, "data", "obj-*"))
    }
    assert on_disk == set(fresh["objects"]["data"])


def test_lm_store_object_layout_end_to_end(spark, tmp_path):
    """The LM store through the object layout: save → append →
    replayed-epoch no-op → load equals the slot-layout result →
    compaction preserves it and collapses the listing."""
    from palletjack_spark.functions import text as T
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    obj_store = str(tmp_path / "obj")
    slot_store = str(tmp_path / "slot")
    base = docs.where(F.col("doc_id") % 4 == 0)
    batch = docs.where(F.col("doc_id") % 4 == 1)
    T.save_lm_store(base, "text", "doc_id", obj_store, layout="objects")
    T.save_lm_store(base, "text", "doc_id", slot_store)
    assert json.load(open(os.path.join(obj_store, "_lm_meta.json")))[
        "layout"
    ] == "objects"
    T.append_lm_counts(batch, "text", "doc_id", obj_store, epoch="e1")
    T.append_lm_counts(batch, "text", "doc_id", obj_store, epoch="e1")  # replay
    T.append_lm_counts(batch, "text", "doc_id", slot_store)

    def counts(store):
        big, uni = T.load_lm_tables(spark, store)
        return (
            sorted(tuple(r) for r in big.collect()),
            sorted(tuple(r) for r in uni.collect()),
        )

    assert counts(obj_store) == counts(slot_store)
    before = counts(obj_store)
    T.compact_lm_store(spark, obj_store)
    meta = json.load(open(os.path.join(obj_store, "_lm_meta.json")))
    assert len(meta["objects"]["bigrams"]) == 1
    assert len(meta["objects"]["unigrams"]) == 1
    assert counts(obj_store) == before
    # and the store still appends after compaction
    more = docs.where(F.col("doc_id") % 4 == 2)
    T.append_lm_counts_concurrent(more, "text", "doc_id", obj_store)
    big, _ = T.load_lm_tables(spark, obj_store)
    ref_big, _ = T._lm_counts(
        docs.where(F.col("doc_id") % 4 <= 2), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )


def test_vector_store_object_layout_end_to_end(spark, tmp_path):
    """The VECTOR store through the object layout (two independent
    counters — vectors and tombstones — each listing its own objects):
    save → append → replayed-epoch no-op → concurrent append → delete →
    top-k identical to the slot layout → compaction collapses the
    listing, drops tombstones, and the store keeps working."""
    import json as _json

    from pyspark.sql import functions as F

    from palletjack_spark.functions import similarity as SIM

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    stores = {}
    for layout in ("slots", "objects"):
        p = str(tmp_path / layout)
        SIM.save_vector_store(base, p, layout=layout)
        assert SIM.append_vectors(b1, p, epoch="e1") > 0
        assert SIM.append_vectors(b1, p, epoch="e1") == 0  # replay no-op
        SIM.append_vectors_concurrent(b2, p)
        SIM.delete_vectors(
            emb.where(F.col("vec_id") % 10 == 0).select("vec_id"), p
        )
        stores[layout] = p

    q = emb.where(F.col("vec_id") < 5)

    def topk(p):
        out = SIM.vector_store_topk(spark, p, q, k=5).toPandas()
        cols = sorted(out.columns)
        return sorted(map(tuple, out[cols].itertuples(index=False)))

    assert topk(stores["slots"]) == topk(stores["objects"])

    before = topk(stores["objects"])
    SIM.compact_vector_store(spark, stores["objects"])
    meta = _json.load(
        open(os.path.join(stores["objects"], "_ann_meta.json"))
    )
    assert len(meta["objects"]["vectors"]) == 1
    assert "tombstones" not in meta["objects"]
    assert meta["n_tombstone_batches"] == 0
    assert topk(stores["objects"]) == before
    # the store keeps appending and deleting after compaction
    assert SIM.append_vectors(b1, stores["objects"]) > 0
    assert SIM.delete_vectors(
        emb.where(F.col("vec_id") % 7 == 0).select("vec_id"),
        stores["objects"],
    ) > 0


def test_signature_store_object_layout_end_to_end(spark, tmp_path):
    """The SIGNATURE store (the third store instance) through the
    object layout: save → append → replayed-epoch no-op → concurrent
    append → identical membership to the batched layout → compaction
    collapses the listing and the store keeps appending."""
    import json as _json

    from pyspark.sql import functions as F

    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    stores = {}
    for layout in ("batched", "objects"):
        p = str(tmp_path / layout)
        D.save_signature_store(
            docs.where(F.col("doc_id") % 4 == 0), "text", "doc_id", p,
            layout=layout,
        )
        sig1 = D._signatures_one_shuffle(
            docs.where(F.col("doc_id") % 4 == 1), "text", "doc_id"
        )
        v = D.append_signatures(sig1, p, epoch="e1")
        assert D.append_signatures(sig1, p, epoch="e1") == v  # replay
        sig2 = D._signatures_one_shuffle(
            docs.where(F.col("doc_id") % 4 == 2), "text", "doc_id"
        )
        D.append_signatures_concurrent(sig2, p)
        stores[layout] = p

    def ids(p):
        return sorted(
            r["doc_id"]
            for r in D.load_signature_store(spark, p)
            .select("doc_id")
            .collect()
        )

    assert ids(stores["batched"]) == ids(stores["objects"])
    before = ids(stores["objects"])
    D.compact_signature_store(spark, stores["objects"])
    meta = _json.load(
        open(os.path.join(stores["objects"], "_sig_meta.json"))
    )
    assert len(meta["objects"]["signatures"]) == 1
    assert ids(stores["objects"]) == before
    sig3 = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 4 == 3), "text", "doc_id"
    )
    D.append_signatures(sig3, stores["objects"])
    assert len(ids(stores["objects"])) > len(before)
