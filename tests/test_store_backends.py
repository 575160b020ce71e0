"""Round-15: the claim-backend seam of the multi-writer store protocol
(functions/store.py) — the same stress suite that proved the POSIX
O_EXCL path must hold behind a conditional-PUT backend (the object-store
deployment shape, where O_EXCL does not exist), plus the per-rename
ownership / displaced-slot guarantees added for the round-14 ADVICE
silent-content-swap window."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from palletjack_spark.functions import store as S
from palletjack_spark.tables import load_table
from tests.conftest import SF_DIR


BACKENDS = {
    "posix": lambda: S.PosixClaimBackend(),
    "conditional_put": lambda: S.ConditionalPutClaimBackend(),
}


@pytest.fixture(params=sorted(BACKENDS))
def claims(request):
    return BACKENDS[request.param]()


def test_claim_backend_contract(claims, tmp_path):
    """Both backends implement the same primitive: create-if-absent
    (second create loses), read returns value+age, conditional delete
    only fires on a matching value."""
    key = str(tmp_path / "c" / ".claim-0")
    os.makedirs(os.path.dirname(key), exist_ok=True)
    assert claims.read(key) is None
    assert claims.try_create(key, "a") is True
    assert claims.try_create(key, "b") is False  # PUT-if-absent: 412
    value, age = claims.read(key)
    assert value == "a" and age >= 0.0
    claims.delete(key, expected="b")  # wrong holder: no-op
    assert claims.read(key)[0] == "a"
    claims.delete(key, expected="a")
    assert claims.read(key) is None
    claims.delete(key)  # idempotent on a missing key


def test_claim_backend_create_race_single_winner(claims, tmp_path):
    """N threads racing try_create on one key: exactly one wins — the
    serialization property the whole slot protocol rests on."""
    key = str(tmp_path / "r" / ".claim-0")
    os.makedirs(os.path.dirname(key), exist_ok=True)
    wins = []
    barrier = threading.Barrier(8)

    def run(i):
        barrier.wait()
        if claims.try_create(key, f"w{i}"):
            wins.append(i)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert claims.read(key)[0] == f"w{wins[0]}"


def test_concurrent_signature_appends_through_backend(
    spark, tmp_path, claims
):
    """The round-13 no-lost-batches stress test, parameterized over the
    claim backend: 4 threads appending to one signature store through a
    conditional-PUT claim must behave exactly like the O_EXCL path —
    every slot claimed once, no rows lost."""
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
            slots.append(
                D.append_signatures_concurrent(sig, store, claims=claims)
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
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 4)
        .select("doc_id")
        .collect()
    )
    assert got == want


@pytest.mark.parametrize("layout", ["slots", "objects"])
def test_concurrent_lm_appends_through_backend(spark, tmp_path, claims, layout):
    """The multi-dataset (bigrams+unigrams, one counter) stress shape
    through both backends — and through BOTH data layouts (round 16:
    the rename-free object layout must satisfy the same no-lost-batch
    contract as the slot layout)."""
    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "mwlm")
    T.save_lm_store(
        docs.where(F.col("doc_id") % 5 == 0), "text", "doc_id", store,
        layout=layout,
    )
    slices = [docs.where(F.col("doc_id") % 5 == m) for m in range(1, 4)]
    slots, errs = [], []

    def run(batch):
        try:
            slots.append(
                T.append_lm_counts_concurrent(
                    batch, "text", "doc_id", store, claims=claims
                )
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run, args=(s,)) for s in slices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(slots) == [1, 2, 3]
    with open(os.path.join(store, "_lm_meta.json")) as f:
        assert int(json.load(f)["n_batches"]) == 4
    big, uni = T.load_lm_tables(spark, store)
    ref_big, ref_uni = T._lm_counts(
        docs.where(F.col("doc_id") % 5 <= 3), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )


def test_stale_claim_steal_through_fake_backend(spark, tmp_path):
    """A crashed writer's claim (older than the TTL) is stolen through
    the conditional-PUT backend too — and the steal is CONDITIONAL on
    the observed value, so it can never delete a fresh claim that
    replaced the stale one in between."""
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "steal")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store,
        layout="batched",
    )
    claims = S.ConditionalPutClaimBackend()
    # a crashed writer left a claim on slot 1, backdated past the TTL
    key = os.path.join(store, "signatures", ".claim-1")
    assert claims.try_create(key, "crashed-writer")
    import time as _time

    with claims._lock:
        claims._kv[key] = (
            "crashed-writer",
            _time.monotonic() - S._CLAIM_TTL_S - 1.0,
        )
    sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 1), "text", "doc_id"
    )
    slot = D.append_signatures_concurrent(sig, store, claims=claims)
    assert slot == 1  # the stale claim was stolen, not waited out
    assert claims.read(key) is None  # and released after the commit
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 1)
        .select("doc_id")
        .collect()
    )
    assert got == want


def test_recover_dataset_restores_displaced_slot(spark, tmp_path):
    """A writer that crashed between setting ``batch=K`` aside and
    renaming its replacement in leaves the slot ABSENT with the
    previous (published) content under ``.displaced-batch=K`` — the
    reader-side recovery must restore it (round-15: the rename-aside
    loss path's crash window)."""
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "disp")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store,
        layout="batched",
    )
    sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 1), "text", "doc_id"
    )
    D.append_signatures(sig, store)
    before = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    # simulate the crash: published batch=1 displaced, slot left absent
    live = os.path.join(store, "signatures", "batch=1")
    aside = os.path.join(store, "signatures", ".displaced-batch=1")
    os.replace(live, aside)
    assert not os.path.exists(live)
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    assert got == before  # the read healed the slot
    assert os.path.isdir(live) and not os.path.exists(aside)


def test_displaced_aside_with_live_slot_is_left_alone(spark, tmp_path):
    """An aside whose slot EXISTS is a live writer's in-flight swap (or
    a winner's pre-cleanup garbage) — recovery must not clobber the
    live slot with it."""
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "noclobber")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store,
        layout="batched",
    )
    aside = os.path.join(store, "signatures", ".displaced-batch=0")
    os.makedirs(aside)
    with open(os.path.join(aside, "junk"), "w") as f:
        f.write("x")
    before = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    S.recover_dataset(store, "signatures")
    after = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    assert after == before
    assert os.path.isdir(aside)  # untouched, just invisible


def test_lost_claim_mid_loop_withdraws_and_restores_displaced(
    spark, tmp_path, monkeypatch
):
    """Round-15 ADVICE (the medium finding): writer A loses its claim
    BETWEEN the per-dataset renames of a multi-dataset append, after
    displacing existing slot content that the stealer then PUBLISHES.
    The pre-rename ownership check must stop A before it touches the
    second dataset's slot; the loss path must withdraw A's rows from
    the slot it already took and RESTORE the displaced content (the old
    rmtree path destroyed it — the silent content swap); then A
    republishes everything at a fresh slot."""
    from palletjack_spark.functions import text as T

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "midloop")
    T.save_lm_store(
        docs.where(F.col("doc_id") % 5 == 0), "text", "doc_id", store,
        layout="slots",
    )
    # pre-existing slot-1 content from a DIFFERENT writer (slice %5==2),
    # which the thief will publish as-is by committing n_batches=2 —
    # A displaces it, so the restore must bring back exactly these rows
    other = docs.where(F.col("doc_id") % 5 == 2)
    obig, ouni = T._lm_counts(other, "text", "doc_id")
    obig.write.mode("overwrite").parquet(
        os.path.join(store, "bigrams", "batch=1")
    )
    ouni.write.mode("overwrite").parquet(
        os.path.join(store, "unigrams", "batch=1")
    )
    probe = os.path.join(store, "bigrams", "batch=1", "_probe")
    with open(probe, "w") as f:
        f.write("displaced-and-restored")

    claims = S.ConditionalPutClaimBackend()
    key = os.path.join(store, "bigrams", ".claim-1")
    real_replace = os.replace
    state = {"fired": False}

    def steal_after_first_slot_rename(src, dst):
        real_replace(src, dst)
        if state["fired"] or not str(dst).endswith(
            os.path.join("bigrams", "batch=1")
        ):
            return
        state["fired"] = True
        # A stalled past the TTL right here: the thief steals the claim
        # and publishes slot 1 (believing its content is the %5==2 rows
        # that were there before A's rename)
        claims.delete(key)
        assert claims.try_create(key, "thief")
        meta = S.load_manifest(store, T._LM_META_NAME)
        meta["n_batches"] = 2
        S.commit_manifest(store, T._LM_META_NAME, meta)

    monkeypatch.setattr(os, "replace", steal_after_first_slot_rename)
    batch = docs.where(F.col("doc_id") % 5 == 1)
    slot = T.append_lm_counts_concurrent(
        batch, "text", "doc_id", store, claims=claims
    )
    monkeypatch.setattr(os, "replace", real_replace)
    assert state["fired"]
    assert slot == 2  # A never committed the lost slot 1
    # the restore brought the displaced content back (probe travelled
    # with it): the thief's published slot 1 holds the %5==2 rows, not
    # A's — no silent content swap
    assert os.path.exists(probe)
    meta = S.load_manifest(store, T._LM_META_NAME)
    assert int(meta["n_batches"]) == 3
    big_live, uni_live = T.load_lm_tables(spark, store)
    ref_big, ref_uni = T._lm_counts(
        docs.where(F.col("doc_id") % 5 <= 2), "text", "doc_id"
    )
    assert sorted(tuple(r) for r in big_live.collect()) == sorted(
        tuple(r) for r in ref_big.collect()
    )
    assert sorted(tuple(r) for r in uni_live.collect()) == sorted(
        tuple(r) for r in ref_uni.collect()
    )
    # the thief's claim survived A's conditional release
    assert claims.read(key)[0] == "thief"


def test_reader_recovery_racing_writer_swap_is_retried(
    spark, tmp_path, monkeypatch
):
    """A reader's recover_dataset that runs BETWEEN a writer's two slot
    renames sees slot-absent + aside-present — the crash signature — and
    restores the aside out from under the live writer.  The writer's
    stage->target rename then fails; it must re-displace and retry
    (bounded), publishing normally instead of dying with a raw OSError
    mid-append."""
    from palletjack_spark.functions import dedup as D

    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "race")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store,
        layout="batched",
    )
    # plant an unpublished orphan at slot 1 so the writer has to displace
    orphan = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 3), "text", "doc_id"
    )
    orphan.write.mode("overwrite").parquet(
        os.path.join(store, "signatures", "batch=1")
    )

    real_replace = os.replace
    state = {"fired": False}

    def reader_races_the_swap(src, dst):
        real_replace(src, dst)
        if state["fired"] or not str(dst).endswith(".displaced-batch=1"):
            return
        state["fired"] = True
        # the racing reader: slot absent, aside present -> restore
        S.recover_dataset(store, "signatures")
        assert os.path.exists(os.path.join(store, "signatures", "batch=1"))

    monkeypatch.setattr(os, "replace", reader_races_the_swap)
    sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 1), "text", "doc_id"
    )
    slot = D.append_signatures_concurrent(sig, store)
    monkeypatch.setattr(os, "replace", real_replace)
    assert state["fired"]
    assert slot == 1  # published at the claimed slot despite the race
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 1)
        .select("doc_id")
        .collect()
    )
    assert got == want  # the orphan never leaked into the published rows


@pytest.mark.parametrize("backend", sorted(BACKENDS))
def test_cas_same_epoch_parallel_race_publishes_once(
    spark, tmp_path, backend
):
    """Round-15 epoch extension to the CAS path: two writers carrying
    the SAME epoch (a speculatively retried micro-batch racing its own
    first attempt) must publish exactly once — the loser sees the epoch
    in the fresh manifest on its next claim attempt and returns -1."""
    from palletjack_spark.functions import dedup as D

    claims = BACKENDS[backend]()
    docs = load_table(spark, SF_DIR, "documents")
    store = str(tmp_path / "eporace")
    D.save_signature_store(
        docs.where(F.col("doc_id") % 7 == 0), "text", "doc_id", store
    )
    sig = D._signatures_one_shuffle(
        docs.where(F.col("doc_id") % 7 == 1), "text", "doc_id"
    )
    results, errs = [], []
    barrier = threading.Barrier(2)

    def run():
        try:
            barrier.wait()
            results.append(
                D.append_signatures_concurrent(
                    sig, store, claims=claims, epoch="e:0"
                )
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert sorted(results) == [-1, 1]  # one published, one no-op'd
    meta = S.load_manifest(store, D._SIG_META_NAME)
    assert int(meta["n_batches"]) == 2
    assert meta["epochs"] == ["e:0"]
    got = sorted(
        r["doc_id"] for r in D.load_signature_store(spark, store).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 <= 1)
        .select("doc_id")
        .collect()
    )
    assert got == want  # the batch landed exactly once
    # a later sequential replay of the same epoch is also a no-op
    assert (
        D.append_signatures_concurrent(sig, store, claims=claims, epoch="e:0")
        == -1
    )
