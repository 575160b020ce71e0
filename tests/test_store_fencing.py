"""Round-16: fenced manifest commits (functions/store.py).

The round-15 protocol re-verified claim ownership before the commit but
the commit itself was an unconditional rename — a writer that stalled
past the TTL between that check and ``commit_manifest`` could still
publish, so a stalled loser and its stealer could BOTH commit slot N
(the documented check-to-commit window).  Round 16 makes the commit an
atomic create-if-absent of a monotone generation key through the claim
backend (``store._fenced_commit``): exactly one writer can ever hold a
generation, so the double-commit is pinned here as an IMPOSSIBLE state.

These tests drive the protocol with a pyarrow-backed stand-in for the
one DataFrame method it calls (``.write.mode("overwrite").parquet``) —
no Spark job per append, so the interleavings stay fast and exact.
"""

from __future__ import annotations

import glob
import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from palletjack_spark.functions import store as S

MANIFEST = "meta.json"


class FakeDF:
    """Duck-typed stand-in for the single DataFrame call the store
    protocol makes: ``df.write.mode("overwrite").parquet(dir)``."""

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


def _new_store(tmp_path, name="store"):
    store = str(tmp_path / name)
    os.makedirs(store)
    S.commit_manifest(store, MANIFEST, {"n_batches": 1})
    FakeDF("seed", 0).parquet(os.path.join(store, "data", "batch=0"))
    return store


def _record(meta, n):
    meta[f"slot{n}"] = meta.get("_writer_tag", "?")


def _append(store, writer, seq, claims, epoch=None, tag=None):
    def update(meta, n):
        meta[f"slot{n}"] = tag or writer

    return S.cas_append(
        FakeDF(writer, seq),
        store,
        MANIFEST,
        "data",
        update,
        claims=claims,
        epoch=epoch,
    )


def _rows(store):
    con = duckdb.connect()
    try:
        return {
            (w, s)
            for w, s in con.execute(
                "select writer, seq from read_parquet(?, hive_partitioning=true)",
                [os.path.join(store, "data", "batch=*", "*.parquet")],
            ).fetchall()
        }
    finally:
        con.close()


BACKENDS = {
    "posix": lambda: S.PosixClaimBackend(),
    "conditional_put": lambda: S.ConditionalPutClaimBackend(),
}


@pytest.fixture(params=sorted(BACKENDS))
def claims(request):
    return BACKENDS[request.param]()


def test_stalled_loser_never_commits_a_stolen_slot(tmp_path):
    """THE fence test: writer A stalls past the TTL in the exact
    check-to-commit window (after its last ownership check, before its
    commit); a thief steals the claim, swaps its own rows into the
    slot, and commits generation 1.  Under the round-15 protocol A's
    unconditional commit then overwrote the thief's manifest (slot-1
    metadata paired with the thief's rows).  Now A's generation create
    FAILS, it withdraws without touching the thief's slot, and
    republishes at slot 2 — the thief's commit is untouched."""
    store = _new_store(tmp_path)
    fired = {"done": False}
    data = os.path.join(store, "data")

    class StolenAtCommit(S.ConditionalPutClaimBackend):
        def try_create(self, key, value):
            if ".gen-" in os.path.basename(key) and not fired["done"]:
                fired["done"] = True
                # A stalled >TTL right here.  The thief: steals the
                # claim, displaces A's renamed rows, places its own,
                # and commits generation 1 for slot 1.
                claim = os.path.join(data, ".claim-1")
                super().delete(claim)
                assert super().try_create(claim, "thief-nonce")
                slot = os.path.join(data, "batch=1")
                os.replace(slot, os.path.join(data, ".displaced-batch=1"))
                FakeDF("thief", 100).parquet(slot)
                with open(os.path.join(slot, "_writer"), "w") as f:
                    f.write("thief-nonce")
                thief_meta = {
                    "n_batches": 2,
                    "slot1": "thief",
                    "commit_gen": 1,
                }
                assert super().try_create(key, json.dumps(thief_meta))
                S.commit_manifest(store, MANIFEST, thief_meta)
            return super().try_create(key, value)

    claims = StolenAtCommit()
    slot = _append(store, "loser", 1, claims, tag="loser")
    assert fired["done"]
    assert slot == 2  # A republished at a fresh slot, never slot 1

    meta = S.load_manifest(store, MANIFEST)
    assert meta["n_batches"] == 3
    assert meta["slot1"] == "thief"  # the stolen slot's commit survived
    assert meta["slot2"] == "loser"
    assert meta["commit_gen"] == 2
    # and the thief's ROWS still sit at its slot — A's withdraw saw a
    # foreign _writer marker and never touched it
    assert ("thief", 100) in _rows(store)
    assert ("loser", 1) in _rows(store)


def test_crashed_unmirrored_commit_is_durable_and_repaired(
    tmp_path, monkeypatch, claims
):
    """A writer that crashes between winning the generation key and the
    reader mirror has COMMITTED: the next append's loop-head repair
    mirrors the generation (so a replay of the same epoch no-ops with
    -1) and appends after it."""
    store = _new_store(tmp_path)
    real_commit = S.commit_manifest

    def crash_on_mirror(store_dir, name, meta):
        if meta.get("commit_gen"):  # only the fenced mirror, not setup
            raise OSError("simulated crash before the reader mirror")
        real_commit(store_dir, name, meta)

    monkeypatch.setattr(S, "commit_manifest", crash_on_mirror)
    with pytest.raises(OSError, match="simulated crash"):
        _append(store, "w1", 1, claims, epoch="e1")
    monkeypatch.setattr(S, "commit_manifest", real_commit)

    # the plain manifest is behind the committed chain
    assert S.load_manifest(store, MANIFEST)["n_batches"] == 1
    # a replayed micro-batch sees the DURABLE commit via repair: no-op
    assert _append(store, "w1", 1, claims, epoch="e1") == -1
    meta = S.load_manifest(store, MANIFEST)
    assert meta["n_batches"] == 2 and meta["slot1"] == "w1"
    # and a fresh append lands after the repaired slot
    assert _append(store, "w2", 2, claims, epoch="e2") == 2
    meta = S.load_manifest(store, MANIFEST)
    assert meta["n_batches"] == 3 and meta["commit_gen"] == 2
    assert _rows(store) >= {("w1", 1), ("w2", 2)}


def test_stalled_repairer_mirror_cannot_fork_the_chain(tmp_path):
    """Round-16 ADVICE regression: a repairer that read an old
    generation's committed meta, stalled past the GC ring, and then
    mirrored could roll the plain manifest back behind the GC window —
    the next repair then read a GC'd generation key, mis-took the stale
    manifest for the chain head, and ``_fenced_commit`` RE-CREATED a
    deleted generation key, forking the chain and dropping every commit
    in the lost generations.  The mirror is now monotone, so the
    rollback (the fork's only entry point) is impossible."""
    store = _new_store(tmp_path)
    claims = S.PosixClaimBackend()
    assert _append(store, "w", 0, claims) == 1  # commits generation 1
    # a repairer reads generation 1's committed meta ... then stalls
    stalled = json.loads(claims.read(S._gen_key(store, MANIFEST, 1))[0])
    # ... while the chain advances far past the GC ring
    n = S._GEN_RING + 6
    for i in range(1, n):
        assert _append(store, "w", i, claims) == 1 + i
    head = S.load_manifest(store, MANIFEST)
    assert head["commit_gen"] == n
    assert claims.read(S._gen_key(store, MANIFEST, 2)) is None  # GC'd
    # the stalled repairer finally mirrors: monotone -> no rollback
    S._mirror_manifest_monotone(store, MANIFEST, stalled)
    assert S.load_manifest(store, MANIFEST) == head
    # the chain continues from the true head; nothing was forked
    assert _append(store, "w", n, claims) == n + 1
    meta = S.load_manifest(store, MANIFEST)
    assert meta["commit_gen"] == n + 1 and meta["n_batches"] == n + 2


def test_generation_keys_are_gc_bounded(tmp_path):
    """One generation key per commit, one delete per commit: the set on
    disk never grows past the ring."""
    store = _new_store(tmp_path)
    claims = S.PosixClaimBackend()
    n = S._GEN_RING + 6
    for i in range(n):
        assert _append(store, "w", i, claims) == 1 + i
    gens = glob.glob(os.path.join(store, f".{MANIFEST}.gen-*"))
    assert len(gens) == S._GEN_RING
    meta = S.load_manifest(store, MANIFEST)
    assert meta["commit_gen"] == n and meta["n_batches"] == 1 + n


def test_compact_swap_refuses_stale_manifest_with_pending_generation(
    tmp_path, claims
):
    """Compacting from a manifest that is BEHIND the committed
    generation chain must hard-error (and repair the manifest), not
    silently compact over a durable commit — otherwise the next
    append's repair would mirror a pre-compaction manifest onto the
    compacted layout."""
    store = _new_store(tmp_path)
    assert _append(store, "w1", 1, claims) == 1
    stale = S.load_manifest(store, MANIFEST)
    # a crashed writer's durable-but-unmirrored generation 2
    next_meta = dict(stale, n_batches=3, commit_gen=2)
    assert claims.try_create(
        S._gen_key(store, MANIFEST, 2), json.dumps(next_meta)
    )
    with pytest.raises(RuntimeError, match="unmirrored"):
        S.compact_swap(
            store,
            MANIFEST,
            dict(stale, n_batches=1),
            {"data": FakeDF("compacted", 0)},
            claims=claims,
        )
    # the guard repaired the plain manifest on its way out
    assert S.load_manifest(store, MANIFEST)["commit_gen"] == 2
    # retry from the reloaded manifest succeeds; the compaction's own
    # commit is FENCED (round 17), so it wins and records generation 3
    fresh = S.load_manifest(store, MANIFEST)
    out = S.compact_swap(
        store,
        MANIFEST,
        dict(fresh, n_batches=1),
        {"data": FakeDF("compacted", 0)},
        claims=claims,
    )
    assert out["commit_gen"] == 3


def test_commit_gen_survives_compaction_and_fencing_continues(tmp_path, claims):
    """The generation counter is monotone ACROSS compactions: a fenced
    compaction (claims provided, round 17) wins the next generation
    itself, so stale generation keys from before a compaction can never
    collide with or be mistaken for post-compaction commits."""
    store = _new_store(tmp_path)
    for i in range(3):
        _append(store, "w", i, claims)
    meta = S.load_manifest(store, MANIFEST)
    assert meta["commit_gen"] == 3
    S.compact_swap(
        store,
        MANIFEST,
        dict(meta, n_batches=1),
        {"data": FakeDF("compacted", 99)},
        claims=claims,
    )
    meta = S.load_manifest(store, MANIFEST)
    assert meta["commit_gen"] == 4 and meta["n_batches"] == 1
    # and the chain continues cleanly past the compaction
    assert _append(store, "w", 100, claims) == 1
    assert S.load_manifest(store, MANIFEST)["commit_gen"] == 5


def test_compact_swap_lost_fence_rolls_back_and_raises(tmp_path, claims):
    """A CAS writer that fence-commits between compact_swap's staleness
    guard and its own commit must WIN: the compaction loses the
    generation create, restores the pre-compaction dataset dirs from
    the asides, and raises — the racer's committed rows survive
    (round-16 ADVICE: the old plain commit_manifest silently clobbered
    the racer, and the next repair mirrored the racer's pre-compaction
    manifest over the compacted layout)."""
    store = _new_store(tmp_path)
    assert _append(store, "w1", 1, claims) == 1
    meta = S.load_manifest(store, MANIFEST)
    rows_before = _rows(store)

    class RacingDF(FakeDF):
        """Fence-commits a concurrent append from inside the
        compaction's staging write — after the guard, before the
        commit."""

        def parquet(self, path: str):
            super().parquet(path)
            racer = dict(
                S.load_manifest(store, MANIFEST), n_batches=3, racer=True
            )
            assert S._fenced_commit(store, MANIFEST, racer, claims)

    with pytest.raises(RuntimeError, match="fence"):
        S.compact_swap(
            store,
            MANIFEST,
            dict(meta, n_batches=1),
            {"data": RacingDF("compacted", 0)},
            claims=claims,
        )
    # the racer's commit is the visible manifest; the data dirs were
    # rolled back to the pre-compaction layout
    after = S.load_manifest(store, MANIFEST)
    assert after.get("racer") is True and after["commit_gen"] == 2
    assert _rows(store) == rows_before


def test_lost_stage_dirs_never_leak(tmp_path):
    """Round-15 ADVICE: the loss path re-stages and rebinds the staging
    dict — the earlier generation's unconsumed dirs must still be swept
    by the outer cleanup, not left as hidden .stage-* garbage."""
    store = _new_store(tmp_path)
    fired = {"done": False}

    class StealEveryFirstCheck(S.ConditionalPutClaimBackend):
        def read(self, key):
            # claim ownership check: report the claim stolen ONCE,
            # after staging but before any rename consumed a stage dir
            if ".claim-" in os.path.basename(key) and not fired["done"]:
                fired["done"] = True
                return ("somebody-else", 0.0)
            return super().read(key)

    slot = _append(store, "w", 1, StealEveryFirstCheck())
    assert fired["done"] and slot == 1
    leaked = glob.glob(os.path.join(store, "data", ".stage-*"))
    assert leaked == []
