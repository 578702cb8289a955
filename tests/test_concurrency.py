"""Concurrency parity: many concurrent clients racing on one engine.

Mirrors the reference's p2 races grading
(p2/scripts/grading_p2_races.py:49-145): launch a swarm of concurrent
KVI clients, then concurrent KVG, then concurrent KVD, expecting every
op to succeed and the store to stay consistent.  The reference gets its
safety from per-bucket locks (p2/server/concurrenthashmap.h:40-43); the
engine mirrors that with striped per-key write locks plus a locked seq
counter (engine.py).

Scaled from 1,024 subprocess clients to threads x keys: each op here is
a Spark action (auth collect + existence probe + fsync'd append), not a
socket round-trip, so the same interleavings are exercised with far
fewer iterations.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from operating_system_map_reduce_spark import codes
from operating_system_map_reduce_spark.engine import KVEngine

NKEYS = 32
WORKERS = 8

ALICE = ("alice", "alice_is_awesome")


@pytest.fixture()
def engine(spark, tmp_path):
    eng = KVEngine(spark, str(tmp_path / "data"), admin="alice",
                   req_quota=1 << 30, up_quota=1 << 30, down_quota=1 << 30,
                   quota_interval=60.0, top_size=NKEYS)
    assert eng.add_user(*ALICE)[1] == codes.RES_OK
    yield eng
    eng.shutdown()


def _run_all(fn, items):
    with ThreadPoolExecutor(max_workers=WORKERS) as pool:
        return list(pool.map(fn, items))


def _assert_unique_seqs(engine):
    seqs = [r["seq"] for r in engine.kv_log.raw().select("seq").collect()]
    assert len(seqs) == len(set(seqs)), "duplicate changelog seq minted under race"


class TestMetadataRaces:
    """The engine's in-memory metadata (quota deques, MRU) is hit by
    every concurrent client; these are pure-Python hammer tests (no
    Spark), so they can afford thousands of interleavings."""

    def test_quota_never_over_admits(self):
        from operating_system_map_reduce_spark.operators.quota import QuotaTracker

        for _ in range(50):
            q = QuotaTracker(amount=50, duration=60.0)
            barrier = threading.Barrier(8)

            def charge(_):
                barrier.wait()
                return q.check_add(30, 1.0)

            admitted = _run_all(charge, range(8))
            # cap 50, charges of 30: concurrent check-then-record must
            # admit exactly one -- two would be an over-admission race
            assert admitted.count(True) == 1, admitted

    def test_mru_no_duplicates_under_contention(self):
        from operating_system_map_reduce_spark.operators.mru import MRUManager

        for _ in range(50):
            mru = MRUManager(top_size=8)
            barrier = threading.Barrier(8)

            def touch(i):
                barrier.wait()
                for _ in range(20):
                    mru.insert(f"k{i % 3}")
                return mru.get()

            _run_all(touch, range(8))
            final = mru.get()
            assert len(final) == len(set(final)), final
            assert set(final) == {"k0", "k1", "k2"}


class TestRaces:
    def test_concurrent_insert_get_delete(self, engine):
        """The grading_p2_races.py phases: N concurrent KVI (all OK), N
        concurrent KVG (right bytes back), N concurrent KVD (all OK)."""
        keys = [f"k{i}" for i in range(NKEYS)]

        codes_back = _run_all(
            lambda k: engine.kv_insert(*ALICE, k, f"v-{k}".encode())[1], keys)
        assert codes_back == [codes.RES_OK] * NKEYS
        _assert_unique_seqs(engine)

        got = _run_all(lambda k: engine.kv_get(*ALICE, k), keys)
        assert all(code == codes.RES_OK and val == f"v-{k}".encode()
                   for k, (ok, code, val) in zip(keys, got))

        codes_back = _run_all(lambda k: engine.kv_delete(*ALICE, k)[1], keys)
        assert codes_back == [codes.RES_OK] * NKEYS
        assert engine.kv_df().count() == 0
        _assert_unique_seqs(engine)

    def test_same_key_insert_race(self, engine):
        """Contended insert on ONE key: exactly one client wins RES_OK,
        the rest see ERR_KEY (the reference's bucket lock makes
        check-then-insert atomic), and the surviving value belongs to
        the winner."""
        results = _run_all(
            lambda i: (i, engine.kv_insert(*ALICE, "hot", f"w{i}".encode())[1]),
            range(WORKERS))
        winners = [i for i, code in results if code == codes.RES_OK]
        losers = [code for _, code in results if code != codes.RES_OK]
        assert len(winners) == 1
        assert losers == [codes.RES_ERR_KEY] * (WORKERS - 1)
        _, _, val = engine.kv_get(*ALICE, "hot")
        assert val == f"w{winners[0]}".encode()

    def test_contended_upsert_latest_wins(self, engine):
        """Contended upsert on ONE key: exactly one OK_INSERT (first
        writer through the stripe), every other OK_UPDATE; replay keeps
        the value with the highest seq."""
        results = _run_all(
            lambda i: engine.kv_upsert(*ALICE, "hot", f"u{i}".encode())[1],
            range(WORKERS))
        assert sorted(results).count(codes.RES_OKINS) == 1
        assert sorted(results).count(codes.RES_OKUPD) == WORKERS - 1
        rows = (engine.kv_log.raw().filter("key = 'hot'")
                .orderBy("seq").select("seq", "value").collect())
        assert len(rows) == WORKERS
        _, _, val = engine.kv_get(*ALICE, "hot")
        assert val == bytes(rows[-1]["value"])
        _assert_unique_seqs(engine)

    def test_races_then_restart_replay(self, engine, spark, tmp_path):
        """Post-race durability: a fresh engine on the same directory
        replays to the same state and continues minting unique seqs
        (restart parity, p3/server/my_storage.cc:573-702)."""
        keys = [f"k{i}" for i in range(NKEYS)]
        _run_all(lambda k: engine.kv_insert(*ALICE, k, k.encode()), keys)
        _run_all(lambda k: engine.kv_delete(*ALICE, k), keys[::2])

        fresh = KVEngine(spark, str(tmp_path / "data"), admin="alice",
                         req_quota=1 << 30, up_quota=1 << 30,
                         down_quota=1 << 30)
        try:
            state = {r["key"]: bytes(r["value"]) for r in fresh.kv_df().collect()}
            assert state == {k: k.encode() for k in keys[1::2]}
            assert fresh.kv_insert(*ALICE, "post-restart", b"x")[1] == codes.RES_OK
            _assert_unique_seqs(fresh)
        finally:
            fresh.shutdown()

    def test_mixed_readers_and_writers(self, engine):
        """Readers never block writers (readers are lock-free snapshot
        scans); a mixed KVI/KVG/KVU storm leaves a consistent store."""
        keys = [f"m{i}" for i in range(NKEYS // 2)]
        _run_all(lambda k: engine.kv_insert(*ALICE, k, b"0"), keys)

        barrier = threading.Barrier(WORKERS)

        def storm(i):
            barrier.wait()
            k = keys[i % len(keys)]
            if i % 3 == 0:
                return engine.kv_upsert(*ALICE, k, f"s{i}".encode())[1]
            if i % 3 == 1:
                return engine.kv_get(*ALICE, k)[1]
            return engine.kv_all(*ALICE)[1]

        results = _run_all(storm, range(WORKERS))
        assert all(c in (codes.RES_OK, codes.RES_OKUPD, codes.RES_OKINS)
                   for c in results)
        assert engine.kv_df().count() == len(keys)
        _assert_unique_seqs(engine)
