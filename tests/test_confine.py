"""Seccomp-analog confinement (operators/confine.py).

The reference forks KMR invocations and applies SECCOMP_MODE_STRICT
(p5/server/my_storage.cc:282-285): user code that tries to open files,
create sockets, or spawn processes is killed and the server answers
ERR_SERVER.  These tests pin the rlimit-sandbox analog to the same
observable contract -- and prove the *prevention* delta by running the
same side-effecting UDF unconfined (succeeds) and confined (blocked).
"""

from __future__ import annotations

import os
import time

import pytest

from operating_system_map_reduce_spark import codes
from operating_system_map_reduce_spark.engine import KVEngine
from operating_system_map_reduce_spark.operators import confine
from operating_system_map_reduce_spark.operators.mapreduce import run_map_reduce

pytestmark = pytest.mark.skipif(not confine.supported(),
                                reason="needs os.fork (POSIX)")


# ------------------------------------------------------------ unit level

class TestConfinedBatch:
    def test_pure_function_results_roundtrip(self):
        out = confine.confined_batch(lambda k, v: v * 2,
                                     [("a", b"x"), ("b", b"yz")])
        assert out == [b"xx", b"yzyz"]

    def test_open_is_blocked(self, tmp_path):
        target = str(tmp_path / "leak.txt")

        def writes_file(k, v):
            with open(target, "w") as f:
                f.write("leaked")
            return v

        # Unconfined: the side effect succeeds.
        assert writes_file("k", b"v") == b"v"
        os.unlink(target)
        # Confined: RLIMIT_NOFILE=0 denies the open().
        with pytest.raises(confine.ConfinedCrash):
            confine.confined_batch(writes_file, [("k", b"v")])
        assert not os.path.exists(target)

    def test_socket_is_blocked(self):
        def opens_socket(k, v):
            import socket
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.close()
            return v

        with pytest.raises(confine.ConfinedCrash):
            confine.confined_batch(opens_socket, [("k", b"v")])

    def test_spawn_is_blocked(self):
        def forks(k, v):
            pid = os.fork()
            if pid == 0:
                os._exit(0)
            os.waitpid(pid, 0)
            return v

        with pytest.raises(confine.ConfinedCrash):
            confine.confined_batch(forks, [("k", b"v")])

    def test_cpu_runaway_is_killed(self):
        def spins(k, v):
            while True:
                pass

        t0 = time.monotonic()
        with pytest.raises(confine.ConfinedCrash):
            confine.confined_batch(spins, [("k", b"v")], cpu_seconds=1)
        # SIGXCPU fires at the 1 s budget; generous slack for CI noise.
        assert time.monotonic() - t0 < 10

    def test_udf_exception_is_crash(self):
        def boom(k, v):
            raise RuntimeError("bug")

        with pytest.raises(confine.ConfinedCrash):
            confine.confined_batch(boom, [("k", b"v")])

    def test_oversize_item_raises_oversize(self):
        with pytest.raises(confine.ConfinedOversize):
            confine.confined_batch(lambda k, v: b"x" * 100,
                                   [("k", b"v")], max_item_bytes=10)

    def test_large_payload_streams_through_pipe(self):
        # Bigger than the 64 KiB pipe buffer: exercises the chunked
        # writer / concurrent reader protocol.
        out = confine.confined_batch(lambda k, v: v, [("k", b"z" * (2 << 20))])
        assert out == [b"z" * (2 << 20)]


# ------------------------------------------------- engine / Spark level

FILE_WRITER_SRC = b"""
def map(key, value):
    with open("/tmp/kmr-confine-leak.txt", "w") as f:
        f.write(key)
    return value

def reduce(values):
    return b"|".join(values)
"""

SOCKET_REDUCE_SRC = b"""
def map(key, value):
    return value

def reduce(values):
    import socket
    socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    return b"|".join(values)
"""

SUM_SRC = b"""
def map(key, value):
    return value

def reduce(values):
    return str(sum(int(v) for v in values if v)).encode()
"""


@pytest.fixture()
def engine(spark, tmp_path):
    eng = KVEngine(spark, str(tmp_path / "data"), admin="alice",
                   req_quota=4096, quota_interval=1.0)
    eng.add_user("alice", "alice_is_awesome")
    for i in range(1, 5):
        eng.kv_insert("alice", "alice_is_awesome", f"k{i}", str(i).encode())
    yield eng
    eng.shutdown()


class TestEngineConfinement:
    def test_confined_matches_unconfined_for_pure_udf(self, engine):
        engine.register_mr("alice", "alice_is_awesome", "sum", SUM_SRC)
        ok_c, code_c, data_c = engine.invoke_mr(
            "alice", "alice_is_awesome", "sum", confined=True)
        ok_u, code_u, data_u = engine.invoke_mr(
            "alice", "alice_is_awesome", "sum", confined=False)
        assert (ok_c, code_c, data_c) == (True, codes.RES_OK, b"10")
        assert (ok_u, code_u, data_u) == (ok_c, code_c, data_c)

    def test_file_writing_map_blocked_only_when_confined(self, engine):
        leak = "/tmp/kmr-confine-leak.txt"
        if os.path.exists(leak):
            os.unlink(leak)
        engine.register_mr("alice", "alice_is_awesome", "fw", FILE_WRITER_SRC)
        ok, code, _ = engine.invoke_mr("alice", "alice_is_awesome", "fw",
                                       confined=True)
        assert (ok, code) == (False, codes.RES_ERR_SERVER)
        assert not os.path.exists(leak)
        # The identical UDF is permitted when confinement is waived --
        # the prevention really is the sandbox, not Spark.
        ok, code, _ = engine.invoke_mr("alice", "alice_is_awesome", "fw",
                                       confined=False)
        assert (ok, code) == (True, codes.RES_OK)
        assert os.path.exists(leak)
        os.unlink(leak)

    def test_socket_in_reduce_blocked(self, engine):
        engine.register_mr("alice", "alice_is_awesome", "sock",
                           SOCKET_REDUCE_SRC)
        ok, code, _ = engine.invoke_mr("alice", "alice_is_awesome", "sock",
                                       confined=True)
        assert (ok, code) == (False, codes.RES_ERR_SERVER)
        # Engine survives the killed child (my_storage.cc:361-364).
        assert engine.kv_get("alice", "alice_is_awesome", "k1")[2] == b"1"

    def test_oversize_map_output_is_err_xmit_confined(self, spark, engine):
        huge = b"""
def map(key, value):
    return b"x" * (1024 * 1024 + 1)

def reduce(values):
    return b""
"""
        engine.register_mr("alice", "alice_is_awesome", "huge", huge)
        ok, code, _ = engine.invoke_mr("alice", "alice_is_awesome", "huge",
                                       confined=True)
        assert (ok, code) == (False, codes.RES_ERR_XMIT)

    def test_associative_confined_path(self, engine):
        ok, code, data = run_map_reduce(
            engine.kv_df(), lambda k, v: v,
            lambda vals: str(sum(int(v) for v in vals if v)).encode(),
            associative=True, confined=True)
        assert (ok, code, data) == (True, codes.RES_OK, b"10")


# Reference fixture parity: invalid1 (reduce opens a file,
# p5/so/invalid1.cc:14-22) and invalid2 (map opens a file,
# p5/so/invalid2.cc:9-15) must yield ERR_SERVER through the full KMR
# path, and the engine must keep serving KMR afterwards -- the
# p5/scripts/p5.py:85-90 flow.

INVALID1_SRC = b"""
def map(key, value):
    return value

def reduce(values):
    open("/tmp/kmr-invalid1-leak.txt", "w").write("x")
    return b"|".join(values)
"""

INVALID2_SRC = b"""
def map(key, value):
    open("/tmp/kmr-invalid2-leak.txt", "w").write("x")
    return value

def reduce(values):
    return b"|".join(values)
"""

ALL_KEYS_SRC = b"""
def map(key, value):
    return key.encode()

def reduce(values):
    return b"\\n".join(values)
"""


class TestInvalidFixturesThroughEngine:
    def _assert_blocked_then_healthy(self, engine, name, src, leak):
        if os.path.exists(leak):
            os.unlink(leak)
        assert engine.register_mr(
            "alice", "alice_is_awesome", name, src)[1] == codes.RES_OK
        ok, code, data = engine.invoke_mr("alice", "alice_is_awesome", name)
        assert (ok, code, data) == (False, codes.RES_ERR_SERVER, None)
        assert not os.path.exists(leak), "sandbox must prevent, not just fail"
        # sandbox death must not poison the session: a clean KMR on the
        # SAME engine still succeeds (p5.py runs all_keys after invalid*)
        assert engine.register_mr(
            "alice", "alice_is_awesome", f"ok_after_{name}",
            ALL_KEYS_SRC)[1] == codes.RES_OK
        ok, code, data = engine.invoke_mr(
            "alice", "alice_is_awesome", f"ok_after_{name}")
        assert (ok, code) == (True, codes.RES_OK)
        assert sorted(data.split(b"\n")) == [b"k1", b"k2", b"k3", b"k4"]

    def test_invalid1_reduce_opens_file(self, engine):
        self._assert_blocked_then_healthy(
            engine, "invalid1", INVALID1_SRC, "/tmp/kmr-invalid1-leak.txt")

    def test_invalid2_map_opens_file(self, engine):
        self._assert_blocked_then_healthy(
            engine, "invalid2", INVALID2_SRC, "/tmp/kmr-invalid2-leak.txt")
