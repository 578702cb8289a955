"""p5 parity: the map/reduce suite (p5/scripts/p5.py).

Seeds alice(admin)/bob + k1..k8 -> "1".."8"; asserts the KVF auth
matrix, all_keys / odd_key_vals golden outputs, registration-time
validation (broken1/2 -> ERR_SO), and UDF crash containment
(invalid1/2 -> ERR_SERVER without killing the engine).
"""

from __future__ import annotations

import pytest

from operating_system_map_reduce_spark import codes
from operating_system_map_reduce_spark.engine import KVEngine

ALL_KEYS_SRC = b"""
def map(key, value):
    return key.encode()

def reduce(values):
    return b"\\n".join(v for v in values)
"""

# p5/so/odd_key_vals.cc: emit value iff int(key[1:]) is odd, doubled ("rr")
ODD_KEY_VALS_SRC = b"""
def map(key, value):
    return value if int(key[1:]) % 2 == 1 else b""

def reduce(values):
    return b"\\n".join(v + v for v in values if v)
"""

BROKEN_SRC = b"""
def mapper(key, value):
    return value

def reducer(values):
    return b""
"""

SYNTAX_ERR_SRC = b"def map(key value): return"

CRASH_MAP_SRC = b"""
def map(key, value):
    raise RuntimeError("sandbox violation")

def reduce(values):
    return b""
"""

CRASH_REDUCE_SRC = b"""
def map(key, value):
    return value

def reduce(values):
    open("/nonexistent-dir-xyz/file", "w")
    return b""
"""

SUM_SRC = b"""
def map(key, value):
    return value

def reduce(values):
    return str(sum(int(v) for v in values if v)).encode()
"""

# map output bursts the LEN_VAL envelope (p5/common/protocol.h:257-260)
HUGE_MAP_SRC = b"""
def map(key, value):
    return b"x" * (1024 * 1024 + 1)

def reduce(values):
    return b""
"""

# each map output is legal, but the reduce reply bursts LEN_VAL
HUGE_REDUCE_SRC = b"""
def map(key, value):
    return b"y" * (1024 * 256)

def reduce(values):
    return b"".join(values)
"""


@pytest.fixture()
def engine(spark, tmp_path):
    eng = KVEngine(spark, str(tmp_path / "data"), admin="alice",
                   req_quota=4096, quota_interval=1.0)
    eng.add_user("alice", "alice_is_awesome")
    eng.add_user("bob", "bob_is_the_best")
    for i in range(1, 9):
        eng.kv_insert("alice", "alice_is_awesome", f"k{i}", str(i).encode())
    yield eng
    eng.shutdown()


class TestRegistration:
    def test_admin_only(self, engine):
        """p5.py:54-60 auth matrix: non-admin KVF -> ERR_LOGIN."""
        assert engine.register_mr("bob", "bob_is_the_best", "f1", ALL_KEYS_SRC)[1] == codes.RES_ERR_LOGIN
        assert engine.register_mr("alice", "wrongpw", "f1", ALL_KEYS_SRC)[1] == codes.RES_ERR_LOGIN
        assert engine.register_mr("alice", "alice_is_awesome", "f1", ALL_KEYS_SRC)[1] == codes.RES_OK

    def test_duplicate_name_is_err_func(self, engine):
        engine.register_mr("alice", "alice_is_awesome", "f1", ALL_KEYS_SRC)
        assert engine.register_mr("alice", "alice_is_awesome", "f1", ALL_KEYS_SRC)[1] == codes.RES_ERR_FUNC

    def test_missing_symbols_is_err_so(self, engine):
        """broken1/2 parity: wrong symbol names fail registration."""
        assert engine.register_mr("alice", "alice_is_awesome", "b1", BROKEN_SRC)[1] == codes.RES_ERR_SO

    def test_unparseable_source_is_err_so(self, engine):
        assert engine.register_mr("alice", "alice_is_awesome", "b2", SYNTAX_ERR_SRC)[1] == codes.RES_ERR_SO

    def test_invoke_unknown_is_err_func(self, engine):
        assert engine.invoke_mr("bob", "bob_is_the_best", "nope")[1] == codes.RES_ERR_FUNC


class TestInvocation:
    def test_all_keys(self, engine):
        """p5.py:66-67: all_keys returns {k1..k8}."""
        engine.register_mr("alice", "alice_is_awesome", "all_keys", ALL_KEYS_SRC)
        ok, code, data = engine.invoke_mr("bob", "bob_is_the_best", "all_keys")
        assert (ok, code) == (True, codes.RES_OK)
        assert sorted(data.decode().split("\n")) == [f"k{i}" for i in range(1, 9)]

    def test_odd_key_vals(self, engine):
        """p5.py:78-79: odd keys' values doubled -> {11,33,55,77}."""
        engine.register_mr("alice", "alice_is_awesome", "odd", ODD_KEY_VALS_SRC)
        ok, code, data = engine.invoke_mr("bob", "bob_is_the_best", "odd")
        assert sorted(data.decode().split("\n")) == ["11", "33", "55", "77"]

    def test_crash_in_map_is_err_server(self, engine):
        """invalid1/2 parity (p5.py:85-90): UDF failure -> ERR_SERVER,
        engine survives."""
        engine.register_mr("alice", "alice_is_awesome", "crashm", CRASH_MAP_SRC)
        assert engine.invoke_mr("bob", "bob_is_the_best", "crashm")[1] == codes.RES_ERR_SERVER
        # engine still alive and serving
        assert engine.kv_get("bob", "bob_is_the_best", "k1")[2] == b"1"

    def test_crash_in_reduce_is_err_server(self, engine):
        engine.register_mr("alice", "alice_is_awesome", "crashr", CRASH_REDUCE_SRC)
        assert engine.invoke_mr("bob", "bob_is_the_best", "crashr")[1] == codes.RES_ERR_SERVER
        assert engine.kv_all("bob", "bob_is_the_best")[1] == codes.RES_OK

    def test_associative_tree_reduce_path(self, engine):
        """Distributed two-stage fold matches the global fold for an
        associative reducer (sum over values 1..8 = 36)."""
        engine.register_mr("alice", "alice_is_awesome", "sum_g", SUM_SRC)
        engine.funcs.register_source("sum_t", SUM_SRC, associative=True)
        ok_g, _, global_res = engine.invoke_mr("bob", "bob_is_the_best", "sum_g")
        ok_t, _, tree_res = engine.invoke_mr("bob", "bob_is_the_best", "sum_t")
        assert (ok_g, ok_t) == (True, True)
        assert global_res == tree_res == b"36"

    def test_oversized_map_output_is_err_xmit(self, engine):
        """SURVEY section 7 risk 1: a map output over LEN_VAL is a
        guarded ERR_XMIT (protocol.h:235), not a crash, and the engine
        stays alive."""
        engine.register_mr("alice", "alice_is_awesome", "hugem", HUGE_MAP_SRC)
        assert engine.invoke_mr("bob", "bob_is_the_best", "hugem")[1] == codes.RES_ERR_XMIT
        assert engine.kv_get("bob", "bob_is_the_best", "k1")[2] == b"1"

    def test_oversized_reduce_reply_is_err_xmit(self, engine):
        """The reduce reply rides the same value envelope: 8 x 256 KiB
        joined = 2 MiB > LEN_VAL -> ERR_XMIT, engine alive."""
        engine.register_mr("alice", "alice_is_awesome", "huger", HUGE_REDUCE_SRC)
        assert engine.invoke_mr("bob", "bob_is_the_best", "huger")[1] == codes.RES_ERR_XMIT
        assert engine.kv_all("bob", "bob_is_the_best")[1] == codes.RES_OK

    def test_reduce_input_byte_budget(self, engine):
        """Driver-side collect budget: with a tiny cap the non-associative
        path aborts with ERR_XMIT instead of materializing everything."""
        from operating_system_map_reduce_spark.operators.mapreduce import run_map_reduce
        entry_code = engine.funcs.register_source("cap", ALL_KEYS_SRC)
        assert entry_code == codes.RES_OK
        map_fn, reduce_fn, _ = engine.funcs.get("cap")
        ok, code, _ = run_map_reduce(engine.kv_df(), map_fn, reduce_fn,
                                     max_reduce_input_bytes=4)
        assert (ok, code) == (False, codes.RES_ERR_XMIT)
        ok, code, data = run_map_reduce(engine.kv_df(), map_fn, reduce_fn)
        assert (ok, code) == (True, codes.RES_OK)
        assert sorted(data.decode().split("\n")) == [f"k{i}" for i in range(1, 9)]

    def test_mr_sees_consistent_snapshot(self, engine):
        """Writes after the snapshot DataFrame is taken don't leak into a
        running KMR (immutability = the 2PL snapshot guarantee)."""
        engine.register_mr("alice", "alice_is_awesome", "all_keys", ALL_KEYS_SRC)
        snap = engine.kv_df()
        engine.kv_insert("alice", "alice_is_awesome", "k9", b"9")
        from operating_system_map_reduce_spark.operators.mapreduce import run_map_reduce
        entry = engine.funcs.get("all_keys")
        ok, code, data = run_map_reduce(snap, entry[0], entry[1])
        assert sorted(data.decode().split("\n")) == [f"k{i}" for i in range(1, 9)]
