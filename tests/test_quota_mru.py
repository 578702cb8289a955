"""p4 parity: sliding-window quotas (exact admit/record semantics and
charge ordering) and MRU top-keys order -- the suite mirrors
p4/scripts/p4.py's assertions (8 KB up/down windows, request-quota
precedence, reset after interval, KVT order)."""

from __future__ import annotations

import pytest

from operating_system_map_reduce_spark import codes
from operating_system_map_reduce_spark.engine import KVEngine
from operating_system_map_reduce_spark.operators.quota import QuotaTracker


class FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


@pytest.fixture()
def clocked(spark, tmp_path):
    clock = FakeClock()
    eng = KVEngine(spark, str(tmp_path / "data"), admin="alice",
                   up_quota=8192, down_quota=8192, req_quota=24,
                   quota_interval=6.0, top_size=3, clock=clock)
    eng.add_user("alice", "pw")
    eng.add_user("bob", "pw")
    return eng, clock


ONE_KB = b"x" * 1024


class TestQuotaTracker:
    def test_admit_until_full(self):
        qt = QuotaTracker(8, 6.0)
        assert all(qt.check_add(1, 0.0) for _ in range(8))
        assert not qt.check_add(1, 0.1)

    def test_rejected_not_recorded(self):
        qt = QuotaTracker(8, 6.0)
        qt.check_add(6, 0.0)
        assert not qt.check_add(4, 0.1)   # rejected
        assert qt.check_add(2, 0.2)       # still room: the 4 wasn't recorded

    def test_window_expiry(self):
        qt = QuotaTracker(8, 6.0)
        qt.check_add(8, 0.0)
        assert not qt.check_add(1, 5.9)
        assert qt.check_add(8, 6.1)       # old events expired

    def test_partial_expiry(self):
        qt = QuotaTracker(8, 6.0)
        qt.check_add(4, 0.0)
        qt.check_add(4, 3.0)
        assert not qt.check_add(1, 5.0)
        assert qt.check_add(4, 6.5)       # first event expired, second alive


class TestUploadQuota:
    def test_upload_exhaustion(self, clocked):
        """p4.py:41-52: 8 KB up-quota admits 8 x 1 KB then blocks."""
        eng, clock = clocked
        for i in range(8):
            assert eng.kv_insert("alice", "pw", f"k{i}", ONE_KB)[1] == codes.RES_OK
        assert eng.kv_insert("alice", "pw", "k8", ONE_KB)[1] == codes.RES_ERR_QUOTA_UP

    def test_per_user_isolation(self, clocked):
        """p4.py:56-58: bob's quota is untouched by alice's exhaustion."""
        eng, clock = clocked
        for i in range(8):
            eng.kv_insert("alice", "pw", f"a{i}", ONE_KB)
        assert eng.kv_insert("alice", "pw", "a8", ONE_KB)[1] == codes.RES_ERR_QUOTA_UP
        assert eng.kv_insert("bob", "pw", "b0", ONE_KB)[1] == codes.RES_OK

    def test_quota_reset_after_interval(self, clocked):
        """p4.py:113-128: after the window passes, uploads flow again."""
        eng, clock = clocked
        for i in range(8):
            eng.kv_insert("alice", "pw", f"k{i}", ONE_KB)
        assert eng.kv_insert("alice", "pw", "k8", ONE_KB)[1] == codes.RES_ERR_QUOTA_UP
        clock.advance(6.5)
        assert eng.kv_insert("alice", "pw", "k8", ONE_KB)[1] == codes.RES_OK


class TestDownloadQuota:
    def test_download_exhaustion_and_uncharged_failure(self, clocked):
        """p4.py:81-83: blocked KVG is NOT recorded, so a subsequent
        small KVA still succeeds."""
        eng, clock = clocked
        eng.kv_insert("alice", "pw", "big", b"y" * 5000)
        eng.kv_insert("alice", "pw", "k1", b"z")
        assert eng.kv_get("bob", "pw", "big")[1] == codes.RES_OK
        # second big read exceeds the 8192 window -> blocked, not recorded
        assert eng.kv_get("bob", "pw", "big")[1] == codes.RES_ERR_QUOTA_DOWN
        # KVA result is tiny; succeeds because the failed read left no charge
        assert eng.kv_all("bob", "pw")[1] == codes.RES_OK


class TestRequestQuota:
    def test_request_quota_trumps_everything(self, clocked):
        """p4.py:103-109: once request quota is gone, even ops that would
        fail differently return ERR_QUOTA_REQ.  (kv_all is seeded first:
        the reference checks ERR_NO_DATA before any charge,
        my_storage.cc:436-439.)"""
        eng, clock = clocked
        assert eng.kv_insert("alice", "pw", "seedkey", b"v")[1] == codes.RES_OK
        for i in range(24):
            eng.kv_get("alice", "pw", "missing")  # ERR_KEY, but charges a request
        assert eng.kv_get("alice", "pw", "missing")[1] == codes.RES_ERR_QUOTA_REQ
        assert eng.kv_insert("alice", "pw", "k", b"v")[1] == codes.RES_ERR_QUOTA_REQ
        assert eng.kv_all("alice", "pw")[1] == codes.RES_ERR_QUOTA_REQ
        clock.advance(6.5)
        assert eng.kv_insert("alice", "pw", "k", b"v")[1] == codes.RES_OK

    def test_kv_all_empty_store_is_no_data_before_quota(self, clocked):
        """my_storage.cc:436-439: empty-store KVA short-circuits to
        ERR_NO_DATA without charging request or download quota."""
        eng, clock = clocked
        for i in range(50):
            assert eng.kv_all("alice", "pw")[1] == codes.RES_ERR_NO_DATA
        # no request was charged by any of those calls
        assert eng.kv_insert("alice", "pw", "k", b"v")[1] == codes.RES_OK

    def test_channel_charge_recorded_even_when_request_rejects(self, clocked):
        """my_storage.cc:185-205: the upload check_add runs BEFORE the
        request check_add and its admission sticks even though the
        response is ERR_QUOTA_REQ."""
        eng, clock = clocked
        eng.kv_insert("alice", "pw", "seedkey", b"v")      # t=1000: 1 req
        for i in range(23):
            eng.kv_get("alice", "pw", "missing")           # t=1000: 24 reqs total
        clock.advance(4.0)                                 # t=1004: reqs still in window
        # request quota exhausted; this 5000-byte upload is ADMITTED into
        # the upload window (expires t=1010) even though the response is
        # the request error
        assert eng.kv_insert("alice", "pw", "big", b"y" * 5000)[1] == codes.RES_ERR_QUOTA_REQ
        clock.advance(2.5)                                 # t=1006.5: t=1000 reqs expired
        # requests are free again, but the recorded 5000 still occupies
        # the upload window -> a second 5000 exceeds 8192
        assert eng.kv_insert("alice", "pw", "big2", b"y" * 5000)[1] == codes.RES_ERR_QUOTA_UP
        # under the OLD short-circuit (request error skips upload charge)
        # this insert would have succeeded


class TestMRU:
    def test_kvt_order_most_recent_first(self, clocked):
        """p4.py:127-128 shape: top_size=3, order-sensitive."""
        eng, clock = clocked
        for i in range(1, 6):
            eng.kv_insert("alice", "pw", f"k{i}", b"v")
        # MRU now (most-recent-first): k5 k4 k3
        assert eng.kv_top("alice", "pw")[2].decode().split("\n") == ["k5", "k4", "k3"]
        eng.kv_get("alice", "pw", "k4")
        assert eng.kv_top("alice", "pw")[2].decode().split("\n") == ["k4", "k5", "k3"]
        eng.kv_get("alice", "pw", "k1")
        assert eng.kv_top("alice", "pw")[2].decode().split("\n") == ["k1", "k4", "k5"]

    def test_delete_removes_from_mru(self, clocked):
        eng, clock = clocked
        for i in range(1, 4):
            eng.kv_insert("alice", "pw", f"k{i}", b"v")
        eng.kv_delete("alice", "pw", "k3")
        assert eng.kv_top("alice", "pw")[2].decode().split("\n") == ["k2", "k1"]
