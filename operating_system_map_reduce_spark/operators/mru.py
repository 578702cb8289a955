"""MRU top-keys tracker (p4/server/my_mru.cc): dedup on re-insert, evict
LRU at capacity, most-recent-first read-out.  KVT's output order is
asserted order-sensitively by the reference tests
(p4/scripts/p4.py:127-128 via check_file_list_nosort).

In-engine this is bounded metadata (<= top_size keys), so a deque
mirrors the reference exactly; the distributed form over an access log
is plans.kvqueries.kv_top_mru (orderBy recency desc + limit).
"""

from __future__ import annotations

import threading
from collections import deque


class MRUManager:
    def __init__(self, top_size: int):
        self.top_size = top_size
        self._dq: deque[str] = deque()  # most recent at index 0
        # concurrent clients mutate the MRU (the reference's my_mru.cc
        # takes a std::mutex per op); remove-then-appendleft must be
        # atomic or a key lands in the deque twice
        self._lock = threading.Lock()

    def insert(self, key: str) -> None:
        with self._lock:
            try:
                self._dq.remove(key)
            except ValueError:
                pass
            while len(self._dq) >= self.top_size:
                self._dq.pop()
            self._dq.appendleft(key)

    def remove(self, key: str) -> None:
        with self._lock:
            try:
                self._dq.remove(key)
            except ValueError:
                pass

    def clear(self) -> None:
        with self._lock:
            self._dq.clear()

    def get(self) -> list[str]:
        with self._lock:
            return list(self._dq)
