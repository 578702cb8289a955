"""User-defined map/reduce over the full KV snapshot -- the reference's
headline feature (KVF registration p5/server/my_functable.cc:45-71, KMR
invocation p5/server/my_storage.cc:269-415).

Reference ABI (p5/server/functypes.h):
    map(key: str, value: bytes) -> bytes        # one output per pair
    reduce(values: list[bytes]) -> bytes        # global, NOT associative

Our registry accepts Python *source bytes* (the .so analog): the module
must define ``map`` and ``reduce`` with those signatures; missing
symbols fail registration with ERR_SO exactly as dlsym failure does.

Execution is Spark-native:
 - the map side runs in Spark's Python workers via ``mapInPandas`` --
   out-of-process isolation for free, the same property the reference
   builds from fork()+SECCOMP_MODE_STRICT (p5/server/my_storage.cc:282-285);
 - a UDF that raises kills the task, never the engine; we surface
   ERR_SERVER like the reference's killed child (my_storage.cc:361-364);
 - ``confined=True`` additionally *prevents* side effects the way the
   reference's SECCOMP_MODE_STRICT does: every batch of user-code calls
   runs in a fork()ed child whose rlimits forbid new fds (open/socket),
   process spawning, regular-file growth, and runaway CPU -- see
   operators/confine.py.  A violation surfaces as ERR_SERVER, the code
   the reference returns for a seccomp-killed child;
 - the reduce is global and non-associative, so exact parity collects
   map outputs to the driver in deterministic key order before one
   reduce() call.  For associative reducers, ``associative=True`` opts
   into a distributed two-stage fold (partition-level reduce, then a
   final reduce over the per-partition results) -- the 100 TB path.
"""

from __future__ import annotations

import threading
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from operating_system_map_reduce_spark import codes

MapFn = Callable[[str, bytes], bytes]
ReduceFn = Callable[[list[bytes]], bytes]

_MAP_OUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("mapped", BinaryType()),
])

# Size guards (SURVEY section 7 risk 1).  The reference bounds every
# transmitted value at LEN_VAL structurally (p5/common/protocol.h:257-260)
# and answers oversized transmissions with ERR_XMIT (protocol.h:235).
# Each map output is held to LEN_VAL; the non-associative global reduce
# additionally caps the total bytes collected to the driver, because at
# 100 TB "rows x 1 MB" is a driver OOM, not a payload.
MAX_REDUCE_INPUT_BYTES = 256 * 1024 * 1024

_XMIT_MARKER = "KMR_MAP_OUTPUT_OVER_LEN_VAL"


class FuncTable:
    """Validated registry of named (map, reduce) pairs under a lock
    (reference: my_functable.cc writer-locked unordered_map)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._fns: dict[str, tuple[MapFn, ReduceFn, bool]] = {}

    def register_source(self, name: str, source: bytes, associative: bool = False) -> str:
        """Register from Python source bytes; returns a protocol code."""
        if not name or len(name) > codes.LEN_FNAME:
            return codes.RES_ERR_REQ_FMT
        if len(source) > codes.LEN_SO:
            return codes.RES_ERR_REQ_FMT
        ns: dict = {}
        try:
            exec(compile(source, f"<mr:{name}>", "exec"), ns)  # noqa: S102 - the KVF contract is executing user code
        except Exception:
            return codes.RES_ERR_SO
        map_fn, reduce_fn = ns.get("map"), ns.get("reduce")
        if not callable(map_fn) or not callable(reduce_fn):
            return codes.RES_ERR_SO
        return self.register_callables(name, map_fn, reduce_fn, associative)

    def register_callables(self, name: str, map_fn: MapFn, reduce_fn: ReduceFn,
                           associative: bool = False) -> str:
        with self._lock:
            if name in self._fns:
                return codes.RES_ERR_FUNC
            self._fns[name] = (map_fn, reduce_fn, associative)
        return codes.RES_OK

    def get(self, name: str) -> tuple[MapFn, ReduceFn, bool] | None:
        with self._lock:
            return self._fns.get(name)

    def clear(self) -> None:
        with self._lock:
            self._fns.clear()


def run_map_reduce(kv_df: DataFrame, map_fn: MapFn, reduce_fn: ReduceFn,
                   associative: bool = False,
                   max_reduce_input_bytes: int = MAX_REDUCE_INPUT_BYTES,
                   confined: bool = False,
                   ) -> tuple[bool, str, bytes]:
    """Run map over every (key, value) pair of the snapshot, then the
    global reduce.  Returns (ok, code, payload).

    ``confined=True`` executes both user functions under the rlimit
    sandbox (operators/confine.py) -- the SECCOMP_MODE_STRICT analog."""
    from operating_system_map_reduce_spark.operators import confine

    try:
        mapped = kv_df.select("key", "value").mapInPandas(
            _make_map_batches(map_fn, confined=confined), schema=_MAP_OUT_SCHEMA
        )
        if confined:
            def reduce_call(vals: list[bytes]) -> bytes:
                return confine.confined_batch(reduce_fn, [(vals,)])[0]
        else:
            reduce_call = reduce_fn
        if associative:
            # Distributed fold: reduce each partition's outputs, then
            # reduce the per-partition digests.  Valid only when
            # reduce(reduce(A) ++ reduce(B)) == reduce(A ++ B).
            partials = (
                mapped.rdd.map(lambda r: bytes(r.mapped) if r.mapped is not None else b"")
                .mapPartitions(lambda it: _partition_digest(it, reduce_call))
                .collect()
            )
            result = reduce_call([p for p in partials if p is not None])
        else:
            # Exact-parity path: one global reduce over all map outputs
            # in deterministic key order (the reference feeds scan order;
            # its tests are order-insensitive, so sorted order is the
            # deterministic choice -- SURVEY.md section 2.2 reduce_func).
            # Streamed partition-by-partition with a byte budget: the
            # driver aborts with ERR_XMIT instead of OOMing when map
            # outputs exceed the envelope (SURVEY section 7 risk 1).
            vals, total = [], 0
            for r in mapped.orderBy("key").toLocalIterator(prefetchPartitions=True):
                b = bytes(r.mapped) if r.mapped is not None else b""
                total += len(b)
                if total > max_reduce_input_bytes:
                    return False, codes.RES_ERR_XMIT, b""
                vals.append(b)
            result = reduce_call(vals)
        result = bytes(result) if result is not None else b""
        if len(result) > codes.LEN_VAL:
            # The reply rides the same value envelope as any payload.
            return False, codes.RES_ERR_XMIT, b""
        return True, codes.RES_OK, result
    except confine.ConfinedOversize:
        return False, codes.RES_ERR_XMIT, b""
    except Exception as exc:
        if _XMIT_MARKER in str(exc):
            # A single map output burst LEN_VAL (guard raised in the
            # Python worker) -- a too-big transmission, not a crash.
            return False, codes.RES_ERR_XMIT, b""
        # UDF crash containment: the Python worker died / raised, the
        # engine did not (reference: seccomp-killed child => ERR_SERVER).
        return False, codes.RES_ERR_SERVER, b""


def _make_map_batches(map_fn: MapFn, confined: bool = False):
    def map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from operating_system_map_reduce_spark.operators import confine

        for pdf in batches:
            keys = list(pdf["key"])
            args = [(key, bytes(value) if value is not None else b"")
                    for key, value in zip(keys, pdf["value"])]
            if confined:
                # One sandboxed child per Arrow batch; oversize is
                # signalled via the marker string because the original
                # exception type does not survive the JVM boundary.
                try:
                    out_vals = confine.confined_batch(
                        map_fn, args, max_item_bytes=codes.LEN_VAL)
                except confine.ConfinedOversize:
                    raise ValueError(_XMIT_MARKER) from None
            else:
                out_vals = []
                for key, value in args:
                    out = map_fn(key, value)
                    if out is not None and len(out) > codes.LEN_VAL:
                        raise ValueError(_XMIT_MARKER)
                    out_vals.append(out)
            yield pd.DataFrame({"key": keys, "mapped": out_vals})
    return map_batches


def _partition_digest(it: Iterator[bytes], reduce_fn: ReduceFn) -> Iterator[bytes]:
    vals = list(it)
    if vals:
        yield reduce_fn(vals)
