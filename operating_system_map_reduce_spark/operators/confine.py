"""Seccomp-analog confinement for user map/reduce functions.

The reference forks each KMR invocation into a child process and locks
it down with ``SECCOMP_MODE_STRICT`` before touching user code
(p5/server/my_storage.cc:282-285): the child may only read/write fds it
already holds and exit -- any open(), socket(), or fork() kills it, and
the parent reports ERR_SERVER without dying.

Spark's Python workers already give out-of-process isolation for
*crashes*; this module adds the *prevention* half with the portable
POSIX analog of seccomp-strict -- a fork()ed child whose rlimits are
dropped before user code runs:

  RLIMIT_NOFILE = 0      -> no NEW file descriptors: open(), socket(),
                            pipe(), accept() all fail with EMFILE.
                            Already-open fds (our result pipe; the
                            worker's stdout) keep working, exactly the
                            already-open-fd allowance of seccomp-strict.
  RLIMIT_NPROC  = 0      -> fork()/exec spawning fails with EAGAIN.
  RLIMIT_FSIZE  = 0      -> growth of any regular file raises SIGXFSZ;
                            pipes/sockets are exempt, so the result
                            channel is unaffected.
  RLIMIT_CPU    = budget -> a runaway loop gets SIGXCPU instead of
                            wedging the executor (the reference relies
                            on the client timing out; we are stricter).

The child runs the user function over the whole Arrow batch and ships
pickled results back length-prefixed over a pipe; the parent waitpid()s
and translates abnormal exits into ``ConfinedCrash`` (-> ERR_SERVER at
the protocol layer, the same code the reference returns for a
seccomp-killed child).

Not byte-for-byte seccomp: a confined function can still read files it
could already reach via inherited fds, and pure-Python sandbox escapes
are out of scope -- this matches the reference's threat model (contain
buggy/hostile *native* behavior: I/O, spawn, runaway CPU), not a
general Python jail.
"""

from __future__ import annotations

import os
import pickle
import struct
from collections.abc import Callable

DEFAULT_CPU_SECONDS = 10

# Child exit status codes (parent maps them to protocol codes).
_EXIT_OK = 0
_EXIT_UDF_ERROR = 17      # user function raised -> ERR_SERVER
_EXIT_OVERSIZE = 18       # a single output burst the size cap -> ERR_XMIT


class ConfinedCrash(Exception):
    """The confined child died abnormally or reported a UDF error."""


class ConfinedOversize(Exception):
    """A confined output exceeded the per-value cap (ERR_XMIT)."""


def supported() -> bool:
    return hasattr(os, "fork")


def confined_batch(fn: Callable, args_list: list[tuple],
                   cpu_seconds: int = DEFAULT_CPU_SECONDS,
                   max_item_bytes: int | None = None) -> list:
    """Run ``fn(*args)`` for each tuple in ``args_list`` inside one
    rlimit-confined child; return the list of results.

    One fork per Arrow batch (not per row): fork is ~100us, a batch is
    10k rows, so confinement costs <1% on the hot path.  Raises
    ConfinedCrash on any child abnormality and ConfinedOversize when a
    result exceeds ``max_item_bytes``.
    """
    if not supported():  # pragma: no cover - POSIX-only container
        raise ConfinedCrash("confinement requires os.fork")
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:
        # ---- child ----
        try:
            os.close(r)
            _drop_privileges(cpu_seconds)
            results = []
            for args in args_list:
                out = fn(*args)
                if (max_item_bytes is not None and out is not None
                        and len(out) > max_item_bytes):
                    os.write(w, struct.pack("<BQ", _EXIT_OVERSIZE, 0))
                    os._exit(_EXIT_OVERSIZE)
                results.append(out)
            payload = pickle.dumps(results, protocol=pickle.HIGHEST_PROTOCOL)
            os.write(w, struct.pack("<BQ", _EXIT_OK, len(payload)))
            # A pipe write this large blocks until the parent drains it;
            # the parent reads concurrently below, so no deadlock.
            off = 0
            while off < len(payload):
                off += os.write(w, payload[off:off + 1 << 20])
            os._exit(_EXIT_OK)
        except BaseException:
            try:
                os.write(w, struct.pack("<BQ", _EXIT_UDF_ERROR, 0))
            except OSError:
                pass
            os._exit(_EXIT_UDF_ERROR)
    # ---- parent ----
    os.close(w)
    try:
        header = _read_exact(r, 9)
        if header is None:
            # Child died before writing a header (SIGXCPU, SIGKILL,
            # SIGXFSZ, segfault...).
            _reap(pid)
            raise ConfinedCrash("confined child died without a result")
        status, length = struct.unpack("<BQ", header)
        if status == _EXIT_OVERSIZE:
            _reap(pid)
            raise ConfinedOversize("confined output over the value cap")
        if status != _EXIT_OK:
            _reap(pid)
            raise ConfinedCrash("confined UDF raised")
        payload = _read_exact(r, length)
        code = _reap(pid)
        if payload is None or code != _EXIT_OK:
            raise ConfinedCrash("confined child truncated its result")
        return pickle.loads(payload)  # noqa: S301 - same-process trust domain
    finally:
        os.close(r)


def _drop_privileges(cpu_seconds: int) -> None:
    """Apply the seccomp-strict-analog rlimits.

    Root bypasses RLIMIT_NPROC (and can re-raise its own limits), so a
    root-run engine first sheds identity to ``nobody`` -- after that the
    limits are binding.  setuid must come before the rlimit drops
    (setuid itself needs no new resources and lowering limits is always
    permitted for an unprivileged uid)."""
    import resource

    if os.geteuid() == 0:
        nobody = 65534
        os.setgroups([])
        os.setgid(nobody)
        os.setuid(nobody)
    resource.setrlimit(resource.RLIMIT_NPROC, (0, 0))
    resource.setrlimit(resource.RLIMIT_FSIZE, (0, 0))
    resource.setrlimit(resource.RLIMIT_CPU, (cpu_seconds, cpu_seconds + 1))
    resource.setrlimit(resource.RLIMIT_NOFILE, (0, 0))


def _read_exact(fd: int, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = os.read(fd, min(1 << 20, n - len(buf)))
        if not chunk:
            return None
        buf += chunk
    return buf


def _reap(pid: int) -> int | None:
    _, status = os.waitpid(pid, 0)
    if os.WIFEXITED(status):
        return os.WEXITSTATUS(status)
    return None
