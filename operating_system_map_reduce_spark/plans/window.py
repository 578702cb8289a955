"""Mechanical gate-window clock (round-9 verdict directive #1).

The driver's correctness gate checks the FIRST ``WINDOW_SIZE`` entries
of ``queries()`` in insertion order.  Through round 9 that window was a
hand-written list rebuilt each round; round 9 forgot to rebuild it and
43 entries blew past the codified 2-round staleness ceiling.  The
window is now a pure FUNCTION of

  * the CORRECTNESS_r*.json ledger the driver commits at repo root
    (newest green row per query), and
  * the ``REDEFINED`` declaration below (rule-2 re-entries),

so rotation cannot be skipped: when a round's correctness file lands,
the next import computes the next window from it.  Window rotation is
commit #1 of every round -- with this module, "rotating" means at most
appending to ``REDEFINED`` for queries whose plan/oracle changed; the
clock itself ticks on its own.

Selection rules (codified round 7, unchanged):
  1. queries that have NEVER had a green driver row lead the window;
  2. queries whose plan/oracle definition changed since their newest
     green row re-enter regardless of age (a green row for old
     semantics verifies nothing);
  3. remaining seats refresh oldest-newest-row-first (ties broken by
     name for determinism).
Past ``HALVES_THRESHOLD`` registered queries the rule-3 pool alternates
between the two name-sorted halves of the registry by round parity
(the round-8 growth plan), with rules 1-2 always jumping the
alternation.  That keeps the per-query ceiling at 2 rounds up to
N = 200.

Staleness ceiling: no registered query's newest green driver row may
be more than TWO rounds behind HEAD at judge time.  With N <= 150 and
a 50-seat window, oldest-first gives every entry a seat at least every
ceil(N/50) = 3 rounds, so post-recovery staleness at judge time never
exceeds 2.  When the due backlog exceeds the window (the round-9 skip
left 88 entries due for round 10), the window saturates with the
OLDEST due entries and the remainder recovers next round --
``deferred_due`` names them so the recovery schedule is explicit.
"""

from __future__ import annotations

import glob
import json
import os
import re

WINDOW_SIZE = 50
HALVES_THRESHOLD = 150
STALENESS_CEILING = 2  # rounds behind HEAD at judge time

# Rule-2 declarations: query name -> round in which its plan or oracle
# definition last CHANGED.  An entry jumps the age queue while its
# newest green row predates its redefinition round; once the driver
# re-greens it the jump expires on its own.  Append-only ledger -- old
# entries are kept as the audit trail.
REDEFINED: dict[str, int] = {
    # round 7 (see _window7_history in plans/__init__.py)
    "orders_above_customer_avg": 7,
    "similarity_cosine_topk": 7,
    "text_tfidf_top_terms": 7,
    "events_gap_fill": 7,
    # round 8 (see _window8_history in plans/__init__.py)
    "q19_disjunctive_revenue": 8,
    "events_funnel": 8,
    "events_retention_cohorts": 8,
    "q3_shipping_priority": 8,
    "q5_region_revenue": 8,
    # round 9: coalesce guard on the snapshot probe changed the plan,
    # but round 9 failed to re-enter it (round-9 verdict, What's wrong
    # #2) -- it re-enters here
    "changelog_asof": 9,
    # round 10: staging re-planned from a persist + per-wave
    # repartition(1) loop to ONE partitioned write job (round-9
    # verdict directive #4)
    "stream_novelty_filter": 10,
}


def _repo_root() -> str:
    # plans/window.py -> plans -> package -> repo root; the ledger
    # files are committed next to __spark_entry__.py
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load_ledger(root: str | None = None) -> dict[str, int]:
    """Newest GREEN driver round per query, from CORRECTNESS_r*.json.

    Green = no error, row counts match, and neither schema nor hash
    compare failed (rows-only faces report hash_match=None -- that is
    their strongest available check and counts as their green row,
    matching how the judge reads the ledger)."""
    newest: dict[str, int] = {}
    pat = os.path.join(root or _repo_root(), "CORRECTNESS_r*.json")
    for path in glob.glob(pat):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (row.get("err") is None
                     and row.get("rows_match") is True
                     and row.get("schema_match") is not False
                     and row.get("hash_match") is not False)
            if green and rnd > newest.get(name, -1):
                newest[name] = rnd
    return newest


def build_window(registry: list[str], ledger: dict[str, int],
                 redefined: dict[str, int] | None = None,
                 size: int = WINDOW_SIZE) -> list[str]:
    """Deterministic gate window for the CURRENT round.

    Current round = 1 + the newest round in the ledger (the driver
    writes round N's file at N's end, so during round N the ledger
    tops out at N-1)."""
    redefined = REDEFINED if redefined is None else redefined
    head = max(ledger.values(), default=0)
    current_round = head + 1

    never = sorted(n for n in registry if n not in ledger)
    rule2 = sorted(n for n in registry
                   if n in ledger and redefined.get(n, -1) > ledger[n])
    seated = set(never) | set(rule2)
    rest = sorted((n for n in registry if n not in seated),
                  key=lambda n: (ledger[n], n))
    if len(registry) > HALVES_THRESHOLD:
        # alternating halves: even rounds prefer the first name-sorted
        # half of the registry, odd rounds the second; rules 1-2 above
        # already jumped the alternation
        halves = sorted(registry)
        first = set(halves[:len(halves) // 2])
        in_active = ((lambda n: n in first) if current_round % 2 == 0
                     else (lambda n: n not in first))
        rest = ([n for n in rest if in_active(n)]
                + [n for n in rest if not in_active(n)])
    return (never + rule2 + rest)[:size]


def due_entries(registry: list[str], ledger: dict[str, int],
                redefined: dict[str, int] | None = None) -> list[str]:
    """Entries that MUST be (re-)checked this round: never green,
    redefined since their newest green row, or at/past the staleness
    ceiling (newest green row <= head - STALENESS_CEILING, i.e. the
    row would be > ceiling rounds behind at this round's judge)."""
    redefined = REDEFINED if redefined is None else redefined
    head = max(ledger.values(), default=0)
    out = []
    for n in registry:
        rnd = ledger.get(n)
        if (rnd is None or redefined.get(n, -1) > rnd
                or rnd <= head - STALENESS_CEILING):
            out.append(n)
    return out


def deferred_due(registry: list[str], ledger: dict[str, int],
                 redefined: dict[str, int] | None = None,
                 size: int = WINDOW_SIZE) -> list[str]:
    """Due entries that do NOT fit this round's window (recovery debt
    owed to the NEXT round).  Non-empty only while a skipped rotation
    is being paid down; the freshness pin in tests/test_plans.py
    asserts it is only ever non-empty when the window is saturated
    with due entries."""
    window = set(build_window(registry, ledger, redefined, size))
    return [n for n in due_entries(registry, ledger, redefined)
            if n not in window]
