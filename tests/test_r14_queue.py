"""Round-14 queue machinery, built and gated in round 13 under the
two-round pattern (implement + locally pin while the current window is
spoken for; register next round where rule 2 seats the face).

Item 4 of the r14 queue (plans/__init__.py): ppjoin's verify
re-expressed as the count-join over the at-rest postings.  The r13
fourth-decade probe localized the face's only superlinear term to the
ARRAY verify (pairs x ~4 KB shingle arrays ~ 130 GB at sf100, crossing
the per-task spill threshold at any heap, while candidates measured
exactly replica-linear); the count form moves only narrow grouped rows
-- the r12 containment lesson applied to ppjoin.  These tests pin, for
the UNREGISTERED staged shape:

  * exactness: identical rows to the registered face (differential,
    standard fixture + the adversarial crafted corpus);
  * no Python stage; the scan is the b_post bucketed table;
  * the postings self-join introduces NO corpus-keyed exchange --
    only pair-keyed aggregates and the report ORDER BY shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from operating_system_map_reduce_spark.plans.pipeline import (
    dedup_jaccard_ppjoin_countjoin)
from test_corpus_edge_parity import corpus_edge_dir  # noqa: F401

_QUERIES = entrymod.queries()

_PY_NODES = ("MapInPandas", "ArrowEvalPython",
             "FlatMapGroupsInPandas", "BatchEvalPython")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPpjoinCountJoin:
    def test_matches_registered_exactly(self, spark, sf_dir):
        got = sorted(map(tuple, dedup_jaccard_ppjoin_countjoin(
            spark, sf_dir).collect()))
        want = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce high-threshold pairs"

    def test_matches_registered_on_adversarial_corpus(self, spark,
                                                      corpus_edge_dir):
        got = sorted(map(tuple, dedup_jaccard_ppjoin_countjoin(
            spark, corpus_edge_dir).collect()))
        want = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, corpus_edge_dir).collect()))
        assert got == want
        assert len(got) > 0

    def test_plan_shape(self, spark, sf_dir):
        """No Python stage, no array payload anywhere (the term this
        shape removes), the b_post scan feeding an exchange-free
        self-join: every hash exchange keys on pair columns."""
        plan = _plan(dedup_jaccard_ppjoin_countjoin(spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the count-join plan:\n{plan}"
        assert "b_post_" in plan.lower()
        assert "array_intersect" not in plan, \
            "the count form must not ship array payloads"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nobc = _plan(dedup_jaccard_ppjoin_countjoin(spark, sf_dir))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", nobc):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange survived: {keys}\n{nobc}"
