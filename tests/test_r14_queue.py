"""Round-14 registration of the ppjoin count-join verify (staged and
differential-pinned in round 13 under the two-round pattern; the r13
fourth-decade probe localized the face's only superlinear term to the
ARRAY verify -- pairs x ~4 KB shingle arrays ~ 130 GB at sf100,
crossing the per-task spill threshold at any heap, while candidates
measured exactly replica-linear; the count form moves only narrow
grouped rows -- the r12 containment lesson applied to ppjoin).

The REGISTERED ``dedup_jaccard_ppjoin`` is now the count-join body;
the r13 prefix/positional + array-verify shape lives on unregistered
as ``dedup_jaccard_ppjoin_arrayverify``, the witness.  These tests
pin, for the REGISTERED face:

  * exactness: identical rows to BOTH witnesses (the r13 array-verify
    shape and the through-Python shuffle shape), on the standard
    fixture and the adversarial crafted corpus;
  * no Python stage; the scan is the b_post bucketed table;
  * no array payload anywhere in the plan (the term this shape
    removes);
  * the postings self-join introduces NO corpus-keyed exchange --
    only pair-keyed aggregates and the report ORDER BY shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from operating_system_map_reduce_spark.plans.pipeline import (
    dedup_jaccard_ppjoin_arrayverify, dedup_jaccard_ppjoin_shuffle)
from test_corpus_edge_parity import corpus_edge_dir  # noqa: F401

_QUERIES = entrymod.queries()

_PY_NODES = ("MapInPandas", "ArrowEvalPython",
             "FlatMapGroupsInPandas", "BatchEvalPython")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPpjoinCountJoin:
    @pytest.mark.parametrize("witness", [
        dedup_jaccard_ppjoin_arrayverify, dedup_jaccard_ppjoin_shuffle])
    def test_matches_witnesses_exactly(self, spark, sf_dir, witness):
        got = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, sf_dir).collect()))
        want = sorted(map(tuple, witness(spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce high-threshold pairs"

    @pytest.mark.parametrize("witness", [
        dedup_jaccard_ppjoin_arrayverify, dedup_jaccard_ppjoin_shuffle])
    def test_matches_witnesses_on_adversarial_corpus(self, spark,
                                                     corpus_edge_dir,
                                                     witness):
        got = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, corpus_edge_dir).collect()))
        want = sorted(map(tuple, witness(spark, corpus_edge_dir).collect()))
        assert got == want
        assert len(got) > 0

    def test_plan_shape(self, spark, sf_dir):
        """No Python stage, no array payload anywhere (the term this
        shape removes), the b_post scan feeding an exchange-free
        self-join: every hash exchange keys on pair columns."""
        plan = _plan(_QUERIES["dedup_jaccard_ppjoin"](spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the count-join plan:\n{plan}"
        assert "b_post_" in plan.lower()
        assert "array_intersect" not in plan, \
            "the count form must not ship array payloads"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nobc = _plan(_QUERIES["dedup_jaccard_ppjoin"](spark, sf_dir))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", nobc):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange survived: {keys}\n{nobc}"
