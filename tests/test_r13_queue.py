"""Round-13 seat-exact at-rest swap (staged + measured in round 12
under the two-round pattern; registered here).

The five postings-consumer faces now ride the at-rest tables:

  * dedup_ngram_jaccard  -- self-join of the shingle-bucketed b_post
    table (exchange-free; round-11 SHUFFLE_HASH pin DROPPED -- nothing
    is left for a lying estimate to break, and at rest the pin
    measured as noise);
  * dedup_containment    -- same postings source; pin REMOVED late in
    the round (the planned keep -- hash-build-over-sort, 1.7x at sf10
    -- was REVERSED by the round's own sf100 run: the SHJ per-bucket
    hash build cannot spill and OOMs at the fourth decade; registered
    shape is the unpinned exchange-free SortMergeJoin);
  * dedup_jaccard_ppjoin -- candidates from b_post, verify arrays from
    the doc_id-bucketed b_sig table; no materialization at all;
  * pagerank_neardup / dedup_graph_triangles -- edge set from the
    at-rest b_edge table (bucketed_edges), replacing the
    localCheckpoint whose ContextCleaner cadence swung graph timings
    ~2x run-to-run.

These tests pin, for the REGISTERED faces:

  * exactness: identical rows to the through-Python ``_shuffle``
    witnesses each face rode through round 12 (differential, on both
    the standard fixture and the adversarial crafted corpus);
  * no Python stage anywhere in the executed plans;
  * the scans are the bucketed warehouse tables;
  * the postings self-join introduces NO corpus-keyed shuffle -- the
    only exchanges belong to candidate-bounded pair aggregates and
    report ORDER BYs;
  * the graph faces hold no checkpoint/persist blocks (every reused
    subtree is a table scan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from operating_system_map_reduce_spark.plans.mining import (
    dedup_containment_shuffle)
from operating_system_map_reduce_spark.plans.pipeline import (
    bucketed_edges, bucketed_postings, dedup_jaccard_ppjoin_shuffle,
    dedup_ngram_jaccard_shuffle)
# session fixture with crafted degenerate docs (empty/whitespace/
# single-token/containment/near-dup pairs) -- the registered at-rest
# faces must agree with their through-Python witnesses there too
from test_corpus_edge_parity import corpus_edge_dir  # noqa: F401

_QUERIES = entrymod.queries()

_PY_NODES = ("MapInPandas", "ArrowEvalPython",
             "FlatMapGroupsInPandas", "BatchEvalPython")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestAtRestPostings:
    def test_ngram_matches_shuffle_witness_exactly(self, spark, sf_dir):
        got = sorted(map(tuple, _QUERIES["dedup_ngram_jaccard"](
            spark, sf_dir).collect()))
        want = sorted(map(tuple, dedup_ngram_jaccard_shuffle(
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce near-dup pairs"

    def test_ngram_plan_has_no_python_stage(self, spark, sf_dir):
        plan = _plan(_QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        assert "b_post_" in plan.lower()

    def test_ngram_pin_is_gone(self, spark, sf_dir):
        """The round-11 SHUFFLE_HASH pin guarded a lying estimate that
        cannot exist at rest; strategy choice is AQE's again."""
        logical = (_QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
                   ._jdf.queryExecution().logical().toString())
        assert "UnresolvedHint" not in logical, logical

    def test_postings_self_join_is_exchange_free(self, spark, sf_dir):
        """The whole point of the at-rest layout: the corpus-sized
        postings rows never move.  Any Exchange hashpartitioning in
        the plan must key on pair columns (id_a/id_b -- the candidate
        aggregate), never on the shingle join key; and with broadcast
        disabled the join must be a zero-exchange SortMergeJoin of two
        bucketed scans."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(_QUERIES["dedup_ngram_jaccard"](spark, sf_dir))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange survived: {keys}\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

    def test_ppjoin_matches_shuffle_witness_exactly(self, spark, sf_dir):
        got = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, sf_dir).collect()))
        want = sorted(map(tuple, dedup_jaccard_ppjoin_shuffle(
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce high-threshold pairs"

    def test_ppjoin_plan_shape(self, spark, sf_dir):
        """No Python stage anywhere; both at-rest tables feed the plan;
        no localCheckpoint/persist scan (every reused subtree is a
        table scan, so nothing pins executor storage).  Pins the R13
        prefix/positional + array-verify shape -- unregistered as
        dedup_jaccard_ppjoin_arrayverify since the r14 count-join swap
        (tests/test_r14_queue.py pins the registered face)."""
        from operating_system_map_reduce_spark.plans.pipeline import (
            dedup_jaccard_ppjoin_arrayverify)
        plan = _plan(dedup_jaccard_ppjoin_arrayverify(spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        low = plan.lower()
        assert "b_post_" in low and "b_sig_" in low
        assert "InMemoryTableScan" not in plan
        assert "Scan ExistingRDD" not in plan  # the checkpoint scan shape

    def test_containment_matches_shuffle_witness_exactly(self, spark,
                                                         sf_dir):
        got = sorted(map(tuple, _QUERIES["dedup_containment"](
            spark, sf_dir).collect()))
        want = sorted(map(tuple, dedup_containment_shuffle(
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0
        plan = _plan(_QUERIES["dedup_containment"](spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        assert "b_post_" in plan.lower()
        # NO pin (the r13 sf100 reversal): the pinned SHJ's per-bucket
        # hash build cannot spill and OOMs at sf100.  Strategy choice
        # is the planner's again (it broadcasts at tiny SF); past any
        # broadcast threshold the plan must be the exchange-free,
        # spillable SortMergeJoin of two bucketed scans with no
        # corpus-keyed exchange.
        logical = (_QUERIES["dedup_containment"](spark, sf_dir)
                   ._jdf.queryExecution().logical().toString())
        assert "UnresolvedHint" not in logical, logical
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            nobc = _plan(_QUERIES["dedup_containment"](spark, sf_dir))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in nobc, nobc
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", nobc):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange survived: {keys}\n{nobc}"

    @pytest.mark.parametrize("witness,registered", [
        (dedup_ngram_jaccard_shuffle, "dedup_ngram_jaccard"),
        (dedup_jaccard_ppjoin_shuffle, "dedup_jaccard_ppjoin"),
        (dedup_containment_shuffle, "dedup_containment"),
    ])
    def test_registered_parity_on_adversarial_corpus(self, spark,
                                                     corpus_edge_dir,
                                                     witness, registered):
        """The registered at-rest faces must agree with their
        through-Python witnesses on the crafted degenerate corpus too
        (empty docs, one-token docs, exact/containment/near-dup pairs,
        pathological repetition) -- the fixture the witnesses already
        pass against the DuckDB oracle."""
        got = sorted(map(tuple, _QUERIES[registered](
            spark, corpus_edge_dir).collect()))
        want = sorted(map(tuple, witness(spark, corpus_edge_dir).collect()))
        assert got == want
        assert len(got) > 0

    def test_bucketed_postings_schema_and_point_prune(self, spark, sf_dir):
        post = bucketed_postings(spark, sf_dir)
        assert set(post.columns) == {"doc_id", "n", "s"}
        # bucket pruning on the shingle key: the at-rest index also
        # serves point probes (which docs contain shingle X?) reading
        # 1/32 of the files -- the inverted-index lookup story
        probe = post.select("s").first()[0]
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            plan = _plan(post.filter(F.col("s") == probe))
        finally:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled")
        assert "SelectedBucketsCount: 1 out of 32" in plan, plan


class TestAtRestEdges:
    def test_edges_match_registered_pairs(self, spark, sf_dir):
        got = sorted(map(tuple, bucketed_edges(spark, sf_dir).collect()))
        want = sorted(map(tuple, _QUERIES["dedup_ngram_jaccard"](
            spark, sf_dir).select("id_a", "id_b").collect()))
        assert got == want
        assert len(got) > 0

    @pytest.mark.parametrize("face", ["pagerank_neardup",
                                      "dedup_graph_triangles"])
    def test_graph_faces_ride_the_edge_table(self, spark, sf_dir, face):
        """Edge references are bucketed table scans: no Python stage,
        no checkpoint scan (Scan ExistingRDD), no persisted block
        (InMemoryTableScan) -- the de-noise fix for the ~2x
        ContextCleaner swing the r12 verdict flagged."""
        plan = _plan(_QUERIES[face](spark, sf_dir))
        for node in _PY_NODES:
            assert node not in plan, f"{node} in the graph plan:\n{plan}"
        assert "b_edge_" in plan.lower(), plan
        assert "Scan ExistingRDD" not in plan, plan
        assert "InMemoryTableScan" not in plan, plan
