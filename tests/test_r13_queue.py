"""Round-13 queue machinery, built and gated in round 12 under the
two-round pattern (implement + locally pin while the current window is
spoken for; register next round where rule 2 seats the faces).

Item (2) of the r13 rule-2 queue (plans/__init__.py): the at-rest
bucketed POSTINGS table.  The ngram tier's postings self-join carries
a round-11 SHUFFLE_HASH pin because both sides are corpus-grown behind
the mapInPandas shingling barrier; written bucketed+sorted on the
shingle, the self-join is exchange-free and every estimate is a real
parquet statistic.  These tests pin, for the UNREGISTERED variant:

  * exactness: identical rows to the registered face (differential);
  * no Python stage anywhere in the query plan;
  * the scan is the b_post_ bucketed table;
  * the postings self-join introduces NO shuffle exchange below it --
    the only exchanges in the plan belong to the candidate-bounded
    pair aggregate and the final ORDER BY.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from operating_system_map_reduce_spark.plans.mining import (
    dedup_containment_atrest)
from operating_system_map_reduce_spark.plans.pipeline import (
    bucketed_postings, dedup_jaccard_ppjoin_atrest, dedup_ngram_jaccard_atrest)
# session fixture with crafted degenerate docs (empty/whitespace/
# single-token/containment/near-dup pairs) -- imported so the staged
# variants face the adversarial corpus BEFORE their r13 registration
from test_corpus_edge_parity import corpus_edge_dir  # noqa: F401

_QUERIES = entrymod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestAtRestPostings:
    def test_atrest_ngram_matches_registered_exactly(self, spark, sf_dir):
        got = sorted(map(tuple, dedup_ngram_jaccard_atrest(spark, sf_dir)
                         .collect()))
        want = sorted(map(tuple, _QUERIES["dedup_ngram_jaccard"](
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce near-dup pairs"

    def test_atrest_plan_has_no_python_stage(self, spark, sf_dir):
        plan = _plan(dedup_ngram_jaccard_atrest(spark, sf_dir))
        for node in ("MapInPandas", "ArrowEvalPython",
                     "FlatMapGroupsInPandas", "BatchEvalPython"):
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        assert "b_post_" in plan.lower()

    def test_postings_self_join_is_exchange_free(self, spark, sf_dir):
        """The whole point of the at-rest layout: the corpus-sized
        postings rows never move.  Any Exchange hashpartitioning in
        the plan must key on pair columns (id_a/id_b -- the candidate
        aggregate), never on the shingle join key; and with broadcast
        disabled the join must be a zero-exchange SortMergeJoin of two
        bucketed scans."""
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(dedup_ngram_jaccard_atrest(spark, sf_dir))
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange survived: {keys}\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

    def test_atrest_ppjoin_matches_registered_exactly(self, spark, sf_dir):
        """The last postings consumer staged: PPJoin's candidates from
        the shingle-bucketed postings, its verify arrays from the
        doc_id-bucketed signature (n re-derived as size(shingles) --
        same py_shingles output on both paths)."""
        got = sorted(map(tuple, dedup_jaccard_ppjoin_atrest(spark, sf_dir)
                         .collect()))
        want = sorted(map(tuple, _QUERIES["dedup_jaccard_ppjoin"](
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0, "fixture must produce high-threshold pairs"

    def test_atrest_ppjoin_plan_shape(self, spark, sf_dir):
        """No Python stage anywhere; both at-rest tables feed the plan;
        no localCheckpoint/persist scan (every reused subtree is a
        table scan, so nothing pins executor storage)."""
        plan = _plan(dedup_jaccard_ppjoin_atrest(spark, sf_dir))
        for node in ("MapInPandas", "ArrowEvalPython",
                     "FlatMapGroupsInPandas", "BatchEvalPython"):
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        low = plan.lower()
        assert "b_post_" in low and "b_sig_" in low
        assert "InMemoryTableScan" not in plan
        assert "Scan ExistingRDD" not in plan  # the checkpoint scan shape

    def test_atrest_containment_matches_registered_exactly(self, spark,
                                                           sf_dir):
        got = sorted(map(tuple, dedup_containment_atrest(spark, sf_dir)
                         .collect()))
        want = sorted(map(tuple, _QUERIES["dedup_containment"](
            spark, sf_dir).collect()))
        assert got == want
        assert len(got) > 0
        plan = _plan(dedup_containment_atrest(spark, sf_dir))
        for node in ("MapInPandas", "ArrowEvalPython",
                     "FlatMapGroupsInPandas", "BatchEvalPython"):
            assert node not in plan, f"{node} in the at-rest plan:\n{plan}"
        assert "b_post_" in plan.lower()

    @pytest.mark.parametrize("atrest,registered", [
        (dedup_ngram_jaccard_atrest, "dedup_ngram_jaccard"),
        (dedup_jaccard_ppjoin_atrest, "dedup_jaccard_ppjoin"),
        (dedup_containment_atrest, "dedup_containment"),
    ])
    def test_atrest_parity_on_adversarial_corpus(self, spark,
                                                 corpus_edge_dir,
                                                 atrest, registered):
        """The staged variants must agree with their registered faces
        on the crafted degenerate corpus too (empty docs, one-token
        docs, exact/containment/near-dup pairs, pathological
        repetition) -- the fixture the registered faces already pass
        against the DuckDB oracle, run here BEFORE r13 swaps the
        plans."""
        got = sorted(map(tuple, atrest(spark, corpus_edge_dir).collect()))
        want = sorted(map(tuple, _QUERIES[registered](
            spark, corpus_edge_dir).collect()))
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
