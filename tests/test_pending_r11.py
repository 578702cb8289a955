"""Round-11 faces: implemented and oracle-gated LOCALLY in round 10
while the registry sat frozen at 138 (the recovery round spent every
gate seat on the stale cohort -- round-9 verdict directive #3), then
registered into QUERIES/ORACLES in round 11, where the mechanical
window (plans/window.py) seats them via rule 1 as never-driver-green.
The local parity gates stay: they are the faces' pre-driver evidence.
"""

from __future__ import annotations

import pytest

from operating_system_map_reduce_spark.plans import mining, pipeline
from tests.oracle_utils import compare, run_oracle

R11_FACES = {
    "token_bpe_trained": (mining.QUERIES["token_bpe_trained"],
                          mining.ORACLES["token_bpe_trained"]),
    "multimodal_text_curation": (pipeline.QUERIES["multimodal_text_curation"],
                                 pipeline.ORACLES["multimodal_text_curation"]),
}


class TestR11FacesParity:
    @pytest.mark.parametrize("name", sorted(R11_FACES))
    def test_oracle_parity_sf001(self, spark, oracle_sf_dir, name):
        fn, sql = R11_FACES[name]
        problems = compare(fn(spark, oracle_sf_dir),
                           run_oracle(sql, oracle_sf_dir))
        assert not problems, problems

    @pytest.mark.parametrize("name", sorted(R11_FACES))
    def test_no_scale_killers_in_plan(self, spark, sf_dir, name):
        fn, _ = R11_FACES[name]
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_registered_and_seated_in_round11(self):
        """Both faces are in the live registry, and while they have no
        driver row the mechanical window seats them (rule 1) WITHOUT
        costing the 39 deferred r7 entries their recovery seats."""
        import __spark_entry__ as entrymod
        from operating_system_map_reduce_spark.plans import window as _win
        qs = entrymod.queries()
        assert len(qs) >= 141          # 141 at r11; r12 registered 3 more
        registry = list(qs)
        ledger = _win.load_ledger()
        window = _win.build_window(registry, ledger)
        for name in R11_FACES:
            assert name in qs
            if name not in ledger:          # no driver row yet: rule 1
                assert name in window
        # Registration must not cost due entries their seats -- unless
        # the window is SATURATED with due entries (more due than
        # seats: a forced choice, not a displacement).  Round 13 hits
        # exactly this: 46 r10-green at-ceiling entries + 5 rule-2
        # re-entries = 51 due into 50 seats, so deferred_due() names
        # one recovery-debt entry; the saturation rule in
        # test_plans.test_staleness_ceiling_or_saturated_recovery
        # adjudicates it (every seat spent on a due entry).
        missing = _win.deferred_due(registry, ledger)
        if missing:
            due = set(_win.due_entries(registry, ledger))
            assert set(window) <= due, \
                f"deferred due entries while non-due entries hold seats: {missing}"

    def test_bpe_census_aggregates_partially_mapside(self, spark, sf_dir):
        """Pin the per-round stage (the outer trained plan only shows
        checkpointed 1-row RDDs): the word-count and pair census both
        combine map-side, and the argmax rides TakeOrderedAndProject --
        no global sort of the census ever ships."""
        from pyspark.sql import functions as F
        vocab = mining._bpe_word_counts(spark, sf_dir).select(
            "w", "f",
            F.expr("array_join(filter(split(w, ''), c -> c <> ''), ' ')")
            .alias("s"))
        stage = (mining._bpe_pair_census(vocab)
                 .orderBy(F.desc("n_merge"), "a", "b").limit(1))
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "partial_sum" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert "Exchange SinglePartition" not in plan, plan

    def test_curation_joins_are_keyed_on_doc_id(self, spark, sf_dir):
        plan = (pipeline.multimodal_text_curation(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestBpeTrainedSemantics:
    def test_fold_is_left_to_right_non_overlapping(self, spark):
        """The aaaa/(a,a) case: exactly [aa, aa], never aaa-chaining."""
        from pyspark.sql import functions as F
        vocab = spark.createDataFrame(
            [("aaaa", 1, "a a a a"), ("abb", 1, "a b b")], "w string, f long, s string")
        best = spark.createDataFrame([("a", "a")], "a string, b string")
        got = {r["w"]: r["s"]
               for r in mining._bpe_apply_merge(vocab, best).collect()}
        assert got == {"aaaa": "aa aa", "abb": "a b b"}
        best2 = spark.createDataFrame([("a", "b")], "a string, b string")
        got2 = {r["w"]: r["s"]
                for r in mining._bpe_apply_merge(vocab, best2).collect()}
        assert got2["abb"] == "ab b"

    def test_merges_are_distinct_and_ranked(self, spark, oracle_sf_dir):
        rows = mining.token_bpe_trained(spark, oracle_sf_dir).collect()
        assert [r["merge_rank"] for r in rows] == list(
            range(1, mining.N_BPE_MERGES + 1))
        pairs = {(r["a"], r["b"]) for r in rows}
        assert len(pairs) == mining.N_BPE_MERGES  # a pair merges once
        assert all(r["merged"] == r["a"] + r["b"] for r in rows)
