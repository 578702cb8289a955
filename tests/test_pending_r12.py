"""Round-12 queue faces: implemented and oracle-gated LOCALLY in round
11 (the two-round pattern: the r11 window's seats are spoken for by
the 39-entry deferred cohort plus the three r11 registrations, so new
faces queue).  Round 12 moves these from PENDING_R12_* into
QUERIES/ORACLES; the mechanical window (plans/window.py) then seats
them via rule 1 as never-driver-green.

Faces:
  token_bpe_encode      -- APPLY the trained BPE tokenizer to the
                           corpus (train -> encode, the production
                           tokenization step); per-doc BPE token count
                           vs whitespace word count.
  retrieval_rrf_fusion  -- reciprocal-rank fusion of the lexical
                           (n-gram Jaccard) and semantic (embedding
                           cosine) rankers, the hybrid-search shape.
  sketch_heavy_hitters  -- Count-Min frequency sketch: true top-K
                           tokens with exact vs estimated counts and
                           the one-sided overestimate (the frequency
                           twin of the KMV cardinality sketch).
"""

from __future__ import annotations

import pytest

from operating_system_map_reduce_spark.plans import curation, mining, pipeline
from tests.oracle_utils import compare, run_oracle

PENDING = {
    **{n: (fn, mining.PENDING_R12_ORACLES[n])
       for n, fn in mining.PENDING_R12_QUERIES.items()},
    **{n: (fn, pipeline.PENDING_R12_ORACLES[n])
       for n, fn in pipeline.PENDING_R12_QUERIES.items()},
    **{n: (fn, curation.PENDING_R12_ORACLES[n])
       for n, fn in curation.PENDING_R12_QUERIES.items()},
}


class TestPendingR12Parity:
    @pytest.mark.parametrize("name", sorted(PENDING))
    def test_oracle_parity_sf001(self, spark, oracle_sf_dir, name):
        fn, sql = PENDING[name]
        problems = compare(fn(spark, oracle_sf_dir),
                           run_oracle(sql, oracle_sf_dir))
        assert not problems, problems

    @pytest.mark.parametrize("name", sorted(PENDING))
    def test_no_scale_killers_in_plan(self, spark, sf_dir, name):
        fn, _ = PENDING[name]
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BatchEvalPython" not in plan, plan

    def test_pending_not_registered_in_round11(self):
        import __spark_entry__ as entrymod
        qs = entrymod.queries()
        assert len(qs) == 141
        for name in PENDING:
            assert name not in qs

    def test_r12_registration_keeps_the_window_feasible(self):
        """Registering both faces at r12 (registry 143, still under the
        ceiling-2 limit of 150) must leave no due entry deferred: with
        a fully green window11 ledger, the computed window12 seats the
        two never-green faces (rule 1) and every then-due entry."""
        import __spark_entry__ as entrymod
        from operating_system_map_reduce_spark.plans import window as _win
        registry11 = list(entrymod.queries())
        ledger = _win.load_ledger()
        head = max(ledger.values(), default=0)
        ledger12 = dict(ledger)
        ledger12.update({n: head + 1
                         for n in registry11[:_win.WINDOW_SIZE]})
        registry12 = registry11 + sorted(PENDING)
        assert len(registry12) <= 150   # the ceiling-2 pigeonhole bound
        window12 = _win.build_window(registry12, ledger12)
        assert all(n in window12 for n in PENDING)
        missing = [n for n in _win.due_entries(registry12, ledger12)
                   if n not in window12]
        assert not missing, f"registration would defer: {missing}"

    def test_bpe_encode_join_is_word_keyed_unhinted(self, spark, sf_dir):
        """The corpus pass is explode -> word-keyed equi-join -> hash
        agg; the vocab side grows with the corpus so it must carry NO
        broadcast hint (AQE may still pick broadcast at test SFs --
        the pin is on the hint, i.e. the logical plan)."""
        from pyspark.sql import functions as F
        plan = (mining.token_bpe_encode(spark, sf_dir)
                ._jdf.queryExecution().logical().toString())
        assert "UnresolvedHint" not in plan, plan

    def test_rrf_semantic_broadcast_is_query_sized(self, spark, sf_dir):
        """Every broadcast in the fusion plan carries a |Q|-bounded
        side: the 3 query vectors (semantic) or the 3 query docs'
        postings (lexical, explicitly hinted -- left to its estimates
        the planner broadcast the CORPUS postings, the round-11
        lying-estimate class).  A Python-stage broadcast subtree
        without the query-id filter is the corpus side -- forbidden."""
        import re

        from tests.test_plans import _broadcast_subtrees
        plan = (pipeline.retrieval_rrf_fusion(spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString())
        for sub in _broadcast_subtrees(plan):
            if re.search(r"MapInPandas|ArrowEvalPython", sub):
                assert re.search(r"IN \(3,13,23\)", sub), \
                    f"corpus-sized broadcast side:\n{sub}"
        assert "CartesianProduct" not in plan, plan


class TestRrfSemantics:
    def test_rrf_rewards_agreement(self, spark, oracle_sf_dir):
        """A doc ranked by BOTH modalities must outscore a doc holding
        the same single-ranker rank alone: score(r, r) > score(r, -)
        for every pooled rank r -- the fusion property itself."""
        rows = pipeline.retrieval_rrf_fusion(spark, oracle_sf_dir).collect()
        assert rows, "fusion returned no rows"
        for r in rows:
            assert r["in_lexical"] or r["in_semantic"]
            both = r["in_lexical"] and r["in_semantic"]
            single_max = 1.0 / (pipeline.RRF_C + 1)
            if r["rrf_score"] > single_max + 1e-9:
                assert both  # only agreement can beat the best single rank
        ranks = {}
        for r in rows:
            ranks.setdefault(r["query_id"], []).append(r["fused_rank"])
        for q, rs in ranks.items():
            assert rs == list(range(1, len(rs) + 1)), (q, rs)

    def test_cms_overestimate_is_one_sided(self, spark, oracle_sf_dir):
        """The Count-Min guarantee: est(t) >= true(t) for every probed
        token -- min over D independent overcounting rows can never
        undercount.  Also pins the report shape (exactly TOPK rows,
        descending exact counts)."""
        rows = curation.sketch_heavy_hitters(spark, oracle_sf_dir).collect()
        assert len(rows) == curation.CMS_TOPK
        counts = [r["exact_count"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        for r in rows:
            assert r["est_count"] >= r["exact_count"] >= 1
            assert r["overestimate"] == r["est_count"] - r["exact_count"]

    def test_encode_counts_are_consistent(self, spark, oracle_sf_dir):
        """Per doc: 1 <= n_bpe_tokens (merges only shrink, chars >=
        tokens) and n_bpe_tokens >= n_words (a word is >= 1 token);
        corpus-wide the BPE census must compress vs raw chars."""
        rows = mining.token_bpe_encode(spark, oracle_sf_dir).collect()
        assert rows
        for r in rows:
            assert r["n_bpe_tokens"] >= r["n_words"] >= 1
