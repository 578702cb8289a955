"""Round-15 queue machinery, built and pinned in round 14 under the
two-round pattern: INCREMENTAL maintenance of the at-rest postings
tier (the r13 verdict's "What's missing #4" -- at 100 TB an appending
corpus wants delta-proportional index maintenance, not the
rebuild-on-mtime full pass the static benchmark tables pay).

Lifecycle under test (plans/pipeline.py postings_seed / postings_append
/ postings_delta_from_changelog + sources/bucketing.append_bucketed /
compact_bucketed):

  * seed: one-time full build of the bucketed postings table;
  * append: NEW docs' postings land in their correct bucket files --
    delta-proportional, and co-bucketed joins stay exchange-free
    across any number of appends;
  * CDC feed: the delta comes from the SAME ChangeLog machinery the
    KV tier replays (a documents-schema log, tail past a seq);
  * compact: restores one file per bucket (the sort guarantee appends
    suspend) -- the reference's append + SAV lifecycle
    (p4/server/my_storage.cc) applied to the analytic tier.

Equivalence discipline = changelog_incremental_agg's: the oracle is
the from-scratch FULL REBUILD over (base union delta); row identity
proves append == rebuild.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from operating_system_map_reduce_spark.operators import dedup as _dd
from operating_system_map_reduce_spark.plans.pipeline import (
    _ngram_pair_rows, postings_append, postings_delta_from_changelog,
    postings_seed)
from operating_system_map_reduce_spark.sources.bucketing import (
    compact_bucketed)
from operating_system_map_reduce_spark.sources.tables import load_table

N_BUCKETS = 8  # small fixture; the production default is 32


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def postings_table(spark):
    table = f"b_posti_test_{uuid.uuid4().hex[:8]}"
    yield table
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}_compacting")


class TestIncrementalPostings:
    def test_append_equals_full_rebuild(self, spark, sf_dir,
                                        postings_table):
        docs = _docs(spark, sf_dir)
        base = docs.filter(F.col("doc_id") % 10 != 7)
        delta = docs.filter(F.col("doc_id") % 10 == 7)
        postings_seed(spark, base, postings_table, N_BUCKETS)
        postings_append(spark, delta, postings_table, N_BUCKETS)
        got = _rows(spark.table(postings_table))
        want = _rows(_dd.shingle_postings(docs))
        assert got == want
        assert len(got) > 0

    def test_multiple_appends_and_consumer_parity(self, spark, sf_dir,
                                                  postings_table):
        """Three ingest ticks, then the CONSUMER-level check: the
        near-dup pair derivation over the incrementally-maintained
        table matches the pairs over a from-scratch build."""
        docs = _docs(spark, sf_dir)
        base = docs.filter(F.col("doc_id") % 4 == 0)
        postings_seed(spark, base, postings_table, N_BUCKETS)
        for k in (1, 2, 3):
            postings_append(spark, docs.filter(F.col("doc_id") % 4 == k),
                            postings_table, N_BUCKETS)
        got = _rows(_ngram_pair_rows(spark.table(postings_table)))
        want = _rows(_ngram_pair_rows(_dd.shingle_postings(docs)))
        assert got == want
        assert len(got) > 0, "fixture must produce near-dup pairs"

    def test_join_stays_exchange_free_after_append(self, spark, sf_dir,
                                                   postings_table):
        """The scale contract: appends must not cost the bucketed
        layout -- the postings self-join stays free of corpus-keyed
        exchanges (only pair-keyed aggregates shuffle), exactly the
        registered faces' plan-shape pin."""
        docs = _docs(spark, sf_dir)
        postings_seed(spark, docs.filter(F.col("doc_id") % 2 == 0),
                      postings_table, N_BUCKETS)
        postings_append(spark, docs.filter(F.col("doc_id") % 2 == 1),
                        postings_table, N_BUCKETS)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (_ngram_pair_rows(spark.table(postings_table))
                    ._jdf.queryExecution().executedPlan().toString())
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        import re
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
            keys = m.group(1)
            assert "id_a" in keys or "id_b" in keys, \
                f"corpus-keyed exchange after append: {keys}\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

    def test_randomized_splits_append_equals_rebuild(self, spark, sf_dir,
                                                     postings_table):
        """Seeded randomized differential (the repo's property-test
        convention for Spark-heavy paths): arbitrary seed/append
        partitions of the corpus -- including an empty tick and a
        single-doc tick -- must all replay to the full rebuild."""
        import random

        rng = random.Random(0x5EED)
        docs = _docs(spark, sf_dir)
        ids = [r[0] for r in docs.select("doc_id").collect()]
        want = _rows(_dd.shingle_postings(docs))
        for trial in range(2):
            spark.sql(f"DROP TABLE IF EXISTS {postings_table}")
            rng.shuffle(ids)
            n_ticks = rng.randint(2, 4)
            cuts = sorted(rng.sample(range(1, len(ids)), n_ticks))
            parts = [ids[a:b] for a, b in
                     zip([0] + cuts, cuts + [len(ids)])]
            parts.append([])             # an empty ingest tick
            parts.append([parts[0].pop()])  # and a single-doc tick
            seed_ids = parts[0]
            postings_seed(
                spark, docs.filter(F.col("doc_id").isin(seed_ids)),
                postings_table, N_BUCKETS)
            for chunk in parts[1:]:
                postings_append(
                    spark, docs.filter(F.col("doc_id").isin(chunk)),
                    postings_table, N_BUCKETS)
            got = _rows(spark.table(postings_table))
            assert got == want, f"trial {trial} diverged"

    def test_changelog_fed_delta(self, spark, sf_dir, postings_table,
                                 tmp_path):
        """The CDC feed end-to-end: base docs snapshot at seq S, delta
        docs appended to the ChangeLog past S, the maintenance tick
        consumes exactly the tail, and the table equals the rebuild."""
        from operating_system_map_reduce_spark.sources.changelog import (
            ChangeLog)

        docs = _docs(spark, sf_dir).orderBy("doc_id").limit(120)
        rows = [r.asDict() for r in docs.collect()]
        schema = StructType([
            StructField("seq", LongType()),
            StructField("op", StringType()),
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ])
        log = ChangeLog(spark, str(tmp_path / "doclog"), schema,
                        key_col="doc_id")
        records = [{"seq": i + 1, "op": "insert", **r}
                   for i, r in enumerate(rows)]
        snap = 80
        log.append(records[:snap])
        base = log.replay().select("doc_id", "text")
        postings_seed(spark, base, postings_table, N_BUCKETS)
        log.append(records[snap:])
        delta = postings_delta_from_changelog(log, since_seq=snap)
        assert delta.count() == len(records) - snap
        postings_append(spark, delta.select("doc_id", "text"),
                        postings_table, N_BUCKETS)
        got = _rows(spark.table(postings_table))
        want = _rows(_dd.shingle_postings(
            log.replay().select("doc_id", "text")))
        assert got == want

    def test_signature_append_equals_full_rebuild(self, spark, sf_dir,
                                                  postings_table):
        """The pattern generalizes to the signature tier: b_sig rows
        are per-doc too, so seed + delta-append is row-identical to
        the from-scratch build -- including at the LSH-bands consumer
        level (the novelty seed path's input)."""
        from operating_system_map_reduce_spark.plans.pipeline import (
            signature_append, signature_seed)

        docs = _docs(spark, sf_dir)
        base = docs.filter(F.col("doc_id") % 10 != 3)
        delta = docs.filter(F.col("doc_id") % 10 == 3)
        signature_seed(spark, base, postings_table, N_BUCKETS)
        signature_append(spark, delta, postings_table, N_BUCKETS)
        got = _rows(spark.table(postings_table))
        want = _rows(_dd.minhash_signature(docs))
        assert got == want
        assert len(got) > 0
        got_b = _rows(_dd.lsh_bands(spark.table(postings_table))
                      .select("doc_id", "band_idx", "band_hash"))
        want_b = _rows(_dd.lsh_bands(_dd.minhash_signature(docs))
                       .select("doc_id", "band_idx", "band_hash"))
        assert got_b == want_b

    def test_staged_face_matches_registered_ngram(self, spark, sf_dir):
        """The r15 registration candidate: dedup_ngram_incremental
        (pairs served from the seed->append->compact lifecycle table)
        must be row-identical to the registered dedup_ngram_jaccard
        over the full corpus -- the same from-scratch-oracle
        equivalence the driver gate would enforce."""
        import __spark_entry__ as entrymod
        from operating_system_map_reduce_spark.plans.pipeline import (
            dedup_ngram_incremental)

        got = _rows(dedup_ngram_incremental(spark, sf_dir))
        want = _rows(entrymod.queries()["dedup_ngram_jaccard"](
            spark, sf_dir))
        assert got == want
        assert len(got) > 0

    def test_compact_restores_single_file_per_bucket(self, spark, sf_dir,
                                                     postings_table):
        """After the SAV-analog compaction: identical rows, and the
        fragmentation is gone -- at most one data file per bucket, so
        the at-rest sort guarantee is back."""
        from urllib.parse import urlparse

        docs = _docs(spark, sf_dir)
        postings_seed(spark, docs.filter(F.col("doc_id") % 3 == 0),
                      postings_table, N_BUCKETS)
        for k in (1, 2):
            postings_append(spark, docs.filter(F.col("doc_id") % 3 == k),
                            postings_table, N_BUCKETS)
        before = _rows(spark.table(postings_table))
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        loc = os.path.join(wh, postings_table.lower())
        n_frag = len([f for f in os.listdir(loc) if f.endswith(".parquet")])
        assert n_frag > N_BUCKETS, "appends must have fragmented buckets"
        compact_bucketed(spark, postings_table, "s", N_BUCKETS)
        assert _rows(spark.table(postings_table)) == before
        loc = os.path.join(wh, postings_table.lower())
        n_files = len([f for f in os.listdir(loc) if f.endswith(".parquet")])
        assert n_files <= N_BUCKETS, \
            f"compaction left {n_files} files for {N_BUCKETS} buckets"
