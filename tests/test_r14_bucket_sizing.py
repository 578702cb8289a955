"""Corpus-scaled bucket count for the at-rest postings table (round 14).

The ngram decade probes localized dedup_ngram_jaccard's 17-18x
matched-layout decade ratio to per-task aggregate volume at the FIXED
32-bucket parallelism (candidates, output and input all exactly
replica-linear -- scripts/ngram_census.py): a bucketed join's
parallelism IS the bucket count, so a constant bucket count means
per-task state grows with the corpus and crosses the hash-aggregate
spill threshold at sf100.  The fix is the production write policy:
size the bucket count to the corpus at b_post write time
(scripts/ngram_decade_probe.py bucket probe), keeping per-bucket
source bytes roughly constant.

These tests pin the sizing policy itself -- pure filesystem, no Spark:

* the three measured corpus classes land on the probed cells
  (driver SFs -> 32, the sf10 replica corpus -> 32, the sf100 replica
  corpus -> 256);
* growth is power-of-two (bucketed-join co-partitioning across tables
  built at adjacent sizes stays cheap to reason about) and capped;
* a directory-of-parts corpus (the generated decade shape) sums its
  parquet parts;
* the env override (production: size to the cluster, not the corpus
  heuristic) wins unconditionally.
"""

from __future__ import annotations

import os

from operating_system_map_reduce_spark.plans.pipeline import (
    _POSTINGS_BUCKET_CAP,
    _POSTINGS_BUCKET_FLOOR,
    _postings_bucket_count,
)


def _corpus(tmp_path, name: str, nbytes: int, as_dir: bool = False) -> str:
    """An sf_dir whose documents.parquet has the given APPARENT size
    (sparse truncate -- the policy reads sizes, never bytes)."""
    sf_dir = tmp_path / name
    sf_dir.mkdir()
    target = sf_dir / "documents.parquet"
    if as_dir:
        target.mkdir()
        half = nbytes // 2
        for i, sz in enumerate((half, nbytes - half)):
            part = target / f"part-{i:05d}.snappy.parquet"
            with open(part, "wb") as fh:
                fh.truncate(sz)
        # non-parquet siblings (_SUCCESS, .crc) must not count
        (target / "_SUCCESS").write_bytes(b"")
    else:
        with open(target, "wb") as fh:
            fh.truncate(nbytes)
    return str(sf_dir)


class TestPostingsBucketCount:
    def test_measured_corpus_classes(self, tmp_path):
        # the probe matrix's three corpus classes (bytes as measured):
        # sf0.1 = 0.59 MB, sf10 replicas = 77 MB, sf100 replicas = 810 MB
        assert _postings_bucket_count(
            _corpus(tmp_path, "sf01", 594_568)) == 32
        assert _postings_bucket_count(
            _corpus(tmp_path, "sf10", 77_349_197)) == 32
        assert _postings_bucket_count(
            _corpus(tmp_path, "sf100", 809_740_107)) == 256

    def test_growth_is_pow2_monotone_and_capped(self, tmp_path):
        sizes = [1, 10 << 20, 200 << 20, 810 << 20, 8 << 30, 1 << 40]
        counts = [
            _postings_bucket_count(_corpus(tmp_path, f"c{i}", sz))
            for i, sz in enumerate(sizes)
        ]
        assert counts == sorted(counts), counts
        assert all(c & (c - 1) == 0 for c in counts), counts  # pow2
        assert counts[0] == _POSTINGS_BUCKET_FLOOR
        assert counts[-1] == _POSTINGS_BUCKET_CAP
        assert all(_POSTINGS_BUCKET_FLOOR <= c <= _POSTINGS_BUCKET_CAP
                   for c in counts), counts

    def test_directory_corpus_sums_parquet_parts_only(self, tmp_path):
        one = _corpus(tmp_path, "filecorpus", 809_740_107)
        parts = _corpus(tmp_path, "dircorpus", 809_740_107, as_dir=True)
        assert (_postings_bucket_count(parts)
                == _postings_bucket_count(one) == 256)

    def test_env_override_wins(self, tmp_path, monkeypatch):
        sf = _corpus(tmp_path, "envcorpus", 810 << 20)
        monkeypatch.setenv("SPARK_GRAFT_POSTINGS_BUCKETS", "64")
        assert _postings_bucket_count(sf) == 64
        monkeypatch.delenv("SPARK_GRAFT_POSTINGS_BUCKETS")
        assert _postings_bucket_count(sf) == 256
