"""Seeded randomized differential for the Count-Min heavy-hitter
sketch (plans/curation.cms_heavy_hitters): the distributed build ->
broadcast probe vs an independent pure-Python CMS (Cormode &
Muthukrishnan 2005 semantics: D rows of W counters, row d counts by
the affine universal hash (a_d*x + b_d) mod p mod W over the shared
md5-derived 48-bit token value; est = min over rows) over generated
token distributions the driver testdata never produces -- tiny
vocabularies (top-K degenerates to all tokens), tie-heavy counts
(the (cnt DESC, tok ASC) boundary order is load-bearing), and a
forced-collision regime (vocabulary >> W buckets so every bucket
aggregates many tokens and overestimates are large and nonzero).
"""

from __future__ import annotations

import hashlib
import random

import pytest

from operating_system_map_reduce_spark.operators import dedup as _dd
from operating_system_map_reduce_spark.plans import curation as C


def _hv(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % _dd.MINHASH_P


def _py_cms(counts: dict[str, int]):
    """Pure-Python reference: dict-of-dicts sketch, no Spark."""
    sketch = [dict() for _ in range(C.CMS_D)]
    for tok, cnt in counts.items():
        x = _hv(tok)
        for d in range(C.CMS_D):
            b = (C.CMS_A[d] * x + C.CMS_B[d]) % _dd.MINHASH_P % C.CMS_W
            sketch[d][b] = sketch[d].get(b, 0) + cnt
    topk = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:C.CMS_TOPK]
    out = []
    for tok, cnt in topk:
        x = _hv(tok)
        est = min(
            sketch[d][(C.CMS_A[d] * x + C.CMS_B[d]) % _dd.MINHASH_P % C.CMS_W]
            for d in range(C.CMS_D))
        out.append((tok, cnt, est, est - cnt))
    return out


def _spark_cms(spark, counts: dict[str, int]):
    tc = spark.createDataFrame(sorted(counts.items()), "tok string, cnt long")
    got = C.cms_heavy_hitters(tc).collect()
    return [(r["tok"], r["exact_count"], r["est_count"], r["overestimate"])
            for r in got]


def _gen_counts(rng: random.Random, n_tokens: int,
                alphabet: str = "abcd", max_len: int = 6) -> dict[str, int]:
    out: dict[str, int] = {}
    for _ in range(n_tokens):
        t = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, max_len)))
        out[t] = out.get(t, 0) + rng.randint(1, 9)
    return out


class TestCmsDifferential:
    @pytest.mark.parametrize("seed", [3, 17, 404, 9000])
    def test_random_counts_match_python_reference(self, spark, seed):
        rng = random.Random(seed)
        counts = _gen_counts(rng, n_tokens=300)
        assert _spark_cms(spark, counts) == _py_cms(counts)

    def test_tiny_vocab_degenerates_to_all_tokens(self, spark):
        """Fewer distinct tokens than TOPK: the report holds every
        token, and with no bucket collisions est == exact."""
        counts = {"aa": 5, "bb": 3, "cc": 3}
        got = _spark_cms(spark, counts)
        assert got == _py_cms(counts)
        assert len(got) == 3
        assert all(over == 0 for _, _, _, over in got)

    def test_forced_collisions_still_one_sided(self, spark):
        """Vocabulary ~8x the bucket width: every row of the sketch
        aggregates many tokens, so overestimates are large -- but never
        negative, and the minimum over D rows still matches the
        reference exactly."""
        rng = random.Random(1)
        counts = _gen_counts(rng, n_tokens=C.CMS_W * 8, alphabet="abcdefgh",
                             max_len=8)
        assert len(counts) > C.CMS_W  # the collision regime is real
        got = _spark_cms(spark, counts)
        assert got == _py_cms(counts)
        assert all(o >= 0 for _, _, _, o in got)
        assert any(o > 0 for _, _, _, o in got)
