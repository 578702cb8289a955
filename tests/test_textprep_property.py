"""Seeded randomized-differential tests for the textprep operators.

Pattern follows tests/test_property.py: one seeded bulk Spark run per
operator, compared against an independent pure-Python model over the
SAME generated corpus -- covering document shapes the driver testdata
never produces (sub-span docs, single-word docs, punctuation tokens,
skewed sources).  The corpus is written to a tmp parquet dir so the
operators run through their real load_table path (schema assertions
included).
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from operating_system_map_reduce_spark.plans import textprep as TP

VOCAB = ["the", "a", "of", "and", "table", "row", "scan", "x1", "zz",
         "cafe", "q", "hash,", "v.2", "-", "longishtokenword", "tok"]


def _gen_corpus(tmp_path, seed=1234, n=400):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_words = rng.choice([1, 3, 7, 8, 9, 31, 40, 64, 100])
        words = [rng.choice(VOCAB) for _ in range(n_words)]
        # plant recurring spans so span-dedup has work to do
        if rng.random() < 0.3 and n_words >= TP.SPAN_W:
            words[:TP.SPAN_W] = ["planted"] * TP.SPAN_W
        text = " ".join(words)
        rows.append({
            "doc_id": i,
            "text": text,
            "lang": rng.choice(["en", "de", "zh"]),
            "source": f"s{rng.randrange(4)}",
            "n_chars": len(text),
        })
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d), rows


def _hexval(hx: str) -> int:
    return int(hx[:12], 16)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return _gen_corpus(tmp_path_factory.mktemp("textprep"))


class TestQualityFilterDifferential:
    def test_census_matches_pure_python(self, spark, corpus):
        sf_dir, rows = corpus
        expected: dict[tuple[str, str], int] = {}
        for r in rows:
            toks = r["text"].split(" ")
            n_words = len(toks)
            mean_wlen = len(r["text"].replace(" ", "")) / n_words
            uniq = len(set(toks)) / n_words
            n_stop = len(set(toks) & set(TP.STOPWORDS))
            if n_words < TP.QF_MIN_WORDS:
                v = "too_short"
            elif mean_wlen < TP.QF_MEAN_WLEN_LO or mean_wlen > TP.QF_MEAN_WLEN_HI:
                v = "word_len"
            elif n_stop == 0:
                v = "no_stopwords"
            elif uniq < TP.QF_MIN_UNIQ:
                v = "repetitive"
            else:
                v = "keep"
            expected[(r["lang"], v)] = expected.get((r["lang"], v), 0) + 1
        got = {(r["lang"], r["verdict"]): r["n_docs"]
               for r in TP.quality_filter_composite(spark, sf_dir).collect()}
        assert got == expected


class TestSpanDedupDifferential:
    def test_top_spans_match_pure_python(self, spark, corpus):
        sf_dir, rows = corpus
        census: dict[str, list[int]] = {}
        for r in rows:
            toks = r["text"].split(" ")
            for i in range(len(toks) // TP.SPAN_W):
                chunk = " ".join(toks[i * TP.SPAN_W:(i + 1) * TP.SPAN_W])
                census.setdefault(hashlib.md5(chunk.encode()).hexdigest(),
                                  []).append(r["doc_id"])
        dups = {h: v for h, v in census.items() if len(v) > 1}
        expect = sorted(((len(v), h) for h, v in dups.items()),
                        key=lambda t: (-t[0], t[1]))[:50]
        got = [(r["n_occurrences"], r["span_hash"])
               for r in TP.dedup_span_exact(spark, sf_dir).collect()]
        assert got == expect
        for r in TP.dedup_span_exact(spark, sf_dir).collect():
            assert r["n_docs"] == len(set(dups[r["span_hash"]]))
            assert r["first_doc"] == min(dups[r["span_hash"]])


class TestDomainMixDifferential:
    def test_rates_and_coins_match_pure_python(self, spark, corpus):
        sf_dir, rows = corpus
        expected: dict[str, list[int]] = {}
        for r in rows:
            rate = _hexval(hashlib.md5(f"rate|{r['source']}".encode()).hexdigest()) % 50 + 50
            coin = _hexval(hashlib.md5(f"mix|{r['doc_id']}".encode()).hexdigest()) % 100
            n, kept, _ = expected.setdefault(r["source"], [0, 0, rate])
            expected[r["source"]] = [n + 1, kept + (1 if coin < rate else 0), rate]
        got = {r["source"]: [r["n_docs"], r["n_kept"], r["rate_pct"]]
               for r in TP.domain_mix_sample(spark, sf_dir).collect()}
        assert got == expected


class TestPackSequencesDifferential:
    def test_bins_match_pure_python_on_sparse_ids(self, spark, tmp_path):
        """Sparse, gappy doc_ids (never produced by the driver testdata)
        stress the id-range bucketing: offsets must still reconstruct
        the exact global cumsum."""
        rng = random.Random(77)
        ids = sorted(rng.sample(range(0, 50_000), 300))
        rows = []
        for i in ids:
            text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 120)))
            rows.append((i, text, "en", "s0", len(text)))
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        })
        d = tmp_path / "sparse"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))

        expected: dict[int, list] = {}
        cum = 0
        for i, text, *_ in rows:  # already in doc_id order
            n_tok = len(text.split(" "))
            b = cum // TP.PACK_BUDGET
            st = expected.setdefault(b, [0, 0, i, i])
            st[0] += 1
            st[1] += n_tok
            st[3] = i
            cum += n_tok
        got = {r["bin"]: [r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"]]
               for r in TP.pack_sequences(spark, str(d)).collect()}
        assert got == expected


class TestLmUnigramDifferential:
    def test_lang_scores_match_pure_python(self, spark, corpus):
        import math

        sf_dir, rows = corpus
        cnt: dict[str, int] = {}
        for r in rows:
            for t in r["text"].split(" "):
                cnt[t] = cnt.get(t, 0) + 1
        total = sum(cnt.values())
        per_lang: dict[str, list[float]] = {}
        for r in rows:
            toks = r["text"].split(" ")
            mean = sum(math.log(cnt[t]) for t in toks) / len(toks) - math.log(total)
            per_lang.setdefault(r["lang"], []).append(mean)
        got = {r["lang"]: r for r in TP.lm_unigram_score(spark, sf_dir).collect()}
        assert set(got) == set(per_lang)
        for lang, means in per_lang.items():
            assert got[lang]["n_docs"] == len(means)
            assert abs(got[lang]["avg_logp"] - sum(means) / len(means)) < 1e-5
            assert abs(got[lang]["worst_logp"] - min(means)) < 1e-5
            assert abs(got[lang]["best_logp"] - max(means)) < 1e-5


class TestPiiScrubDifferential:
    def test_counts_match_pure_python(self, spark, corpus):
        import re

        sf_dir, rows = corpus
        email_re = re.compile(TP.EMAIL_RE)
        phone_re = re.compile(TP.PHONE_RE)
        expected: dict[str, list[int]] = {}
        for r in rows:
            hx = hashlib.md5(f"pii|{r['doc_id']}".encode()).hexdigest()
            b = _hexval(hx) % 3
            text = r["text"]
            if b == 0:
                text += f" contact me at user{r['doc_id']}@example.com"
            elif b == 1:
                text += f" call +1-555-000-{r['doc_id'] % 10000:04d}"
            cur = expected.setdefault(r["source"], [0, 0, 0])
            cur[0] += 1
            cur[1] += len(email_re.findall(text))
            cur[2] += len(phone_re.findall(text))
        got = {r["source"]: [r["n_docs"], r["n_emails"], r["n_phones"]]
               for r in TP.text_pii_scrub(spark, sf_dir).collect()}
        assert got == expected
