"""Seeded randomized differential for the BPE trainer (plans/mining.py
bpe_train): the distributed census -> argmax -> merge-fold recurrence
vs an independent pure-Python BPE reference (Sennrich et al. 2016
semantics: weighted adjacent-pair counts over the vocabulary, argmax
with (count DESC, a ASC, b ASC) tie-break, left-to-right
non-overlapping merge application) over generated vocabularies the
driver testdata never produces -- repeated characters, single-char
words, words that collapse to one symbol mid-training, tie-heavy
distributions.
"""

from __future__ import annotations

import random

import pytest

from operating_system_map_reduce_spark.plans import mining as M


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference trainer: the classic i+=2 scan, no folds."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        census: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                census[syms[i], syms[i + 1]] = census.get(
                    (syms[i], syms[i + 1]), 0) + f
        if not census:
            break
        # argmax with (count DESC, a ASC, b ASC)
        (a, b), n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def _spark_bpe(spark, word_freqs: dict[str, int], n_merges: int):
    rows = [(w, f, " ".join(w)) for w, f in word_freqs.items()]
    vocab = spark.createDataFrame(rows, "w string, f long, s string")
    got = M.bpe_train(vocab, n_merges).collect()
    return [(r["merge_rank"], r["a"], r["b"], r["merged"], r["n_merge"])
            for r in got]


ALPHABET = "abc"


def _gen_vocab(rng: random.Random, n_words: int) -> dict[str, int]:
    out: dict[str, int] = {}
    for _ in range(n_words):
        w = "".join(rng.choice(ALPHABET)
                    for _ in range(rng.randint(1, 8)))
        out[w] = out.get(w, 0) + rng.randint(1, 5)
    return out


class TestBpeTrainerDifferential:
    @pytest.mark.parametrize("seed", [7, 21, 99, 1234])
    def test_random_vocab_matches_python_reference(self, spark, seed):
        """3-letter alphabet forces heavy pair collisions and ties; 4
        merge rounds exercise merged-symbol pairs (e.g. ('ab', 'a'))
        as left and right operands of later merges."""
        rng = random.Random(seed)
        wf = _gen_vocab(rng, n_words=60)
        want = _py_bpe(wf, 4)
        got = _spark_bpe(spark, wf, 4)
        assert got == want, f"seed={seed}: {got} != {want}"

    def test_repeated_char_runs(self, spark):
        """aaaa-style runs are where overlapping-merge bugs live: the
        (a, a) merge must produce [aa, aa], never chain into aaa."""
        wf = {"aaaa": 3, "aaa": 2, "aa": 5, "a": 7, "baab": 1}
        assert _spark_bpe(spark, wf, 3) == _py_bpe(wf, 3)

    def test_vocab_collapsing_to_single_symbols(self, spark):
        """Two-char words fully merge in round 1 and must then sit out
        the census (no pairs) without erroring -- the sequence(1, 0)
        descent guard."""
        wf = {"ab": 10, "cd": 4, "x": 1}
        want = _py_bpe(wf, 2)
        got = _spark_bpe(spark, wf, 2)
        assert got == want
        assert got[0][1:4] == ("a", "b", "ab")

    def test_merge_exhaustion_truncates_the_table(self, spark):
        """More rounds requested than pairs exist: the census dries up
        and both trainers emit only the merges that happened."""
        wf = {"ab": 2, "c": 9}
        got = _spark_bpe(spark, wf, 3)
        assert got == _py_bpe(wf, 3)
        assert len(got) == 1
