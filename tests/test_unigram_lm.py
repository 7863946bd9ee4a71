"""Unigram-LM tokenizer (functions/unigram_lm.py): Viterbi optimality
and determinism, hard-EM training vs an independent pure-Python
replica, coverage/pruning invariants, and the encode path's
doc-reassembly contract."""

import itertools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.unigram_lm import (
    UNK_LOGPROB_OFFSET,
    unigram_lm_encode,
    unigram_lm_train,
    viterbi_segment,
)


def _all_segmentations(word, max_len):
    """Every segmentation of word into pieces of length <= max_len."""
    if not word:
        yield []
        return
    for l in range(1, min(max_len, len(word)) + 1):
        for rest in _all_segmentations(word[l:], max_len):
            yield [word[:l]] + rest


def _score(seg, logp, unk):
    s = 0.0
    for p in seg:
        if p in logp:
            s += logp[p]
        elif len(p) == 1:
            s += unk
        else:
            return None
    return s


class TestViterbi:
    LOGP = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.05), "abab": math.log(0.2),
    }

    def test_optimal_against_exhaustive_enumeration(self):
        unk = min(self.LOGP.values()) + UNK_LOGPROB_OFFSET
        for word in ["abab", "aab", "baba", "ababab", "bb", "a"]:
            pieces, got = viterbi_segment(word, self.LOGP, 4)
            assert "".join(pieces) == word
            best = max(
                s
                for seg in _all_segmentations(word, 4)
                if (s := _score(seg, self.LOGP, unk)) is not None
            )
            assert abs(got - best) < 1e-9, word

    def test_oov_char_fallback(self):
        pieces, score = viterbi_segment("axb", self.LOGP, 4)
        assert pieces == ["a", "x", "b"]
        unk = min(self.LOGP.values()) + UNK_LOGPROB_OFFSET
        assert abs(
            score - (self.LOGP["a"] + unk + self.LOGP["b"])
        ) < 1e-9

    def test_tie_breaks_deterministic_fewer_pieces_first(self):
        # p(xy) == p(x)p(y): segmentations tie -- fewer pieces wins
        logp = {"x": math.log(0.5), "y": math.log(0.5), "xy": math.log(0.25)}
        assert viterbi_segment("xy", logp, 2)[0] == ["xy"]


def _replica_train(word_counts, seeds, max_len, vocab_size, n_iters, frac):
    """From-scratch hard-EM replica mirroring unigram_lm_train's spec:
    Viterbi E-step (same shared kernel), count M-step with char floor,
    gradual lowest-prob pruning."""
    total0 = sum(seeds.values())
    logp = {p: math.log(c / total0) for p, c in seeds.items()}

    def em(cur):
        agg = {}
        for w, c in word_counts.items():
            for p in viterbi_segment(w, cur, max_len)[0]:
                agg[p] = agg.get(p, 0) + c
        tot = sum(agg.values())
        new = {p: math.log(n / tot) for p, n in agg.items()}
        floor = (min(new.values()) if new else 0.0) - 1.0
        for p in cur:
            if len(p) == 1 and p not in new:
                new[p] = floor
        return new

    while True:
        for _ in range(n_iters):
            logp = em(logp)
        multi = [p for p in logp if len(p) > 1]
        budget = max(vocab_size - (len(logp) - len(multi)), 0)
        if len(multi) <= budget:
            break
        drop = min(len(multi) - budget, max(1, int(len(multi) * frac)))
        for p in sorted(multi, key=lambda p: (logp[p], p))[:drop]:
            del logp[p]
    return em(logp)


def test_train_matches_python_replica(spark):
    corpus = (
        ["the cat sat"] * 4
        + ["the mat sat flat"] * 3
        + ["cats chat"] * 2
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["piece"]: r["logprob"]
        for r in unigram_lm_train(
            df, vocab_size=12, max_piece_len=4, n_em_iters=2,
            prune_frac=0.25, seed_size_mult=4,
        ).collect()
    }

    # replica inputs derived independently
    word_counts = {}
    for t in corpus:
        for w in t.split():
            word_counts[w] = word_counts.get(w, 0) + 1
    sub_counts = {}
    for w, c in word_counts.items():
        for i, l in itertools.product(range(len(w)), range(1, 5)):
            if i + l <= len(w):
                p = w[i:i + l]
                sub_counts[p] = sub_counts.get(p, 0) + c
    chars = {p: c for p, c in sub_counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[: 4 * 12]
    seeds = {**chars, **dict(multi)}
    want = _replica_train(word_counts, seeds, 4, 12, 2, 0.25)

    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-9, p


def test_vocab_budget_and_char_coverage(spark):
    corpus = ["aaab aab abab baba abba bab" for _ in range(5)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    pieces = unigram_lm_train(df, vocab_size=6, max_piece_len=3).collect()
    by_len = {r["piece"]: r["logprob"] for r in pieces}
    assert len(by_len) <= 6
    # every alphabet char survives pruning
    assert "a" in by_len and "b" in by_len


def test_encode_reassembles_docs_and_compresses(spark):
    corpus = ["interesting interest rest resting" for _ in range(4)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    pieces = unigram_lm_train(df, vocab_size=24, max_piece_len=8)
    out = {r["doc_id"]: r for r in unigram_lm_encode(df, pieces).collect()}
    assert set(out) == {0, 1, 2, 3}
    lp = {r["piece"]: r["logprob"] for r in pieces.collect()}
    for r in out.values():
        assert r["n_words"] == 4
        # encoded concatenates back to the original words
        segs = r["encoded"].split(" ")
        assert "".join(segs) == "interestinginterestrestresting"
        assert r["n_pieces"] == len(segs)
        # trained vocab beats character-level segmentation
        assert r["n_pieces"] < len("interestinginterestrestresting")
        # every emitted piece is in the table (no OOV in-train)
        assert all(p in lp for p in segs)
        # encode matches the shared kernel word by word
        want = []
        for w in ["interesting", "interest", "rest", "resting"]:
            want.extend(viterbi_segment(w, lp, 8)[0])
        assert segs == want


def test_train_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, "ab ba aab abb") for i in range(3)], "doc_id long, text string"
    )
    a = sorted(map(tuple, unigram_lm_train(df, vocab_size=8).collect()))
    b = sorted(map(tuple, unigram_lm_train(df, vocab_size=8).collect()))
    assert a == b


def test_encode_driver_hybrid_matches_distributed(spark, monkeypatch):
    """r19 encode hybrid: under _ULM_DRIVER_VOCAB distinct words the
    per-word Viterbi runs on the driver (one probe collect, no
    mapInPandas job); forcing the threshold to 0 pins the distributed
    branch.  Both branches must emit identical rows -- same
    viterbi_segment kernel, same piece dict."""
    import data_stream_flink_user_address_spark.functions.unigram_lm as ulm

    corpus = ["interesting interest rest resting", "rest in the interest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus * 2)], "doc_id long, text string"
    )
    pieces = unigram_lm_train(df, vocab_size=24, max_piece_len=8)
    drv = sorted(
        tuple(r) for r in unigram_lm_encode(df, pieces).collect()
    )  # default threshold: driver branch (vocab is tiny)
    monkeypatch.setattr(ulm, "_ULM_DRIVER_VOCAB", 0)
    dist = sorted(tuple(r) for r in unigram_lm_encode(df, pieces).collect())
    assert drv == dist
