"""The unigram-LM train+encode oracle (r16): the registered
`unigram_lm_tokens` query replays hard-EM training AND Viterbi
encoding in DuckDB SQL (__spark_entry__._sql_unigram_lm).  These tests
close the verification triangle:

  engine (Spark)  <-- test_oracle_parity (real corpus, driver-style)
       ^
       |  test_engine_matches_replica_on_pinned_config (below)
       v
  python replica  <-- test_sql_oracle_fuzz_* (below, random corpora,
  (reuses the          both prune branches, no Spark -- the
  engine's             test_spfhp_oracle_sql_fuzz pattern)
  viterbi_segment) --> SQL oracle
"""

import math
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_stream_flink_user_address_spark.functions.unigram_lm import (
    _round_half_away,
    viterbi_segment,
)

VOCAB_SIZE = entrymod._ULM_VOCAB_SIZE
MAX_PIECE_LEN = entrymod._ULM_MAX_PIECE_LEN
SEED_SIZE = entrymod._ULM_SEED_SIZE
ROUND = entrymod._ULM_ROUND


# ---------------------------------------------------------------- replica
def _word_vocab(texts):
    wv = {}
    for t in texts:
        if t is None or not t.strip():
            continue
        for w in t.strip().split():
            wv[w] = wv.get(w, 0) + 1
    return wv


def _seed(wv):
    counts = {}
    for w, cnt in wv.items():
        n = len(w)
        for i in range(n):
            for piece_len in range(1, min(MAX_PIECE_LEN, n - i) + 1):
                p = w[i : i + piece_len]
                counts[p] = counts.get(p, 0) + cnt
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:SEED_SIZE]
    cands = dict(chars)
    cands.update(dict(multi))
    total0 = sum(cands.values())
    return {
        p: _round_half_away(math.log(c / total0), ROUND)
        for p, c in cands.items()
    }


def _em(wv, logp):
    agg = {}
    for w, cnt in wv.items():
        for piece in viterbi_segment(w, logp, MAX_PIECE_LEN)[0]:
            agg[piece] = agg.get(piece, 0) + cnt
    total = sum(agg.values())
    new = {
        p: _round_half_away(math.log(n / total), ROUND)
        for p, n in agg.items()
    }
    floor = (min(new.values()) if new else 0.0) - 1.0
    for p in logp:
        if len(p) == 1 and p not in new:
            new[p] = floor
    return new


def replica_train(wv):
    """unigram_lm_train with the registered pinned config (vocab_size,
    max_piece_len=3, seed_size_mult=2, n_em_iters=1, prune_frac=1.0,
    logprob_round=6): seed -> EM -> [one prune to budget -> EM] ->
    final EM.  Returns (piece_logp, pruned_branch_taken)."""
    p1 = _em(wv, _seed(wv))
    n_multi = sum(1 for p in p1 if len(p) > 1)
    budget = max(VOCAB_SIZE - (len(p1) - n_multi), 0)
    if n_multi <= budget:
        return _em(wv, p1), False
    drop = n_multi - budget
    kept = dict(p1)
    for p in sorted(
        (p for p in p1 if len(p) > 1), key=lambda p: (p1[p], p)
    )[:drop]:
        del kept[p]
    return _em(wv, _em(wv, kept)), True


def replica_encode(rows, logp):
    cache = {}
    out = []
    for did, t in rows:
        if t is None or not t.strip():
            continue
        toks = t.strip().split()
        nps, segs = 0, []
        for w in toks:
            if w not in cache:
                ps = viterbi_segment(w, logp, MAX_PIECE_LEN)[0]
                cache[w] = (" ".join(ps), len(ps))
            s, n = cache[w]
            segs.append(s)
            nps += n
        out.append((did, len(toks), nps, " ".join(segs)))
    return sorted(out)


def _sql_vs_replica(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs_t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs_t VALUES (?, ?)", rows)
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_t")
    got = sorted(con.execute(entrymod._SQL_UNIGRAM_LM).fetchall())
    wv = _word_vocab([t for _, t in rows])
    final, pruned = replica_train(wv)
    want = replica_encode(rows, final)
    assert got == want, (pruned, got[:3], want[:3])
    return pruned


# ------------------------------------------------------------------ tests
def test_sql_oracle_fuzz_random_corpora():
    """Random corpora over a 9-symbol alphabet: every trial must match
    the replica end-to-end (piece probabilities feed Viterbi DECISIONS,
    so any round-6 / tie-break divergence surfaces as a different
    encoding, not a small numeric delta).  The seed-count regime makes
    these all take the PRUNE branch."""
    rng = random.Random(7)
    alphabet = "abcdexyz."
    saw_prune = False
    for trial in range(6):
        rows = []
        for i in range(rng.randint(1, 30)):
            words = [
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 9))
                )
                for _ in range(rng.randint(0, 12))
            ]
            rows.append((i, " ".join(words)))
        saw_prune |= _sql_vs_replica(rows)
    assert saw_prune, "fuzz never exercised the prune branch"


def test_sql_oracle_fuzz_unicode_alphabet():
    """Mixed unicode/punctuation alphabet: substr/length/list ordering
    must agree across Python (code points) and DuckDB for non-ASCII
    pieces too -- the regime real web text puts the tokenizer in."""
    rng = random.Random(11)
    alphabet = "ab\u00e9\u00fc\u4e2d.?'"
    for _ in range(3):
        rows = []
        for i in range(rng.randint(2, 15)):
            words = [
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 7))
                )
                for _ in range(rng.randint(1, 8))
            ]
            rows.append((i, " ".join(words)))
        _sql_vs_replica(rows)


def test_sql_oracle_no_prune_branch():
    """Tiny corpora (few multi-char candidates) take the NO-prune
    branch: the oracle's gate must select the p2b continuation."""
    for rows in (
        [(0, "ab ab b")],
        [(0, "xy"), (1, "xy xyz")],
        [(0, "a")],
    ):
        assert _sql_vs_replica(rows) is False


def test_sql_oracle_driver_corpus_prunes():
    """On the driver's own documents corpus the registered config must
    exercise the prune branch (vocab_size below the multi-candidate
    count) -- the branch the driver row actually hash-verifies."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs_t AS SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    rows = con.execute("SELECT doc_id, text FROM docs_t").fetchall()
    _, pruned = replica_train(_word_vocab([t for _, t in rows]))
    assert pruned


def test_engine_matches_replica_on_pinned_config(spark):
    """The Spark engine under the registered pinned config equals the
    replica exactly -- train piece table AND encode rows -- closing
    the engine<->replica edge of the triangle (parity covers
    engine<->SQL on the real corpus)."""
    from data_stream_flink_user_address_spark.functions.unigram_lm import (
        unigram_lm_encode,
        unigram_lm_train,
    )

    rows = [
        (0, "banana bandana"),
        (1, "banana banana cabana"),
        (2, "bandana van"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = unigram_lm_train(
        df, vocab_size=VOCAB_SIZE, max_piece_len=MAX_PIECE_LEN,
        seed_size_mult=2, n_em_iters=1, prune_frac=1.0,
        logprob_round=ROUND,
    )
    got_pieces = {r["piece"]: r["logprob"] for r in pieces.collect()}
    want_pieces, _ = replica_train(_word_vocab([t for _, t in rows]))
    assert got_pieces == want_pieces

    enc = unigram_lm_encode(df, pieces, max_piece_len=MAX_PIECE_LEN)
    got = sorted(
        (r["doc_id"], r["n_words"], r["n_pieces"], r["encoded"])
        for r in enc.collect()
    )
    assert got == replica_encode(rows, want_pieces)
