"""Property-based test for the r17 mark+cut substring-dedup composite
(`substring_dup_spans` -> `remove_dup_spans`, the registered
`substring_dedup_cut` frame): engine output must equal an independent
pure-Python replica of Lee et al. 2022's mark+cut semantics on
hypothesis-generated corpora -- tiny alphabets force genuine repeated
k-grams (within and across documents), and the generator mixes
irregular whitespace, short docs, empty and NULL texts, so the
pass-through / normalization / NULL contracts are exercised together
with real cuts."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_stream_flink_user_address_spark.functions.dedup import (
    remove_dup_spans,
    substring_dup_spans,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

# 3-word alphabet + irregular separators: with k=3 and docs up to 12
# words, repeated 3-grams are common both within and across docs
_WORD = st.sampled_from(["aa", "bb", "cc"])
_SEPARATOR = st.sampled_from([" ", "  ", "\t", "\n", " \n "])


@st.composite
def _doc(draw):
    if draw(st.booleans()) and draw(st.integers(0, 9)) == 0:
        return draw(st.sampled_from([None, "", "   "]))
    words = draw(st.lists(_WORD, min_size=1, max_size=12))
    seps = [draw(_SEPARATOR) for _ in range(len(words) - 1)]
    text = words[0]
    for sep, w in zip(seps, words[1:]):
        text += sep + w
    # occasional leading/trailing whitespace
    if draw(st.booleans()):
        text = " " + text + "\n"
    return text


def _replica_mark_cut(docs: dict, k: int) -> dict:
    """Independent mark+cut: global k-gram occurrence counting over
    whitespace-normalized tokens, removal set = union of duplicated
    gram covers, survivors re-join with single spaces; docs with
    nothing to cut (or NULL) pass through untouched."""
    toks = {
        did: (t.split() if t is not None else None)
        for did, t in docs.items()
    }
    counts: dict = {}
    for did, tt in toks.items():
        if not tt or len(tt) < k:
            continue
        for i in range(len(tt) - k + 1):
            g = " ".join(tt[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for did, t in docs.items():
        tt = toks[did]
        removed = set()
        if tt and len(tt) >= k:
            for i in range(len(tt) - k + 1):
                if counts[" ".join(tt[i : i + k])] >= 2:
                    removed.update(range(i, i + k))
        if not removed:
            out[did] = (t, 0)
        else:
            kept = [w for i, w in enumerate(tt) if i not in removed]
            out[did] = (" ".join(kept), len(removed))
    return out


@settings(**_SETTINGS)
@given(texts=st.lists(_doc(), min_size=1, max_size=10))
def test_mark_cut_matches_python_replica(spark, texts):
    k = 3
    docs = {did: t for did, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    spans = substring_dup_spans(df, k=k)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_removed"])
        for r in remove_dup_spans(df, spans).collect()
    }
    want = _replica_mark_cut(docs, k)
    assert got == want
    # removal accounting: the producer's merged spans are disjoint, so
    # tokens removed == sum(span_tokens) per doc
    span_sums: dict = {}
    for r in spans.collect():
        span_sums[r["doc_id"]] = span_sums.get(r["doc_id"], 0) + r[
            "span_tokens"
        ]
    for did, (_t, n) in got.items():
        assert n == span_sums.get(did, 0)
