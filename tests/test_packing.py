"""sequence_pack_offsets: exact prefix-sum semantics, bucket-boundary
correctness, and the no-global-window plan shape."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_stream_flink_user_address_spark.functions.packing import (
    sequence_pack_offsets,
)


def test_offsets_match_sequential_model(spark):
    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(1, 25)]
    # bucket_size 7 forces several buckets; seq_len 10 forces splits
    out = sequence_pack_offsets(
        spark.createDataFrame(rows, "doc_id long, text string"),
        seq_len=10,
        sep_tokens=1,
        bucket_size=7,
    )
    got = {r.doc_id: r for r in out.collect()}

    off = 0
    for doc_id, text in rows:
        n = len(text.split())
        r = got[doc_id]
        assert r.n_tokens == n
        assert r.start_offset == off, doc_id
        assert r.end_offset == off + n
        assert r.first_chunk == off // 10
        assert r.last_chunk == (off + n - 1) // 10
        assert r.n_chunks_spanned == r.last_chunk - r.first_chunk + 1
        off += n + 1  # separator


def test_empty_doc_zero_width(spark):
    rows = [(1, "a b c"), (2, ""), (3, "d e")]
    out = sequence_pack_offsets(
        spark.createDataFrame(rows, "doc_id long, text string"),
        seq_len=4,
        bucket_size=2,
    )
    got = {r.doc_id: r for r in out.collect()}
    assert got[2].n_tokens == 0
    assert got[2].start_offset == got[2].end_offset == 4  # 3 tokens + sep
    assert got[2].n_chunks_spanned == 1
    assert got[3].start_offset == 5  # empty doc still pays its separator


def test_no_unpartitioned_window_over_docs(spark):
    # the corpus-wide frame must never hit a single-partition ordered
    # window; only the bucket-sum frame (one row per bucket) may
    df = spark.range(1000).selectExpr("id as doc_id", "'w w w' as text")
    out = sequence_pack_offsets(df, bucket_size=100)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # every single-partition exchange must sit above the bucket
    # aggregate (its input carries __btot), never above raw doc rows
    for seg in plan.split("Exchange SinglePartition")[1:]:
        inputs = seg.split("Input", 1)[1].splitlines()[0] if "Input" in seg else ""
        assert "__btot" in inputs or "n_tokens" not in inputs, plan


def test_chunk_manifest_invariants(spark):
    from pyspark.sql import functions as F

    from data_stream_flink_user_address_spark.functions.packing import (
        chunk_manifest,
    )

    rows = [(i, " ".join(["w"] * (2 + (i * 3) % 9))) for i in range(1, 30)]
    rows.append((30, ""))  # empty doc: no manifest rows
    df = spark.createDataFrame(rows, "doc_id long, text string")
    man = chunk_manifest(df, seq_len=10, sep_tokens=1, bucket_size=6).collect()

    # per-doc: slices contiguous from 0 and summing to n_tokens
    by_doc = {}
    for r in man:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 30 not in by_doc
    for doc_id, text in rows[:-1]:
        n = len(text.split())
        slices = sorted(by_doc[doc_id], key=lambda r: r.doc_token_start)
        assert slices[0].doc_token_start == 0
        pos = 0
        for s in slices:
            assert s.doc_token_start == pos
            assert s.n_tokens_in_chunk > 0
            pos += s.n_tokens_in_chunk
        assert pos == n

    # per-chunk: token load never exceeds seq_len
    by_chunk = {}
    for r in man:
        by_chunk[r.chunk_id] = by_chunk.get(r.chunk_id, 0) + r.n_tokens_in_chunk
    assert max(by_chunk.values()) <= 10


class TestOverlapChunks:
    """overlap_chunks: boundary arithmetic, overlap content, zero-shuffle
    plan shape."""

    def _chunks(self, spark, rows, **kw):
        from data_stream_flink_user_address_spark.functions.packing import (
            overlap_chunks,
        )
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return overlap_chunks(df, **kw).collect()

    def test_exact_fit_yields_one_chunk(self, spark):
        out = self._chunks(
            spark, [(1, " ".join(f"t{i}" for i in range(8)))],
            chunk_len=8, overlap=2,
        )
        assert len(out) == 1
        assert out[0].n_chunk_tokens == 8 and out[0].start_tok == 0

    def test_one_past_fit_yields_two_chunks_with_short_tail(self, spark):
        out = sorted(
            self._chunks(
                spark, [(1, " ".join(f"t{i}" for i in range(9)))],
                chunk_len=8, overlap=2,
            ),
            key=lambda r: r.chunk_id,
        )
        assert [r.start_tok for r in out] == [0, 6]
        assert [r.n_chunk_tokens for r in out] == [8, 3]
        assert out[1].chunk_text == "t6 t7 t8"

    def test_consecutive_chunks_share_overlap_tokens(self, spark):
        out = sorted(
            self._chunks(
                spark, [(1, " ".join(f"t{i}" for i in range(20)))],
                chunk_len=8, overlap=3,
            ),
            key=lambda r: r.chunk_id,
        )
        for a, b in zip(out, out[1:]):
            tail = a.chunk_text.split()[-3:]
            head = b.chunk_text.split()[:3]
            if b.n_chunk_tokens >= 3:
                assert tail == head

    def test_every_token_covered_no_gaps(self, spark):
        n = 37
        out = self._chunks(
            spark, [(1, " ".join(f"t{i}" for i in range(n)))],
            chunk_len=10, overlap=4,
        )
        covered = set()
        for r in out:
            covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
        assert covered == set(range(n))

    def test_empty_doc_contributes_no_rows(self, spark):
        assert self._chunks(spark, [(1, ""), (2, "   ")]) == []

    def test_invalid_overlap_raises(self, spark):
        import pytest as _pytest
        from data_stream_flink_user_address_spark.functions.packing import (
            overlap_chunks,
        )
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with _pytest.raises(ValueError):
            overlap_chunks(df, chunk_len=8, overlap=8)
        with _pytest.raises(ValueError):
            overlap_chunks(df, chunk_len=8, overlap=-1)

    def test_plan_has_no_exchange(self, spark):
        """Row-local contract: tokenize + explode + slice must plan
        without a single shuffle."""
        import contextlib, io
        from data_stream_flink_user_address_spark.functions.packing import (
            overlap_chunks,
        )
        df = spark.createDataFrame(
            [(1, "a b c d e f")], ["doc_id", "text"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            overlap_chunks(df, chunk_len=4, overlap=1).explain("formatted")
        assert "Exchange" not in buf.getvalue()


class TestHistogramPack:
    def _mk(self, spark, lens, seq_len=None):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_every_doc_one_bin_within_capacity(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        lens = [5, 5, 3, 3, 3, 2, 7, 8, 1, 1, 4, 6]
        df = self._mk(spark, lens)
        out, stats = histogram_pack(df, seq_len=8, bucket_size=4)
        rows = out.collect()
        assert len(rows) == len(lens)  # every doc assigned exactly once
        assert stats["n_docs"] == len(lens)
        sums = {}
        for r in rows:
            sums[r.bin_id] = sums.get(r.bin_id, 0) + r.n_tokens
        assert all(s <= 8 for s in sums.values())
        assert len(sums) == stats["n_bins"]
        assert stats["total_tokens"] == sum(lens)
        # exact padding accounting
        assert stats["padding_frac"] == round(
            1 - sum(lens) / (stats["n_bins"] * 8), 6
        )

    def test_bin_contents_match_solver_patterns(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            _spfhp_solve,
            histogram_pack,
        )

        lens = [6, 6, 4, 4, 4, 2, 2, 2, 2, 1, 8, 5, 3]
        df = self._mk(spark, lens)
        out, stats = histogram_pack(df, seq_len=8, bucket_size=5)
        hist = {}
        for n in lens:
            hist[n] = hist.get(n, 0) + 1
        want = []
        for pat, m in _spfhp_solve(hist, 8):
            want += [tuple(sorted(pat))] * m
        got = {}
        for r in out.collect():
            got.setdefault(r.bin_id, []).append(r.n_tokens)
        assert sorted(tuple(sorted(v)) for v in got.values()) == sorted(want)
        assert stats["n_patterns"] == len(set(want))

    def test_deterministic(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        df = self._mk(spark, [3, 1, 4, 1, 5, 2, 6, 5, 3])
        a, sa = histogram_pack(df, seq_len=8)
        b, sb = histogram_pack(df, seq_len=8)
        assert sa == sb
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_truncation_and_empty_docs(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        df = spark.createDataFrame(
            [(1, " ".join(["w"] * 20)), (2, ""), (3, "a b")],
            ["doc_id", "text"],
        )
        out, stats = histogram_pack(df, seq_len=8)
        rows = {r.doc_id: r for r in out.collect()}
        assert set(rows) == {1, 3}  # empty doc excluded
        assert rows[1].n_tokens == 8 and rows[1].truncated
        assert not rows[3].truncated
        assert stats["n_truncated"] == 1

    def test_beats_one_doc_per_bin(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        lens = [2] * 20 + [3] * 10 + [5] * 6
        df = self._mk(spark, lens)
        _, stats = histogram_pack(df, seq_len=8)
        assert stats["n_bins"] < len(lens)
        assert stats["padding_frac"] < 1 - sum(lens) / (len(lens) * 8)

    def test_solver_rejects_oversize(self):
        from data_stream_flink_user_address_spark.functions.packing import (
            _spfhp_solve,
        )

        import pytest as _pytest

        with _pytest.raises(ValueError):
            _spfhp_solve({9: 1}, 8)

    def test_empty_corpus(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
        out, stats = histogram_pack(df, seq_len=8)
        assert out.count() == 0
        assert stats["n_bins"] == 0 and stats["padding_frac"] == 0.0

    def test_string_ids_pack_correctly(self, spark):
        """The rank bucket is hash-derived, so non-numeric ids work:
        floor(id / bucket_size) used to raise CAST_INVALID_INPUT under
        ANSI (or NULL-bucket every row away with ANSI off)."""
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
        )

        lens = [5, 5, 3, 3, 3, 2, 7, 8, 1, 1, 4, 6]
        rows = [(f"doc-{i:03d}", " ".join(["w"] * n)) for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out, stats = histogram_pack(df, seq_len=8, bucket_size=4)
        got = out.collect()
        assert len(got) == len(lens)
        assert {r.doc_id for r in got} == {f"doc-{i:03d}" for i in range(len(lens))}
        sums = {}
        for r in got:
            sums[r.bin_id] = sums.get(r.bin_id, 0) + r.n_tokens
        assert all(s <= 8 for s in sums.values())
        assert len(sums) == stats["n_bins"]
        # empty-corpus schema keeps the caller's id type too
        empty_out, _ = histogram_pack(
            spark.createDataFrame([("x", "")], ["doc_id", "text"]), seq_len=8
        )
        assert empty_out.schema["doc_id"].dataType.simpleString() == "string"


class TestPackBinsText:
    def test_bins_reassemble_and_clip(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
            pack_bins_text,
        )

        rows = [
            (1, " ".join(f"a{i}" for i in range(5))),
            (2, " ".join(f"b{i}" for i in range(3))),
            (3, " ".join(f"c{i}" for i in range(12))),  # truncated to 8
            (4, " ".join(f"d{i}" for i in range(2))),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        assignment, stats = histogram_pack(df, seq_len=8)
        packed = pack_bins_text(df, assignment).collect()
        assert sum(r.n_docs for r in packed) == 4
        assert stats["n_bins"] == len(packed)
        for r in packed:
            toks = r.packed_text.split()
            assert len(toks) == r.n_tokens <= 8
        # the truncated doc contributes exactly 8 tokens, in order
        big = [r for r in packed if "c0" in r.packed_text][0]
        assert "c7" in big.packed_text and "c8" not in big.packed_text

    def test_member_order_is_by_id(self, spark):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
            pack_bins_text,
        )

        # two 4-token docs must share one 8-bin; lower id first
        df = spark.createDataFrame(
            [(7, "x x x x"), (2, "y y y y")], ["doc_id", "text"]
        )
        assignment, _ = histogram_pack(df, seq_len=8)
        packed = pack_bins_text(df, assignment).collect()
        assert len(packed) == 1
        assert packed[0].packed_text == "y y y y x x x x"


def test_histogram_pack_rank_exchange_is_two_key(spark):
    """The rank window must partition on (length, bucket), never on the
    length alone -- a hot length class (billions of same-length docs at
    100 TB) must not funnel through one task."""
    from data_stream_flink_user_address_spark.functions.packing import (
        histogram_pack,
    )

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * 4)) for i in range(30)], ["doc_id", "text"]
    )
    out, _ = histogram_pack(df, seq_len=8, bucket_size=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # the corpus-sized rank window: row_number partitioned on BOTH keys
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^,]+, [^,]+),", plan)
    assert specs, plan
    assert any("n_tokens" in s and "__bucket" in s for s in specs)
    # (the single-key n_tokens window that also appears runs on the
    # aggregated (length, bucket)-count frame -- small by construction)


def test_spfhp_oracle_sql_fuzz():
    """The DuckDB replica of the SPFHP solve (pack_bins_report's oracle:
    greedy over list-state + the bin-merge post-pass, both recursive
    CTEs) must agree with _spfhp_solve pattern-for-pattern on random
    histograms -- including cases where the merge pass changes the
    answer.  Spark-free: compares the solver layers directly."""
    import random

    import duckdb

    from __spark_entry__ import _SQL_SPFHP_PACK
    from data_stream_flink_user_address_spark.functions.packing import (
        _spfhp_solve,
    )

    # snip the oracle to the pattern-solve layers: drop the corpus CTEs
    # (the test drives hist directly) and the assignment tail
    body = _SQL_SPFHP_PACK
    start = body.index("hlist AS (")
    end = body.index(",\npat_rows AS (")
    pattern_sql = (
        "WITH RECURSIVE\n"
        + body[start:end]
        + "\nSELECT u.pat AS pat, u.tot AS tot, u.cnt AS cnt\n"
        + "FROM (SELECT unnest(pats) AS u FROM final_pats) ORDER BY pat"
    )

    rng = random.Random(20260815)
    merge_mattered = 0
    for _ in range(25):
        hist = {
            rng.randint(1, 128): rng.randint(1, 50)
            for _ in range(rng.randint(1, 40))
        }
        want = sorted(
            (",".join(f"{x:03d}" for x in p), sum(p), n)
            for p, n in _spfhp_solve(dict(hist), 128)
        )
        # count cases where the merge post-pass changed the greedy output
        greedy_only: dict[tuple[int, ...], int] = {}
        for length in sorted(hist, reverse=True):
            c = int(hist[length])
            while c > 0:
                fits = [p for p in greedy_only if 128 - sum(p) >= length]
                if fits:
                    b = min(fits, key=lambda p: (128 - sum(p), p))
                    k = min(c, greedy_only[b])
                    greedy_only[b] -= k
                    if greedy_only[b] == 0:
                        del greedy_only[b]
                    g = b + (length,)
                    greedy_only[g] = greedy_only.get(g, 0) + k
                    c -= k
                else:
                    greedy_only[(length,)] = greedy_only.get((length,), 0) + c
                    c = 0
        if sorted(greedy_only.items()) != sorted(
            dict(_spfhp_solve(dict(hist), 128)).items()
        ):
            merge_mattered += 1

        con = duckdb.connect()
        con.execute("CREATE TABLE hist(n INT, c BIGINT)")
        con.executemany("INSERT INTO hist VALUES (?, ?)", list(hist.items()))
        got = sorted(tuple(r) for r in con.execute(pattern_sql).fetchall())
        con.close()
        assert got == want, (hist, got[:5], want[:5])
    assert merge_mattered >= 3, merge_mattered


def test_offsets_string_ids_match_sequential_model(spark):
    """VERDICT r14 wrong #3: string ids must produce the same
    id-ordered prefix sum a numeric key would -- the bucket assignment
    has to be ORDER-PRESERVING (7-byte-prefix quantile range buckets),
    not floor(id / size), which crashes or NULL-buckets strings.  Ids
    here are deliberately adversarial for a naive proxy: shared long
    prefixes, different lengths (prefix-extension ordering), and a
    bucket_size small enough to force several cut boundaries."""
    ids = sorted(
        [f"url/{chr(97 + i % 9)}{'x' * (i % 4)}/{i:04d}" for i in range(60)]
    )
    rows = [(s, " ".join(["w"] * (2 + i % 6))) for i, s in enumerate(ids)]
    out = sequence_pack_offsets(
        spark.createDataFrame(rows, "doc_id string, text string"),
        seq_len=8,
        sep_tokens=1,
        bucket_size=10,
    )
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == 60
    off = 0
    for doc_id, text in sorted(rows):
        n = len(text.split())
        r = got[doc_id]
        assert r.n_tokens == n, doc_id
        assert r.start_offset == off, doc_id
        assert r.end_offset == off + n, doc_id
        off += n + 1


def test_offsets_unsupported_id_type_raises(spark):
    """A non-orderable-for-concat id type (here: array) must raise
    instead of silently corrupting the global stream order."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [([1], "a b")], "doc_id array<int>, text string"
    )
    with _pytest.raises(TypeError, match="numeric or string id"):
        sequence_pack_offsets(df)


def test_string_bucket_binary_search_matches_cut_semantics(spark):
    """The binary when-tree must equal 'count of cuts strictly below
    the proxy' for every row -- including proxies exactly equal to a
    cut (ties stay in the lower bucket) -- and the bucket column must
    be non-decreasing in id order (the order-preserving contract)."""
    from data_stream_flink_user_address_spark.functions.packing import (
        _order_preserving_bucket,
    )

    ids = [f"k{i:05d}" for i in range(200)]
    df = spark.createDataFrame([(s, 1) for s in ids], "doc_id string, n_tokens int")
    out = _order_preserving_bucket(df, "doc_id", bucket_size=25)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    buckets = [r["__bucket"] for r in rows]
    assert buckets == sorted(buckets)  # monotone in id order
    assert 0 < len(set(buckets)) <= 8  # ~200/25 buckets materialize


def test_offsets_quoting_hostile_id_column_name(spark):
    """The string-id proxy must be built with column-API expressions,
    not SQL-text interpolation: an id column whose name needs quoting
    (space, dash) has to work like any other (r15 review fix)."""
    rows = [(f"id{i:03d}", "w w w") for i in range(30)]
    out = sequence_pack_offsets(
        spark.createDataFrame(rows, "`my doc-id` string, text string"),
        id_col="my doc-id",
        seq_len=8,
        sep_tokens=1,
        bucket_size=7,
    )
    got = sorted(
        (r["my doc-id"], r.start_offset, r.end_offset) for r in out.collect()
    )
    assert len(got) == 30
    off = 0
    for i, (doc_id, start, end) in enumerate(got):
        assert doc_id == f"id{i:03d}"
        assert (start, end) == (off, off + 3)
        off += 4


class TestPackBinsExact:
    def _pack(self, spark, rows, seq_len=16):
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
            pack_bins_exact,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        assign, _ = histogram_pack(df, seq_len=seq_len)
        return pack_bins_exact(df, assign), assign

    def test_char_bases_slice_back_exactly(self, spark):
        """THE contract: substring(packed_text, char_base) recovers each
        member's EXACT text -- internal newlines, runs of spaces, and
        unicode preserved byte-for-byte (what pack_bins_text's token
        clip would destroy)."""
        rows = [
            (1, "a\nb  c"),            # newline + double space survive
            (2, "<|user|>hé\n"),       # rendered-chat shape + unicode
            (3, "x y z"),
            (4, "one  two\tthree"),
            (5, "w " * 7 + "w"),
        ]
        bins, _ = self._pack(spark, rows)
        texts = dict(rows)
        seen = set()
        for b in bins.collect():
            for m in b["char_bases"]:
                t = texts[m["id"]]
                base = m["char_base"]
                assert b["packed_text"][base:base + len(t)] == t, m["id"]
                seen.add(m["id"])
            assert len(b["packed_text"]) == sum(
                len(texts[m["id"]]) for m in b["char_bases"]
            )
            # members concatenate in id order
            ids = [m["id"] for m in b["char_bases"]]
            assert ids == sorted(ids)
        assert seen == set(texts)

    def test_truncated_member_raises(self, spark):
        import pytest as _pytest

        rows = [(1, " ".join(["w"] * 40))]  # 40 tokens > seq_len 16
        with _pytest.raises(ValueError, match="truncated"):
            self._pack(spark, rows, seq_len=16)

    def test_null_text_member_raises(self, spark):
        """A NULL member would be silently SKIPPED by the packed-text
        concat while NULL-poisoning every later member's char_base --
        corrupted offsets with no error (ADVICE r15).  Raise instead,
        mirroring the truncated guard (and in the SAME validation
        action -- no extra job)."""
        import pytest as _pytest
        from pyspark.sql import functions as F
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
            pack_bins_exact,
        )

        # histogram_pack itself drops NULL-text docs, so the poison
        # path is an assignment solved BEFORE the text went NULL
        # (re-read snapshot, upstream redaction, ...)
        df = spark.createDataFrame(
            [(1, "a b"), (2, "x y"), (3, "c d")], "doc_id long, text string"
        )
        assign, _ = histogram_pack(df, seq_len=16)
        nulled = df.withColumn(
            "text", F.when(F.col("doc_id") != 2, F.col("text"))
        )
        with _pytest.raises(ValueError, match="NULL text"):
            pack_bins_exact(nulled, assign)

    def test_totals_match_pack_bins_text_accounting(self, spark):
        """Same assignment: pack_bins_exact and pack_bins_text agree on
        bin membership and token totals; only the string discipline
        differs."""
        from data_stream_flink_user_address_spark.functions.packing import (
            histogram_pack,
            pack_bins_exact,
            pack_bins_text,
        )

        rows = [(i, " ".join(f"t{i}x{j}" for j in range(1 + i % 5)))
                for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assign, _ = histogram_pack(df, seq_len=8)
        exact = {r["bin_id"]: r for r in pack_bins_exact(df, assign).collect()}
        toky = {r["bin_id"]: r for r in pack_bins_text(df, assign).collect()}
        assert set(exact) == set(toky)
        for bid in exact:
            assert exact[bid]["n_docs"] == toky[bid]["n_docs"]
            assert exact[bid]["n_tokens"] == toky[bid]["n_tokens"]
