"""Engine-vs-oracle parity over a DEGENERATE corpus.

Third sweep in the corpus-mutation family (r17 edge-whitespace found
phantom-token bugs, r18 unicode found four rounding/casing
divergences).  The committed testdata is benign in a different way the
first two sweeps kept intact: every document is non-empty prose with a
unique body, and every embedding has a healthy norm and a unique
direction.  This sweep removes those guarantees and probes the
failure classes that only degenerate data can reach:

* **Cloned texts** (many doc_ids share one identical body) -- exact
  ties in every score, fingerprint collisions ACROSS doc_ids, top-k /
  row_number orderings whose sort keys collide.  Any under-specified
  ordering (missing id tiebreak) or per-engine tie resolution
  diverges here.
* **Blank / whitespace-only / NULL text** -- zero-token documents hit
  every ratio's denominator (quality scores, stopword fractions,
  compression ratios) and every "first token" access.
* **Single-giant-token and single-char docs** -- shingle windows wider
  than the token list, n-gram sets of size 0/1, substring windows
  longer than the document.
* **One token repeated many times** -- tf extremes in BM25/NB,
  n-gram multisets that collapse to one element, repetition stats at
  their ceiling.
* **Zero-norm embeddings** -- cosine's denominator is 0: Spark double
  division and DuckDB double division must agree on the result class
  (NULL vs NaN vs Inf) or every similarity query diverges.
* **Identical embeddings** (constant vector on many vec_ids) --
  cosine exactly 1.0 ties in top-k; centroid assignment ties (equal
  distance to several centroids) must break identically.

Mutation map (documents, by doc_id % 8; ~7/8 mutated):

  0 -> one shared literal body (the clone class)
  1 -> ''            (empty)
  2 -> '   '         (whitespace-only)
  3 -> repeat('z', 4000)      (one 4000-char token)
  4 -> repeat('word ', 1500)  (one token x 1500)
  5 -> 'a'           (single char)
  6 -> NULL
  else unchanged     (control)

Mutation map (embeddings, by vec_id % 4):

  0 -> all-zero vector (same length)
  1 -> constant 0.25 vector (identical across rows, non-zero)
  else unchanged
"""

import glob
import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_conn

SRC = "/root/testdata/sf0.001"

_NAMES = list(entrymod.queries())

_MUTATE_DOC = """
  CASE doc_id % 8
    WHEN 0 THEN 'the shared clone body every eighth document carries verbatim'
    WHEN 1 THEN ''
    WHEN 2 THEN '   '
    WHEN 3 THEN repeat('z', 4000)
    WHEN 4 THEN repeat('word ', 1500)
    WHEN 5 THEN 'a'
    WHEN 6 THEN NULL
    ELSE text
  END
"""

_MUTATE_EMB = """
  CASE vec_id % 4
    WHEN 0 THEN list_transform(embedding, x -> 0.0::FLOAT)
    WHEN 1 THEN list_transform(embedding, x -> 0.25::FLOAT)
    ELSE embedding
  END
"""


@pytest.fixture(scope="module")
def degen_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("degen_sf"))
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        if name == "documents.parquet":
            con.execute(f"""
              COPY (
                SELECT * REPLACE (({_MUTATE_DOC}) AS text)
                FROM read_parquet('{f}')
              ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """)
        elif name == "embeddings.parquet":
            con.execute(f"""
              COPY (
                SELECT * REPLACE (({_MUTATE_EMB}) AS embedding)
                FROM read_parquet('{f}')
              ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
            """)
        else:
            shutil.copyfile(f, os.path.join(dst, name))
    con.close()
    return dst


@pytest.fixture(scope="module")
def degen_con(degen_sf):
    con = duckdb_conn(degen_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_degenerate_query_parity(spark, degen_sf, degen_con, name):
    got = entrymod.queries()[name](spark, degen_sf)
    assert compare(got, degen_con, entrymod.oracle_sql()[name], name) == []
