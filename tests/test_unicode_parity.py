"""Engine-vs-oracle parity over a corpus WITH non-ASCII unicode text.

VERDICT r17 ask #3: the committed testdata is pure ASCII, so the
driver's hash gate can never see the divergence classes unicode text
probes -- Spark's Java-regex ``\\s`` vs DuckDB's RE2 ``\\s`` (NBSP,
U+2028/U+2029 line/paragraph separators), md5-over-UTF-8 agreement,
``length``/``substring`` code-point semantics across the astral plane
(Spark strings are UTF-8 with code-point ops; a UTF-16 surrogate-pair
slip would halve astral lengths), and ``upper``/``lower`` special
casing (U+0130 İ, U+00DF/U+1E9E ß/ẞ).  The r17 edge-whitespace sweep
(same harness shape) found two real oracle misses; this is the next
corpus in that family.

Six mutation classes by doc_id, five mutated / one control:

* %6==0 -- NBSP (U+00A0) glued between appended words: NOT whitespace
  to either engine's ``\\s``, so the glued token must stay one token.
* %6==1 -- U+2028/U+2029 separators: also not ``\\s`` in Java's
  default (non-UNICODE_CHARACTER_CLASS) regex nor RE2 -- both engines
  must treat them as token chars, not splits.
* %6==2 -- CJK (no whitespace inside): multi-byte UTF-8 through md5
  fingerprints, shingles, and char counts.
* %6==3 -- combining marks (NFD-style e + U+0301, precomposed ï):
  code-point counts, not grapheme counts, in both engines.
* %6==4 -- astral plane (emoji + math fraktur, all > U+FFFF):
  surrogate-pair handling in length/substring/md5.
* %6==5 -- special-casing probes İ (U+0130) and ẞ/ß: any query that
  upper/lowercases must agree across Java and utf8proc semantics.
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

# chr() spellings keep the mutation unambiguous in the SQL text
_MUTATE = """
  CASE doc_id % 6
    WHEN 0 THEN text || ' foo' || chr(160) || 'bar'
    WHEN 1 THEN text || chr(8232) || 'para' || chr(8233) || 'graph'
    WHEN 2 THEN text || ' 漢字テスト 中文词语'
    WHEN 3 THEN text || ' cafe' || chr(769) || ' naïve'
    WHEN 4 THEN text || ' 😀𝔘𝔫𝔦 🚀x'
    ELSE text || ' İstanbul ẞtraße MASSE'
  END
"""


@pytest.fixture(scope="module")
def uni_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("unicode_sf"))
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        if name == "documents.parquet":
            con.execute(f"""
              COPY (
                SELECT * REPLACE (({_MUTATE}) AS text)
                FROM read_parquet('{f}')
              ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """)
        else:
            shutil.copyfile(f, os.path.join(dst, name))
    con.close()
    return dst


@pytest.fixture(scope="module")
def uni_con(uni_sf):
    con = duckdb_conn(uni_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_unicode_query_parity(spark, uni_sf, uni_con, name):
    got = entrymod.queries()[name](spark, uni_sf)
    assert compare(got, uni_con, entrymod.oracle_sql()[name], name) == []
