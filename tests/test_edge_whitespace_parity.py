"""Engine-vs-oracle parity over a corpus WITH edge whitespace.

The committed testdata carries zero leading/trailing whitespace, so the
driver's hash gate can never see the defect class r17 fixed twice
(phantom empty tokens from ``split(trim(text))``, trailing spaces in
``regexp_replace(trim(text))`` normalization): an engine/oracle pair
that diverges ONLY on edge-whitespace text stays green forever on the
stock corpus.  This suite closes that blind spot -- it rewrites the
sf0.001 documents table with ``\\n``/``\\t``/space injected at both
ends (3 of every 4 docs mutated) and sweeps EVERY registered
queries()/oracle_sql() pair over it with the same comparison the
driver uses.  The r17 review found two oracles
(repetition_stats, token_budget_mixture) that the repo-wide
tokenization flip had missed; this sweep reproduces that class of miss
as a plain red test.
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

# document-shape-sensitive queries would all catch a tokenization
# regression, but the sweep is cheap at sf0.001 so run the whole
# registry -- non-document queries are near-free and keep the harness
# honest about every pair
_NAMES = list(entrymod.queries())


@pytest.fixture(scope="module")
def edge_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("edgews_sf"))
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        if name == "documents.parquet":
            con.execute(f"""
              COPY (
                SELECT * REPLACE (
                  CASE doc_id % 4
                    WHEN 0 THEN text || chr(10)
                    WHEN 1 THEN ' ' || text || chr(9)
                    WHEN 2 THEN chr(10) || chr(9) || text
                    ELSE text END AS text)
                FROM read_parquet('{f}')
              ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
            """)
        else:
            shutil.copyfile(f, os.path.join(dst, name))
    con.close()
    return dst


@pytest.fixture(scope="module")
def edge_con(edge_sf):
    con = duckdb_conn(edge_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_edge_whitespace_query_parity(spark, edge_sf, edge_con, name):
    got = entrymod.queries()[name](spark, edge_sf)
    assert compare(got, edge_con, entrymod.oracle_sql()[name], name) == []
