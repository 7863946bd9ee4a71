"""Engine-vs-oracle parity over NON-FINITE floats (NaN / ±Inf / 1e300).

Fifth sweep in the corpus-mutation family.  Non-finite values are the
realistic corruption mode for numeric columns at scale (an upstream
encoder emits NaN embeddings, a metering bug emits Inf values), and
they probe a divergence class none of the other sweeps reach: SQL
engines give NaN a TOTAL-ORDER position (above +Inf in BOTH Spark SQL
and DuckDB -- ``NaN >= threshold`` is TRUE), while numpy kernels follow
IEEE (``NaN >= t`` is False), and ANSI Spark turns ``NaN::BIGINT``
into a job-killing CAST_OVERFLOW.

What the first run of this sweep found (all fixed, r18):

* ``quantize_int8_frame`` CAST_OVERFLOW on ``round(NaN)::int`` -- now
  emits ``scale/qvec = NULL`` for non-finite vectors (no silent clamp).
* ``embedding_moments`` surfaced NaN poisoning as an unrelated driver
  TypeError (the Arrow partial round-trip nulls NaN sums) -- now
  raises loudly; the registered query pre-filters via
  ``vec_is_finite`` / the ``embeddings_f`` oracle CTE.
* The IVF-PQ build trained straight through NaN vectors into
  NaN-poisoned codebooks (crashing every later probe) -- build input
  now ``_embs_finite``, ``_ANN_INDEX_VERSION`` bumped so stale caches
  rebuild.
* ``semantic_dedup`` / ``embedding_near_dup_lsh`` oracles treated a
  NaN cosine as ``>= threshold`` (SQL NaN ordering) where the numpy
  kernels pair NaN with nothing -- oracles now carry ``NOT isnan``
  guards (engine semantics win: a NaN vector is nobody's duplicate).
* The local harness itself crashed canonicalizing ``inf`` (int(inf)).

Mutation maps:

  events, by event_id % 6: 0 -> NaN, 1 -> Inf, 2 -> -Inf, 3 -> 1e300,
    else unchanged.  (Sums/rounds over non-finite doubles agree across
    engines with no engine change -- verified, not assumed.)
  embeddings, by vec_id % 7: 3 -> all-NaN vector, 5 -> all-Inf vector,
    else unchanged.  (Residues chosen COPRIME-ish to the ANN stride
    constants: a class hitting every ``vec_id % stride == 0`` seed
    would empty the codebook/centroid seed sets -- a corpus-shape
    artifact, not an engine property.)
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

_MUT_EVENTS = """
  CASE event_id % 6
    WHEN 0 THEN 'NaN'::DOUBLE
    WHEN 1 THEN 'Infinity'::DOUBLE
    WHEN 2 THEN '-Infinity'::DOUBLE
    WHEN 3 THEN 1e300
    ELSE value END
"""

_MUT_EMB = """
  CASE vec_id % 7
    WHEN 3 THEN list_transform(embedding, x -> 'NaN'::FLOAT)
    WHEN 5 THEN list_transform(embedding, x -> 'Infinity'::FLOAT)
    ELSE embedding END
"""


@pytest.fixture(scope="module")
def nonfin_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nonfin_sf"))
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        if name == "events.parquet":
            con.execute(f"""
              COPY (SELECT * REPLACE (({_MUT_EVENTS}) AS value)
              FROM read_parquet('{f}')) TO '{dst}/{name}' (FORMAT PARQUET)
            """)
        elif name == "embeddings.parquet":
            con.execute(f"""
              COPY (SELECT * REPLACE (({_MUT_EMB}) AS embedding)
              FROM read_parquet('{f}')) TO '{dst}/{name}' (FORMAT PARQUET)
            """)
        else:
            shutil.copyfile(f, os.path.join(dst, name))
    con.close()
    return dst


@pytest.fixture(scope="module")
def nonfin_con(nonfin_sf):
    con = duckdb_conn(nonfin_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_nonfinite_query_parity(spark, nonfin_sf, nonfin_con, name):
    got = entrymod.queries()[name](spark, nonfin_sf)
    assert compare(got, nonfin_con, entrymod.oracle_sql()[name], name) == []
