"""Engine-vs-oracle parity over degenerate RELATIONAL tables.

Fourth sweep in the corpus-mutation family -- and the first to mutate
anything other than ``documents``/``embeddings``.  The ~30 registered
TPC-H / events queries have only ever seen the generator's benign rows:
distinct order values, unique timestamps, non-NULL comments, discounts
strictly inside (0, 1).  This sweep removes those guarantees and probes
the failure classes relational queries are prone to:

* **Tied sort keys** (identical ``value``/``ts`` in events, one shared
  ``o_totalprice`` class in orders) -- any top-k / ``row_number`` /
  as-of / session-window ordering missing a deterministic tiebreak
  diverges here, as does any windowed running sum whose frame is
  under-specified over duplicates.
* **NULLs in predicate columns** (``event_type``, ``props``,
  ``o_comment``, ``c_phone``, ``c_acctbal``) -- three-valued logic in
  filters, ``NOT IN`` / ``NOT EXISTS`` (q16/q22), regex matches over
  NULL, NULL group keys (Spark groupBy and SQL GROUP BY both keep a
  NULL group, but equi-joins drop it), count(*) vs count(col).
* **Boundary numerics** (``value`` 0.0 / negated, ``l_discount`` 1.0,
  ``l_quantity`` 0) -- zero products in revenue arithmetic
  (``1 - discount``), sign flips under sum cancellation, zero
  quantities in averages.
* **Degenerate JSON** (``props`` NULL) -- ``events_json_extract``'s
  path access over a NULL document in both engines.

Mutation maps (= the fixture's SQL below):

  events, by event_id % 8:
    0 -> value 0.0          1 -> value negated
    2 -> value NULL         3 -> ts pinned to one constant (mass ties)
    4 -> props NULL         5 -> event_type NULL
    6 -> (user_id 42, event_type 'click', ts pinned) clone signature
    else unchanged (control)

  lineitem, by l_orderkey % 7:
    0 -> l_discount 1.00 (revenue term exactly 0)
    1 -> l_quantity 0
    2 -> l_extendedprice pinned to one constant (rank/top-k ties)
    3 -> l_returnflag NULL (q1's group key)
    else unchanged

  orders, by o_orderkey % 5:
    0 -> o_totalprice pinned to one constant (ties)
    1 -> o_orderpriority NULL (count_by_state / q4's group key)
    else unchanged

  customer, by c_custkey % 6:
    0 -> c_mktsegment NULL (q3's filter)    1 -> c_acctbal NULL
    else unchanged

(The testdata is a slimmed TPC-H: no comment/phone/commitdate columns,
so the NULL probes target the group-key and filter columns that exist.)
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

_MUTATions = {
    "events.parquet": """
      SELECT * REPLACE (
        CASE event_id % 8 WHEN 0 THEN 0.0
                          WHEN 1 THEN -value
                          WHEN 2 THEN NULL
                          ELSE value END AS value,
        CASE event_id % 8 WHEN 3 THEN TIMESTAMP '2024-03-01 12:00:00'
                          WHEN 6 THEN TIMESTAMP '2024-03-02 12:00:00'
                          ELSE ts END AS ts,
        CASE event_id % 8 WHEN 4 THEN NULL ELSE props END AS props,
        CASE event_id % 8 WHEN 5 THEN NULL
                          WHEN 6 THEN 'click'
                          ELSE event_type END AS event_type,
        CASE event_id % 8 WHEN 6 THEN 42 ELSE user_id END AS user_id)
      FROM read_parquet('{src}')
    """,
    "lineitem.parquet": """
      SELECT * REPLACE (
        CASE l_orderkey % 7 WHEN 0 THEN 1.00 ELSE l_discount END
            AS l_discount,
        CASE l_orderkey % 7 WHEN 1 THEN 0 ELSE l_quantity END
            AS l_quantity,
        CASE l_orderkey % 7 WHEN 2 THEN 1234.56 ELSE l_extendedprice END
            AS l_extendedprice,
        CASE l_orderkey % 7 WHEN 3 THEN NULL ELSE l_returnflag END
            AS l_returnflag)
      FROM read_parquet('{src}')
    """,
    "orders.parquet": """
      SELECT * REPLACE (
        CASE o_orderkey % 5 WHEN 0 THEN 55555.55 ELSE o_totalprice END
            AS o_totalprice,
        CASE o_orderkey % 5 WHEN 1 THEN NULL ELSE o_orderpriority END
            AS o_orderpriority)
      FROM read_parquet('{src}')
    """,
    "customer.parquet": """
      SELECT * REPLACE (
        CASE c_custkey % 6 WHEN 0 THEN NULL ELSE c_mktsegment END
            AS c_mktsegment,
        CASE c_custkey % 6 WHEN 1 THEN NULL ELSE c_acctbal END
            AS c_acctbal)
      FROM read_parquet('{src}')
    """,
}


@pytest.fixture(scope="module")
def rel_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("rel_degen_sf"))
    con = duckdb.connect()
    for f in glob.glob(SRC + "/*.parquet"):
        name = os.path.basename(f)
        mut = _MUTATions.get(name)
        if mut is not None:
            con.execute(
                f"COPY ({mut.format(src=f)}) TO '{dst}/{name}' (FORMAT PARQUET)"
            )
        else:
            shutil.copyfile(f, os.path.join(dst, name))
    con.close()
    return dst


@pytest.fixture(scope="module")
def rel_con(rel_sf):
    con = duckdb_conn(rel_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", _NAMES)
def test_relational_degenerate_parity(spark, rel_sf, rel_con, name):
    got = entrymod.queries()[name](spark, rel_sf)
    assert compare(got, rel_con, entrymod.oracle_sql()[name], name) == []
