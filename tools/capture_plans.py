"""Capture ``explain("formatted")`` for every registered query.

Usage:
    python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` (suffix defaults to "before")
for each named query, or for all of ``queries()`` when none are named.
Uses the engine session (same as bench.py) so the captured plans match
what the bench executes.  Queries whose construction itself runs jobs
(store builders, trained artifacts) run those jobs here too -- the
captured plan is the plan of the RETURNED frame, the one the bench
times with the noop sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_stream_flink_user_address_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = entrymod.queries()
    targets = names or list(qs)
    for name in targets:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"captured {name} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
