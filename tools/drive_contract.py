"""Driver-contract simulation: vanilla SparkSession + DuckDB oracle.

Mirrors the round driver: (1) entry(spark) smoke at sf0.001,
(2) every queries()[name] at sf0.01 vs oracle_sql()[name] on DuckDB --
row count, sorted columns, dtype families, canonical value multiset.

Usage:
  python drive_contract.py                  # vanilla session
  python drive_contract.py America/New_York # TZ probe
"""

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare, duckdb_conn  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def main() -> None:
    b = SparkSession.builder.master("local[8]").appName("drive-contract")
    if len(sys.argv) > 1:
        b = b.config("spark.sql.session.timeZone", sys.argv[1])
    spark = b.getOrCreate()
    con = duckdb_conn(SF)

    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry smoke: {n} rows, {len(df.schema.fields)} cols")
    assert n >= 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            if name in oracles:
                problems = compare(sdf, con, oracles[name], name)
            else:
                sdf.count()
                problems = []
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXC {type(e).__name__}: {e}"]
        status = "ok" if not problems else "FAIL"
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({time.time() - t0:.1f}s)")
        for p in problems:
            print("   ", p)
        failures.extend(problems)

    if failures:
        print(f"RESULT: {len(failures)} MISMATCHES")
        sys.exit(1)
    print("RESULT: ALL-MATCH")


if __name__ == "__main__":
    main()
