"""Per-query profile: construction vs action time, job counts.

Usage:
    python tools/profile_query.py <query> [query ...]

For each query: one untimed warmup, then a timed run split into
construction (the ``fn(spark, sf_dir)`` call -- includes any eager
probes / store builds) and the noop action, with the number of Spark
jobs each part triggered (from the status tracker).  The same
methodology as bench.py, so numbers are comparable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_stream_flink_user_address_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("profile_query")
    qs = entrymod.queries()
    tracker = spark.sparkContext.statusTracker()

    def last_job() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    # absorb session/pandas warmup like bench.py
    for wq in ("count_by_state", "multimodal_meta"):
        qs[wq](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = qs[name]
        # warmup
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for run in range(2):
            j0 = last_job()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            j1 = last_job()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = last_job()
            print(
                f"{name} run{run}: total={t2 - t0:6.2f}s  "
                f"construct={t1 - t0:6.2f}s ({j1 - j0} jobs)  "
                f"action={t2 - t1:6.2f}s ({j2 - j1} jobs)",
                flush=True,
            )


if __name__ == "__main__":
    main()
