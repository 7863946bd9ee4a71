"""Measured full-SFT-build stream (functions/chat.py:
streaming_sft_pack): every micro-batch of JSON chats runs parse ->
structural gate -> render -> byte-exact SPFHP packing -> loss-mask
span re-basing, with BOTH trainer deliverables (packed bins + re-based
spans) landing as ``__epoch`` partitions.

Each micro-batch: 100k conversations with bench_stream_sft's planted
malformed (~1/31) and trailing-user (~1/13) defects -- the gate drops
them before packing.  The per-epoch cost should stay flat: packing is
per-epoch (histogram-bound solve on one batch), so no state grows.

Writes key ``sft_pack_stream`` into STREAM_BENCH.json.
Run:  python bench_stream_sft_pack.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_stream_sft import CONVS_PER_BATCH, N_BATCHES, write_batch
from data_stream_flink_user_address_spark.functions.chat import (
    streaming_sft_pack,
)
from data_stream_flink_user_address_spark.session import get_spark

ROOT = "/tmp/stream_sft_pack_bench"
SEQ_LEN = 192


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_stream_sft_pack")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)
    src = os.path.join(ROOT, "src")
    os.makedirs(src)
    bins_path = os.path.join(ROOT, "bins")
    spans_path = os.path.join(ROOT, "spans")

    for b in range(N_BATCHES):
        write_batch(spark, b, src)

    stream = (
        spark.readStream.schema("conv_id long, conversation string")
        .option("maxFilesPerTrigger", str(32))
        .json(os.path.join(src, "batch_*"))
    )
    q = streaming_sft_pack(
        stream, bins_path, spans_path, os.path.join(ROOT, "ck"),
        seq_len=SEQ_LEN,
    )
    epoch_walls: list[float] = []
    try:
        t_all = time.perf_counter()
        q.processAllAvailable()
        total_wall = round(time.perf_counter() - t_all, 3)
        for p in q.recentProgress:
            if p["numInputRows"] > 0:
                epoch_walls.append(
                    round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
                )
    finally:
        q.stop()

    bins = spark.read.parquet(bins_path)
    spans = spark.read.parquet(spans_path)
    total = N_BATCHES * CONVS_PER_BATCH
    n_packed = spans.select("__epoch", "conv_id").distinct().count()
    entry = {
        "n_batches": N_BATCHES,
        "convs_per_batch": CONVS_PER_BATCH,
        "total_convs": total,
        "convs_packed": n_packed,
        "packed_frac": round(n_packed / total, 4),
        "n_bins": bins.count(),
        "n_spans": spans.count(),
        "epochs_with_rows": len(epoch_walls),
        "epoch_walls_s": epoch_walls,
        "total_wall_s": total_wall,
        "convs_per_sec": round(total / total_wall, 1),
    }
    # the planted malformed/trailing-user defects gate ~11%
    assert 0.80 < entry["packed_frac"] < 0.95, entry

    path = os.path.join(os.path.dirname(__file__), "STREAM_BENCH.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["sft_pack_stream"] = entry
    with open(path, "w") as fh:
        json.dump(data, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"sft_pack_stream": entry}))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
