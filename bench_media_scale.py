"""Measured multimodal near-dup cost at growing corpus size.

The image (pHash) and audio (band-energy fingerprint) near-dup paths
share the banded Hamming pair stage whose scaling DEDUP_SCALE.json
already measures; the new element is the per-payload DECODE +
signature cost inside Arrow-batched mapInPandas.  This bench plants
group-duplicate media (synthesize_group_images / synthesize_group_wavs,
the driver queries' exact generators), runs signature + pairing end to
end, and records wall time, payloads/sec, and the pair count (which
must equal the planted within-group pair count exactly -- a recall
check rides along for free).

Writes MEDIA_SCALE.json.
Run:  python bench_media_scale.py
      SPARK_GRAFT_MEDIA_SIZES=10000,100000 python bench_media_scale.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_stream_flink_user_address_spark.functions.dedup import (
    simhash_near_dup_pairs,
)
from data_stream_flink_user_address_spark.functions.multimodal import (
    audio_fingerprint,
    phash_images,
    synthesize_group_images,
    synthesize_group_wavs,
)
from data_stream_flink_user_address_spark.session import get_spark

SIZES = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_MEDIA_SIZES", "10000,100000").split(",")
]
GROUP_DIV = 3


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("bench_media_scale")
    results = []
    for n in SIZES:
        docs = spark.range(n).withColumnRenamed("id", "doc_id")
        # planted truth: within-group pairs among ids 0..n-1 grouped by //3
        full, rem = divmod(n, GROUP_DIV)
        expected = full * (GROUP_DIV * (GROUP_DIV - 1) // 2) + rem * (rem - 1) // 2
        for kind, synth, sig_fn, sig_col in (
            ("image_phash", synthesize_group_images, phash_images, "phash"),
            ("audio_fingerprint", synthesize_group_wavs, audio_fingerprint, "afp"),
        ):
            runs = []
            pairs = None
            for _ in range(2):
                t0 = time.perf_counter()
                media = synth(docs, group_div=GROUP_DIV)
                pairs = simhash_near_dup_pairs(
                    sig_fn(media), max_hamming=3, bits=64,
                    id_col="media_id", sig_col=sig_col,
                ).count()
                runs.append(round(time.perf_counter() - t0, 3))
            entry = {
                "kind": kind,
                "n_payloads": n,
                "runs": runs,
                "median": statistics.median(runs),
                "payloads_per_sec": round(n / statistics.median(runs), 0),
                "pairs_found": pairs,
                "pairs_expected": expected,
                "exact_recall_and_precision": pairs == expected,
            }
            results.append(entry)
            print(json.dumps(entry), flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "MEDIA_SCALE.json"),
        "w",
    ) as fh:
        json.dump({"group_div": GROUP_DIV, "max_hamming": 3, "sizes": results}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
