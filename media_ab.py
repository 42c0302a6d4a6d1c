"""Interleaved A/B of the two decode_media kernels (per-row NumPy loop vs
prefix-sum vectorized) at bench granularity — the repo's standard noise
methodology (interleave arms, median of reps; see BENCH/BASELINE.md) applied
to the round-2 media_pipeline regression (VERDICT r2 "What's wrong" #3).

Usage: python media_ab.py [reps] [sf_dir]
Writes BENCH/media_ab.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from duwamish_spark.functions import decode_media, synth_media
    from duwamish_spark.session import get_spark

    spark = get_spark("media-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    media = synth_media(docs).persist()
    n_media = media.count()  # materialize once; both arms read the same cache

    def arm(kernel: str) -> float:
        t0 = time.monotonic()
        decode_media(media, kernel=kernel).count()
        return time.monotonic() - t0

    # warm both arms once (worker fork + first-allocation pathologies are
    # documented to dominate cold runs in this sandbox), then interleave
    arm("perrow"), arm("vectorized")
    perrow, vectorized = [], []
    for _ in range(reps):
        perrow.append(arm("perrow"))
        vectorized.append(arm("vectorized"))

    med_p = statistics.median(perrow)
    med_v = statistics.median(vectorized)
    out = {
        "sf_dir": sf_dir,
        "n_media": n_media,
        "reps": reps,
        "perrow_sec": [round(x, 3) for x in perrow],
        "vectorized_sec": [round(x, 3) for x in vectorized],
        "perrow_median_sec": round(med_p, 3),
        "vectorized_median_sec": round(med_v, 3),
        "speedup_vectorized_over_perrow": round(med_p / med_v, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/media_ab.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
