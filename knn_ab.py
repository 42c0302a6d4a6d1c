"""Interleaved A/B timing of knn_cosine_lsh configs — the repo's standard
noise methodology (interleave arms, median of reps; see media_ab.py /
BENCH/BASELINE.md) applied to the round-3 `knn_lsh_mt8` regression
(VERDICT r3 "What's wrong" #4: 8.49 s r2 -> 12.15 s r3, single-shot
measurements, sandbox noise band documented at +-30%).

Arms: the regression-tracked 8-plane x 8-table config, and the new
round-4 default 6 x 16 (measured-quality point). Median of reps decides
whether r3's 12.15 s was a real regression or a noise draw.

Usage: python knn_ab.py [reps] [sf_dir]
Writes BENCH/knn_ab.json and prints one JSON line.
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
    from duwamish_spark.functions.similarity import knn_cosine_lsh
    from duwamish_spark.session import get_spark

    spark = get_spark("knn-ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).persist()
    n = emb.count()  # materialize once; both arms read the same cache

    def arm(n_planes: int, n_tables: int) -> float:
        t0 = time.monotonic()
        knn_cosine_lsh(emb, k=3, n_planes=n_planes, n_tables=n_tables).count()
        return time.monotonic() - t0

    # warm both arms (codegen + worker fork dominate cold runs), then
    # interleave so slow-machine phases hit both arms equally
    arm(8, 8), arm(6, 16)
    mt8, dft = [], []
    for _ in range(reps):
        mt8.append(arm(8, 8))
        dft.append(arm(6, 16))

    out = {
        "sf_dir": sf_dir,
        "n_embeddings": n,
        "reps": reps,
        "mt8_sec": [round(x, 3) for x in mt8],
        "default_6x16_sec": [round(x, 3) for x in dft],
        "mt8_median_sec": round(statistics.median(mt8), 3),
        "default_6x16_median_sec": round(statistics.median(dft), 3),
        "r2_single_shot_sec": 8.488,
        "r3_single_shot_sec": 12.15,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/knn_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
