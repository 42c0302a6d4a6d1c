"""Hub-skew evidence (north rule: explicit salting/repartitioning of
high-degree hub-file skew).

Generates a Zipf-skewed edge table DISTRIBUTED (mapInPandas over index
ranges, counter-seeded — no driver-side materialization; this generator
shape scales to any edge count), where the hottest destination receives a
large fraction of all messages, then times fixed PageRank supersteps with
and without destination salting on the raw-exchange combine (the
configuration where one reducer partition would otherwise receive the
hub's entire in-degree).

Prints one JSON line and appends a section to BENCH/skew.json.

Usage: python skew_bench.py [--vertices 300000] [--edges 20000000]
       [--zipf 1.3] [--cpus 16] [--steps 6] [--salts 0,32]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def skewed_edges(spark, n_vertices: int, n_edges: int, zipf: float, parts: int, seed: int = 7):
    """(src uniform, dst ~ bounded-Zipf) edge table, generated in parallel."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    per = n_edges // parts

    def gen(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rng = np.random.default_rng(np.random.Philox(key=seed, counter=pid))
        # bounded zipf via inverse-CDF over ranks 1..V
        ranks = np.arange(1, n_vertices + 1, dtype=np.float64)
        w = ranks ** (-zipf)
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        for _ in batches:
            dst = np.searchsorted(cdf, rng.random(per)).astype(np.int64)
            src = rng.integers(0, n_vertices, size=per, dtype=np.int64)
            yield pd.DataFrame({"src": src, "dst": dst})

    seed_df = spark.range(parts).repartition(parts, "id")
    return seed_df.mapInPandas(gen, "src long, dst long"), per * parts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=300_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--zipf", type=float, default=1.3)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--salts", default="0,32")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duwamish_spark.algorithms import pagerank
    from duwamish_spark.graph import vertices_from
    from duwamish_spark.session import get_spark

    spark = get_spark("skew", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    edges, n_edges = skewed_edges(spark, args.vertices, args.edges, args.zipf, args.cpus)
    path = os.path.join(REPO, ".bench_cache", f"skew_v{args.vertices}_e{args.edges}_z{args.zipf}.parquet")
    if not os.path.exists(path):
        edges.write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)
    verts = vertices_from(None, edges).persist()
    verts.count()
    hub = edges.groupBy("dst").count().orderBy(F.desc("count")).limit(3).collect()

    results = {}
    for salt in [int(s) for s in args.salts.split(",")]:
        # warmup then measure
        pagerank(spark, verts, edges, tol=0.0, max_supersteps=2,
                 num_partitions=args.cpus, strategy="shuffle", combine="raw",
                 salt=salt, encode=False)
        res = pagerank(spark, verts, edges, tol=0.0, max_supersteps=args.steps,
                       num_partitions=args.cpus, strategy="shuffle", combine="raw",
                       salt=salt, encode=False)
        med = statistics.median(m["wall_ms"] / 1000.0 for m in res.metrics)
        results[f"salt_{salt}"] = {
            "median_step_sec": round(med, 3),
            "edges_per_sec": round(n_edges / med, 1),
            "residual": res.last.get("residual"),
        }
    spark.stop()

    out = {
        "graph": {
            "vertices": args.vertices,
            "edges": n_edges,
            "zipf_exponent": args.zipf,
            "top_in_degrees": [r["count"] for r in hub],
        },
        "cpus": args.cpus,
        "combine": "raw",
        "results": results,
    }
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
