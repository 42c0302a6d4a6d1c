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
        # one chunk per seed ROW (not per task: hash repartition can land
        # 0 or 2 seed rows on a task, which would drop/merge chunks)
        ranks = np.arange(1, n_vertices + 1, dtype=np.float64)
        w = ranks ** (-zipf)
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        for pdf in batches:
            for chunk in pdf["id"].tolist():
                rng = np.random.default_rng(np.random.Philox(key=seed, counter=chunk))
                dst = np.searchsorted(cdf, rng.random(per)).astype(np.int64)
                src = rng.integers(0, n_vertices, size=per, dtype=np.int64)
                yield pd.DataFrame({"src": src, "dst": dst})

    seed_df = spark.range(parts).repartition(parts, "id")
    return seed_df.mapInPandas(gen, "src long, dst long"), per * parts


def star_ring_edges(spark, n_vertices: int, parts: int):
    """Star (every vertex -> vertex 0) + ring (i -> i+1): the CC salt
    stress shape. Unlike a Zipf multigraph, the hub's in-degree SURVIVES
    symmetrize's dedup (V-1 distinct neighbors), and in round 2 all of it
    arrives carrying the SAME label (0) — the exact case the
    sender-derived salt sub-key term exists for (value-hash sub-keys
    collapse to one reducer)."""
    import numpy as np
    import pandas as pd

    per = n_vertices // parts

    def gen(batches):
        # one range per seed ROW (see skewed_edges note)
        for pdf in batches:
            for chunk in pdf["id"].tolist():
                lo = chunk * per
                hi = n_vertices if chunk == parts - 1 else lo + per
                src = np.arange(lo, hi, dtype=np.int64)
                star = pd.DataFrame({"src": src, "dst": np.zeros(hi - lo, dtype=np.int64)})
                ring = pd.DataFrame({"src": src, "dst": (src + 1) % n_vertices})
                yield pd.concat([star, ring], ignore_index=True)

    seed_df = spark.range(parts).repartition(parts, "id")
    return seed_df.mapInPandas(gen, "src long, dst long"), 2 * n_vertices


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=300_000)
    ap.add_argument("--edges", type=int, default=20_000_000)
    ap.add_argument("--zipf", type=float, default=1.3)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--salts", default="0,32")
    ap.add_argument(
        "--workload", default="pagerank", choices=["pagerank", "cc", "lp"],
        help="pagerank: distinct message values per sender; cc: hash-min "
        "labels collapse to identical values at the hub in late rounds — "
        "the case the sender-derived salt sub-key term exists for; lp: "
        "mode combine, where a hub whose neighborhood converges to one "
        "label makes (dst, label) the hot composite count key",
    )
    ap.add_argument(
        "--graph", default="zipf", choices=["zipf", "star"],
        help="zipf: multigraph hub (PageRank skew; dedup tames it for CC); "
        "star: hub adjacent to every vertex + ring (CC skew that survives "
        "symmetrize dedup, identical labels in round 2)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duwamish_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
    )
    from duwamish_spark.graph import vertices_from
    from duwamish_spark.session import get_spark

    spark = get_spark("skew", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    if args.graph == "star":
        edges, n_edges = star_ring_edges(spark, args.vertices, args.cpus)
        path = os.path.join(
            REPO, ".bench_cache", f"skew_star_v{args.vertices}.parquet"
        )
    else:
        edges, n_edges = skewed_edges(spark, args.vertices, args.edges, args.zipf, args.cpus)
        path = os.path.join(REPO, ".bench_cache", f"skew_v{args.vertices}_e{args.edges}_z{args.zipf}.parquet")
    if not os.path.exists(path):
        edges.write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)
    verts = vertices_from(None, edges).persist()
    verts.count()
    hub = edges.groupBy("dst").count().orderBy(F.desc("count")).limit(3).collect()

    def run(salt: int, steps: int):
        if args.workload == "cc":
            # raw exchange: the configuration where the hub's full
            # in-degree crosses the wire and reducer balance depends on
            # the salt sub-key — with map-side partial combine the hub
            # collapses to one row per map task and salting only adds
            # overhead (measured: 0.79s/step unsalted vs 1.04 salted)
            return connected_components(
                spark, verts, edges, max_supersteps=steps,
                num_partitions=args.cpus, strategy="shuffle",
                salt=salt, encode=False, combine="raw",
            )
        if args.workload == "lp":
            # same raw-exchange rationale as CC; the salted path splits
            # the (dst, label) composite count key across sub-keys
            return label_propagation(
                spark, verts, edges, max_supersteps=steps,
                num_partitions=args.cpus, strategy="shuffle",
                salt=salt, encode=False, combine="raw",
            )
        return pagerank(
            spark, verts, edges, tol=0.0, max_supersteps=steps,
            num_partitions=args.cpus, strategy="shuffle", combine="raw",
            salt=salt, encode=False,
        )

    results = {}
    for salt in [int(s) for s in args.salts.split(",")]:
        run(salt, 2)  # warmup
        res = run(salt, args.steps)
        walls = [m["wall_ms"] / 1000.0 for m in res.metrics]
        med = statistics.median(walls)
        results[f"salt_{salt}"] = {
            "median_step_sec": round(med, 3),
            # CC's frontier decays round over round, so the median hides
            # the heavy first rounds — total and per-step walls tell the
            # real story for decaying workloads
            "total_sec": round(sum(walls), 3),
            "step_secs": [round(w, 3) for w in walls],
            "edges_per_sec": round(n_edges / med, 1),
            "residual": res.last.get("residual"),
            "changed": res.last.get("changed"),
        }
    spark.stop()

    out = {
        "workload": args.workload,
        "graph": {
            "kind": args.graph,
            "vertices": args.vertices,
            "edges": n_edges,
            "zipf_exponent": args.zipf if args.graph == "zipf" else None,
            "top_in_degrees": [r["count"] for r in hub],
        },
        "cpus": args.cpus,
        "combine": "raw",
        "results": results,
    }
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "skew.json")
    book = {}
    if os.path.exists(path):
        with open(path) as f:
            book = json.load(f)
        if "results" in book:  # migrate round-1 single-workload layout
            book = {"pagerank": book}
    key = args.workload if args.graph == "zipf" else f"{args.workload}_{args.graph}"
    book[key] = out
    with open(path, "w") as f:
        json.dump(book, f, indent=2)


if __name__ == "__main__":
    main()
