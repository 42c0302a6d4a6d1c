"""Scaling-efficiency evidence (north rule: throughput scaling ≥ 0.8
between N and 4N executors).

No real cluster exists in this sandbox, so the same job — PageRank, fixed
superstep count, identical cached input — runs at two parallelism levels
(default local[8] vs local[32]) in separate fresh JVMs. Throughput =
edges x supersteps / wall-seconds of the superstep loop (one-time graph
prep excluded on both sides equally, as it would be on a cluster where the
edge table is loaded once). Efficiency = T(4N) / (4 x T(N)).

Writes BENCH/BASELINE.md and prints one JSON line.

Usage:  python scaling_bench.py [--files 100000] [--deg 127] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def worker(cpus: int, files: int, deg: int, steps: int, strategy: str = "shuffle") -> None:
    from duwamish_spark.algorithms import pagerank
    from duwamish_spark.graph import vertices_from
    from duwamish_spark.session import get_spark
    from bench import edges_parquet

    spark = get_spark(f"scal{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    path, _ = edges_parquet(spark, files, deg)
    edges = spark.read.parquet(path)
    n_edges = edges.count()
    verts = vertices_from(None, edges).persist()
    verts.count()
    # warmup: JIT/codegen compile, not counted (same on both sides)
    pagerank(spark, verts, edges, tol=0.0, max_supersteps=3, num_partitions=cpus,
             strategy=strategy)
    t0 = time.monotonic()
    res = pagerank(spark, verts, edges, tol=0.0, max_supersteps=steps, num_partitions=cpus,
                   strategy=strategy)
    wall = time.monotonic() - t0
    spark.stop()
    print(
        json.dumps(
            {
                "cpus": cpus,
                "edges": n_edges,
                "supersteps": res.supersteps,
                "wall_sec": round(wall, 3),
                "edges_per_sec": round(n_edges * res.supersteps / wall, 1),
                "supersteps_per_min": round(res.supersteps / (wall / 60.0), 2),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--deg", type=int, default=127)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--strategy", default="shuffle",
                    help="shuffle (cluster path) or broadcast")
    ap.add_argument("--worker", type=int, default=0)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.files, args.deg, args.steps, args.strategy)
        return

    results = {}
    for cpus in (args.low, args.high):
        out = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--worker",
                str(cpus),
                "--files",
                str(args.files),
                "--deg",
                str(args.deg),
                "--steps",
                str(args.steps),
                "--strategy",
                args.strategy,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=1800,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = results[args.low], results[args.high]
    factor = args.high / args.low
    eff = hi["edges_per_sec"] / (factor * lo["edges_per_sec"])
    summary = {
        "job": f"pagerank fixed {args.steps} supersteps, {args.strategy} strategy, encoded ids",
        "graph": {"files": args.files, "max_out_degree": args.deg, "edges": hi["edges"]},
        "low": lo,
        "high": hi,
        "scaling_factor": factor,
        "scaling_efficiency": round(eff, 3),
        "gate": eff >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured engine numbers vs reference

North-rule metric (BASELINE.json): supersteps/min and edges-processed/sec
to PageRank convergence; scaling efficiency >= 0.8 between N and 4N
executors — evidenced here as the same job + identical cached input at
`local[{args.low}]` vs `local[{args.high}]` in fresh JVMs (no real cluster in this
sandbox).

## Scaling run (PageRank, {args.strategy} strategy, fixed {args.steps} supersteps, {hi['edges']:,} edges,
{args.files:,} vertices, out-degree ~ U{{0..{args.deg}}} — the reference benchmark
shape, example/PageRank.java:89,117)

| parallelism | wall (s) | edges-processed/sec | supersteps/min |
|---|---|---|---|
| local[{args.low}] | {lo['wall_sec']} | {lo['edges_per_sec']:,.0f} | {lo['supersteps_per_min']} |
| local[{args.high}] | {hi['wall_sec']} | {hi['edges_per_sec']:,.0f} | {hi['supersteps_per_min']} |

**Scaling efficiency ({args.high}/{args.low} cores): {eff:.3f}** (gate >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

## Reference comparison (same graph shape/size)

Reference PageRank at 100k vertices / ~6.35M edges, <=200 supersteps,
8 threads: 88.499 s (notes/benchmarks.txt:11) => <= ~14.3M edge-msgs/s
upper bound assuming the full 200 supersteps ran (BASELINE.md).

This engine at local[{args.high}]: {hi['edges_per_sec']/1e6:.1f}M edge-msgs/s measured
(fixed-superstep loop, excluding one-time graph prep on both sides).

Convergence-run numbers (full pipeline, per-round BENCH_r{{N}}.json):
see bench.py output — pagerank to L1 < 1e-6 on the parsed corpus graph.
"""
        )


if __name__ == "__main__":
    main()
