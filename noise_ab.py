"""Interleaved fresh-JVM repetitions of the two unadjudicated SF=1
bench series — the repo's standard noise methodology (media_ab/knn_ab)
applied to the r4 verdict's open items:

  * pagerank_converged at SF=1 (r3 197.8 s -> r4 260.1 s, while a
    same-code session run measured 123.3 s — a 2.1x spread across
    single-shot runs of identical code)
  * knn_lsh_1m (r3 129.4 s -> r4 166.8 s)

Each reptition is its OWN child process (fresh JVM — the documented
aged-JVM effect is ~3x on this exact block, bench.py
_run_block_subprocess), arms interleaved so machine phases hit both
equally. The median with spread is the adjudicated number; the verdict
(noise vs regression) goes to docs/PLANS.md and BENCH_r05.

Usage: python noise_ab.py [reps]         (parent; default 3)
       python noise_ab.py --arm pr|knn   (child, internal)
Writes BENCH/noise_ab.json and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")


def _arm_pr() -> dict:
    sys.path.insert(0, REPO)
    from duwamish_spark.algorithms import pagerank
    from duwamish_spark.graph import prepare_encoding, vertices_from
    from duwamish_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("noise-ab-pr", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(
        os.path.join(CACHE, "edges_n1000000_d127_s42.parquet")
    )
    t0 = time.monotonic()
    _m, verts, edges_e = prepare_encoding(
        spark, vertices_from(None, edges), edges, cpus
    )
    verts = verts.persist()
    edges_e = edges_e.persist()
    verts.count()
    ne = edges_e.count()
    build_sec = time.monotonic() - t0
    t0 = time.monotonic()
    pr = pagerank(
        spark, verts, edges_e, tol=1e-6, max_supersteps=200,
        num_partitions=cpus, halt_interval=4, encode=False,
    )
    pr.state.count()
    sec = time.monotonic() - t0
    return {
        "build_sec": round(build_sec, 3),
        "sec": round(sec, 3),
        "supersteps": pr.supersteps,
        "edges_per_sec": round(ne * pr.supersteps / sec, 1),
    }


def _arm_knn() -> dict:
    sys.path.insert(0, REPO)
    from duwamish_spark.functions.similarity import knn_cosine_lsh
    from duwamish_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("noise-ab-knn", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(CACHE, "emb_1m_d64.parquet"))
    t0 = time.monotonic()
    n = knn_cosine_lsh(emb, k=3, n_planes=20, n_tables=4).count()
    return {"sec": round(time.monotonic() - t0, 3), "rows": n}


def _run_child(arm: str) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm", arm],
        capture_output=True, text=True, env=env,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    sys.stderr.write(f"[noise_ab] {arm} child failed rc={proc.returncode}: "
                     f"{proc.stderr[-1500:]}\n")
    return None


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--arm":
        out = _arm_pr() if sys.argv[2] == "pr" else _arm_knn()
        sys.stdout.write("\n" + json.dumps(out) + "\n")
        return

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    pr_runs, knn_runs = [], []
    for i in range(reps):
        r = _run_child("pr")
        if r:
            pr_runs.append(r)
        r = _run_child("knn")
        if r:
            knn_runs.append(r)
        sys.stderr.write(f"[noise_ab] rep {i+1}/{reps} done\n")

    def stats(runs):
        secs = [r["sec"] for r in runs]
        return {
            "secs": secs,
            "median_sec": round(statistics.median(secs), 3) if secs else None,
            "min_sec": min(secs) if secs else None,
            "max_sec": max(secs) if secs else None,
            "spread": round(max(secs) / min(secs), 2) if secs else None,
        }

    out = {
        "reps": reps,
        "methodology": "fresh JVM per rep, arms interleaved, machine idle",
        "sf1_pagerank": {**stats(pr_runs), "runs": pr_runs},
        "knn_lsh_1m": {**stats(knn_runs), "runs": knn_runs},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "noise_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
