"""Delta-LP vs sync-LP TO CONVERGENCE — the r4 verdict's crossover
measurement ("What's wrong" #3): the delta formulation was built as the
frontier/message-volume win, but BENCH_r04's fixed-5-round entries
measured it slower and chattier than sync at both scales. This harness
runs BOTH variants to label convergence (changed == 0) in fresh JVMs,
interleaved, and records per-round message counts and walls so the
crossover round (if any) and the end-to-end verdict are data.

Usage: python lp_ab.py [reps] [n_files]      (parent; defaults 2, 100000)
       python lp_ab.py --arm sync|delta N    (child, internal)
Writes BENCH/lp_ab.json and prints one JSON line.
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
MAX_SS = 60  # convergence cap: sf0.1 LP converges well under this


def _arm(kind: str, n_files: int) -> dict:
    sys.path.insert(0, REPO)
    from duwamish_spark.algorithms import label_propagation
    from duwamish_spark.algorithms.labelprop import label_propagation_delta
    from duwamish_spark.graph import prepare_encoding, vertices_from
    from duwamish_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"lp-ab-{kind}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.read.parquet(
        os.path.join(CACHE, f"edges_n{n_files}_d127_s42.parquet")
    )
    _m, verts, edges_e = prepare_encoding(
        spark, vertices_from(None, edges), edges, cpus
    )
    verts = verts.persist()
    edges_e = edges_e.persist()
    verts.count()
    edges_e.count()
    fn = label_propagation if kind == "sync" else label_propagation_delta
    t0 = time.monotonic()
    res = fn(
        spark, verts, edges_e, max_supersteps=MAX_SS,
        num_partitions=cpus, encode=False,
    )
    res.state.count()
    sec = time.monotonic() - t0
    per_round = [
        {
            "superstep": m["superstep"],
            "msgs": m.get("message_count"),
            "changed": m.get("changed"),
        }
        for m in res.metrics
    ]
    return {
        "sec": round(sec, 3),
        "supersteps": res.supersteps,
        "halted": res.halted,
        "total_msgs": sum(m["msgs"] or 0 for m in per_round),
        "per_round": per_round,
    }


def _run_child(kind: str, n_files: int) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--arm", kind, str(n_files)],
        capture_output=True, text=True, env=env,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    sys.stderr.write(f"[lp_ab] {kind} child failed rc={proc.returncode}: "
                     f"{proc.stderr[-1500:]}\n")
    return None


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--arm":
        out = _arm(sys.argv[2], int(sys.argv[3]))
        sys.stdout.write("\n" + json.dumps(out) + "\n")
        return

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    sync_runs, delta_runs = [], []
    for i in range(reps):
        r = _run_child("sync", n_files)
        if r:
            sync_runs.append(r)
        r = _run_child("delta", n_files)
        if r:
            delta_runs.append(r)
        sys.stderr.write(f"[lp_ab] rep {i+1}/{reps} done\n")

    def med(runs):
        return round(statistics.median(r["sec"] for r in runs), 3) if runs else None

    # crossover: first round where delta's message count drops below
    # sync's (sync resends ~E_sym every round, so compare per-round)
    crossover = None
    if sync_runs and delta_runs:
        s, d = sync_runs[0]["per_round"], delta_runs[0]["per_round"]
        for rs, rd in zip(s, d):
            if rd["msgs"] is not None and rs["msgs"] is not None and rd["msgs"] < rs["msgs"]:
                crossover = rd["superstep"]
                break

    out = {
        "n_files": n_files,
        "reps": reps,
        "methodology": "to-convergence, fresh JVM per rep, arms interleaved",
        "sync_median_sec": med(sync_runs),
        "delta_median_sec": med(delta_runs),
        "sync_runs": sync_runs,
        "delta_runs": delta_runs,
        "msg_crossover_round": crossover,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "lp_ab.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("sync_runs", "delta_runs")}))


if __name__ == "__main__":
    main()
