"""Benchmark harness — prints ONE JSON line.

Headline: the north-rule metric — PageRank (damping 0.85) to L1-residual
< 1e-6 convergence on the edge graph parsed from the source-code corpus,
reporting supersteps/min and edges-processed/sec, plus CC / LP / triangles
and two pipeline ops at the same scale.

Corpus scale tracks the driver SF: n_files = SF * 1e6 with out-degree ~
U{0..127} — at SF=0.1 that is 100k files / ~6.35M edges, the same graph
shape and size as the reference's published 100k-vertex PageRank row
(88.499 s for ≤200 supersteps; reference: notes/benchmarks.txt:11,
example/PageRank.java:89,117).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     DUWAMISH_BENCH_FILES (override corpus size),
     DUWAMISH_BENCH_DEG (override max out-degree, default 127),
     DUWAMISH_BENCH_REC (recommendations SGD benchmark: 1 = 1k/10k full
       1000-superstep schedule [default], 2 = also the 5k/50k stretch,
       0 = skip),
     DUWAMISH_BENCH_SF1 (SF=1 block at 1M files / 63.5M edges: default
       runs IF the .bench_cache edge parquet exists; 1 = force
       (generates the corpus, ~25 min first time), 0 = skip),
     DUWAMISH_BENCH_SF10 (SF=10 stretch block at 10M files / ~635M
       edges, PageRank fixed-10 + CC converged: same gating as SF1).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cache")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def edges_parquet(spark, n_files: int, deg: int, seed: int = 42) -> tuple[str, float]:
    """Parse the corpus into an edge table, cached; returns (path, parse_sec).

    parse_sec = 0.0 when served from cache (the parse stage is timed on the
    first materialization only).
    """
    from duwamish_spark.corpus import corpus_df
    from duwamish_spark.parse import extract_edges

    path = os.path.join(CACHE, f"edges_n{n_files}_d{deg}_s{seed}.parquet")
    if os.path.exists(path):
        return path, 0.0
    corpus = corpus_df(spark, n_files, deg, seed, cache_dir=CACHE)
    t0 = time.monotonic()
    extract_edges(corpus).write.mode("overwrite").parquet(path)
    return path, time.monotonic() - t0


def sgd_ratings_pdf(movies: int, users: int, maxr: int = 64, seed: int = 7):
    """Deterministic ratings table shaped like the reference's generator
    (Recommendations.java:158-181: per-user rating count ~ U{0..maxr},
    uniform movie, integer rating 0..4)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    counts = rng.integers(0, maxr, size=users)
    u = np.repeat(np.arange(users), counts)
    m = rng.integers(0, movies, size=u.size)
    r = rng.integers(0, 5, size=u.size).astype(float)
    return pd.DataFrame(
        {
            "user_id": np.char.add("u", u.astype(str)),
            "movie_id": np.char.add("m", m.astype(str)),
            "rating_id": np.char.add("r", np.arange(u.size).astype(str)),
            "rating": r,
        }
    )


def bench_recommendations(spark, extra: dict, stretch: bool) -> float:
    """The reference's published Recommendations rows
    (notes/benchmarks.txt:2-3): full 1000-superstep SGD schedule
    (10 features x 50 runs x 2) at 1k movies / 10k users (238.137 s
    best-of-3 single-node) and optionally 5k/50k (1,378.275 s).
    Runs the model-broadcast strategy; final MSE is checked against the
    NumPy oracle (tests/oracle.py) in the same process."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO, "tests"))
    from oracle import recommend_oracle

    from duwamish_spark.algorithms.recommend import recommendations

    total_sec = 0.0
    shapes = [("1k_10k", 1000, 10_000, 238.137)]
    if stretch:
        shapes.append(("5k_50k", 5000, 50_000, 1378.275))
    for name, m, u, ref_sec in shapes:
        pdf = sgd_ratings_pdf(m, u)
        ratings = spark.createDataFrame(pdf)
        t0 = time.monotonic()
        res = recommendations(
            spark, ratings, strategy="broadcast", num_partitions=8
        )
        res.state.count()
        sec = time.monotonic() - t0
        total_sec += sec
        mses = [r["mse"] for r in res.metrics if r.get("mse") is not None]
        entry = {
            "sec": round(sec, 3),
            "supersteps": res.supersteps,
            "supersteps_per_min": round(res.supersteps / sec * 60.0, 1),
            "ratings": len(pdf),
            "final_mse": round(mses[-1], 9),
            "reference_sec": ref_sec,
            "speedup_vs_reference": round(ref_sec / sec, 2),
        }
        if name == "1k_10k":
            # oracle the FULL schedule (numpy replay, a few seconds)
            rows = [tuple(r) for r in pdf.itertuples(index=False)]
            _, _, _, mse_oracle = recommend_oracle(
                rows, n_features=10, runs_per_feature=50
            )
            entry["oracle_mse"] = round(mse_oracle, 9)
            entry["mse_matches_oracle"] = bool(
                abs(mse_oracle - mses[-1]) < 1e-6
            )
        extra.setdefault("recommendations", {})[name] = entry
    return total_sec


def bench_sf1(spark, cpus: int) -> dict:
    """SF=1 block: the same pipeline at 1M files / 63.5M edges plus the
    LLM-pipeline ops at 1M docs / 1M embeddings. The banded-minhash pass
    runs on the FULL 1M docs since round 4 (two-stage verify; the
    100k-doc hash-sample entry is kept as the cross-round series).
    simhash at 1M stays omitted: its pigeonhole banding has no
    verify-side prefilter equivalent, and the corpus is boilerplate-
    dense (a data property, not a plan property)."""
    from pyspark.sql import functions as F

    from duwamish_spark.algorithms import connected_components, pagerank
    from duwamish_spark.functions import (
        exact_dedup,
        minhash_near_dups,
        token_stats,
    )
    from duwamish_spark.functions.similarity import knn_cosine_lsh
    from duwamish_spark.graph import prepare_encoding, vertices_from

    q: dict[str, float] = {}
    d: dict[str, object] = {}

    epath, parse_sec = edges_parquet(spark, 1_000_000, 127)
    if parse_sec:
        q["parse_corpus"] = round(parse_sec, 3)
    edges = spark.read.parquet(epath)

    t0 = time.monotonic()
    _m, verts, edges_e = prepare_encoding(
        spark, vertices_from(None, edges), edges, cpus
    )
    verts = verts.persist()
    edges_e = edges_e.persist()
    nv = verts.count()
    ne = edges_e.count()
    q["build_vertices"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pr = pagerank(
        spark, verts, edges_e, tol=1e-6, max_supersteps=200,
        num_partitions=cpus, halt_interval=4, encode=False,
    )
    pr.state.count()
    sec = time.monotonic() - t0
    q["pagerank_converged"] = round(sec, 3)
    d["pagerank"] = {
        "supersteps": pr.supersteps,
        "halted": pr.halted,
        "vertices": nv,
        "edges": ne,
        "edges_per_sec": round(ne * pr.supersteps / sec, 1),
        "supersteps_per_min": round(pr.supersteps / (sec / 60.0), 2),
    }

    t0 = time.monotonic()
    cc = connected_components(
        spark, verts, edges_e, num_partitions=cpus, encode=False
    )
    n_comp = cc.state.agg(F.countDistinct("label")).collect()[0][0]
    q["connected_components"] = round(time.monotonic() - t0, 3)
    d["cc"] = {"rounds": cc.supersteps, "components": n_comp}

    # round-4: the frontier/delta-LP message-economics evidence at scale —
    # same labels, message volume bounded by the shrinking changed
    # frontier (sync resends E_sym every round)
    from duwamish_spark.algorithms import label_propagation
    from duwamish_spark.algorithms.labelprop import label_propagation_delta

    t0 = time.monotonic()
    lp = label_propagation(
        spark, verts, edges_e, max_supersteps=5, num_partitions=cpus, encode=False
    )
    lp.state.count()
    q["label_propagation_5"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lpd = label_propagation_delta(
        spark, verts, edges_e, max_supersteps=5, num_partitions=cpus, encode=False
    )
    lpd.state.count()
    q["label_propagation_5_delta"] = round(time.monotonic() - t0, 3)
    d["lp_delta"] = {
        "sync_msgs": sum(m["message_count"] for m in lp.metrics),
        "delta_msgs": sum(m["message_count"] for m in lpd.metrics),
        "label_mismatches": (
            lp.state.join(lpd.state.withColumnRenamed("label", "dl"), "id")
            .where(F.col("label") != F.col("dl"))
            .count()
        ),
    }
    # round-4 session-7: the new operators at SF=1 — WL roles and seeded
    # LP are E-bounded per round on the main graph; trussness/census run
    # on a d15 graph of the same 1M vertices (wedge-bounded workloads,
    # the same split as the sf0.1 block), trussness at a fixed 5-round
    # upper bound (the coreness-gate fixed-round semantics) to keep the
    # block's wall bounded.
    from duwamish_spark.algorithms import (
        seeded_label_propagation,
        triad_census,
        trussness,
        wl_signatures,
    )
    from duwamish_spark.pregel import free_local_checkpoint as _flc

    t0 = time.monotonic()
    wl = wl_signatures(spark, verts, edges_e, rounds=2)
    q["wl_roles_r2"] = round(time.monotonic() - t0, 3)
    d["wl_roles_r2_colors"] = wl.metrics[-1]["colors"] if wl.metrics else None
    _flc(wl.state)

    t0 = time.monotonic()
    slp = seeded_label_propagation(
        spark, verts, edges_e,
        verts.where(F.col("id") % 1000 == 0).select(
            "id", (F.col("id") % 11).alias("label")
        ),
        max_supersteps=3, num_partitions=cpus,
    )
    q["seeded_lp_3"] = round(time.monotonic() - t0, 3)
    d["seeded_lp_3_labeled"] = slp.last.get("labeled")
    _flc(slp.state)

    verts.unpersist()
    edges_e.unpersist()

    spath15, _ = edges_parquet(spark, 1_000_000, 15)
    sedges1 = spark.read.parquet(spath15)
    t0 = time.monotonic()
    tn = trussness(spark, sedges1, max_rounds=5)
    tn.state.count()
    q["trussness_d15_r5"] = round(time.monotonic() - t0, 3)
    d["trussness_d15"] = {"rounds": tn.supersteps, "halted": tn.halted}
    _flc(tn.state)

    t0 = time.monotonic()
    v15 = vertices_from(None, sedges1)
    tc = {
        r["triad"]: int(r["count"])
        for r in triad_census(spark, v15, sedges1).collect()
    }
    q["triad_census_d15"] = round(time.monotonic() - t0, 3)
    d["triad_census_d15"] = {"030T": tc.get("030T", 0), "030C": tc.get("030C", 0)}

    corpus_path = os.path.join(CACHE, "corpus_n1000000_d127_s42.parquet")
    if os.path.exists(corpus_path):
        corpus = spark.read.parquet(corpus_path)
        docs = corpus.select(
            F.concat_ws("/", "repo", "path").alias("doc_id"),
            F.col("content").alias("text"),
        )
        t0 = time.monotonic()
        n_groups = exact_dedup(docs).count()
        q["exact_dedup_1m"] = round(time.monotonic() - t0, 3)
        d["exact_dedup_1m_groups"] = n_groups

        t0 = time.monotonic()
        n_tok = token_stats(docs).agg(F.sum("n_tokens")).collect()[0][0]
        q["token_stats_1m"] = round(time.monotonic() - t0, 3)
        d["token_stats_1m_tokens"] = int(n_tok)

        sample = docs.where(F.pmod(F.hash("doc_id"), 10) == 0)
        t0 = time.monotonic()
        n_pairs = minhash_near_dups(
            sample, threshold=0.7, n_hashes=16, bands=4
        ).count()
        q["minhash_100k_sample"] = round(time.monotonic() - t0, 3)
        d["minhash_100k_pairs"] = n_pairs

        # realized recall of the signature-estimate gate (the gated
        # output is a strict subset of the ungated one, so the count
        # ratio IS the recall)
        n_pairs_ungated = minhash_near_dups(
            sample, threshold=0.7, n_hashes=16, bands=4, est_eps=None
        ).count()
        d["minhash_prefilter_recall"] = {
            "gated_pairs": n_pairs,
            "ungated_pairs": n_pairs_ungated,
            "recall": round(n_pairs / max(n_pairs_ungated, 1), 4),
        }

        # round 4: the FULL 1M-doc near-dup pass, no sampling — feasible
        # because the verify is two-staged (exact size-ratio bound +
        # signature-estimate gate prune the 260M banded candidates to a
        # small survivor set before any full-array fetch; see dedup.py)
        t0 = time.monotonic()
        n_pairs_full = minhash_near_dups(
            docs, threshold=0.7, n_hashes=16, bands=4
        ).count()
        q["minhash_1m_full"] = round(time.monotonic() - t0, 3)
        d["minhash_1m_pairs"] = n_pairs_full

    # 1M x 64 deterministic embeddings, generated JVM-side and cached
    emb_path = os.path.join(CACHE, "emb_1m_d64.parquet")
    if not os.path.exists(emb_path):
        spark.range(1_000_000).select(
            F.concat(F.lit("v"), F.col("id")).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (F.pmod(F.hash(F.col("id"), i), 2001) - 1000).cast(
                    "double"
                )
                / 1000.0,
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(emb_path)
    emb = spark.read.parquet(emb_path)
    t0 = time.monotonic()
    n_knn = knn_cosine_lsh(emb, k=3, n_planes=20, n_tables=4).count()
    q["knn_lsh_1m"] = round(time.monotonic() - t0, 3)
    d["knn_lsh_1m_rows"] = n_knn

    return {
        "sf": 1.0,
        "queries": q,
        "total_sec": round(sum(q.values()), 3),
        "graph": {"files": 1_000_000, "max_out_degree": 127, "edges": ne},
        "detail": d,
    }


def bench_sf10(spark, cpus: int) -> dict:
    """SF=10 stretch block: 10M files / ~635M edges — a second measured
    decade above SF=1, turning the "plans survive 100x" claim into data.

    PageRank runs a FIXED 10 supersteps: the scaling claim under test is
    per-edge message throughput, which fixed supersteps measure exactly,
    while convergence at this scale is a ~30-minute job that would
    measure the same rate 12x over. CC runs to convergence (its round
    count shrinks geometrically, so it stays bounded)."""
    from pyspark.sql import functions as F

    from duwamish_spark.algorithms import connected_components, pagerank
    from duwamish_spark.graph import prepare_encoding, vertices_from

    q: dict[str, float] = {}
    d: dict[str, object] = {}

    epath, parse_sec = edges_parquet(spark, 10_000_000, 127)
    if parse_sec:
        q["parse_corpus"] = round(parse_sec, 3)
    edges = spark.read.parquet(epath)

    t0 = time.monotonic()
    _m, verts, edges_e = prepare_encoding(
        spark, vertices_from(None, edges), edges, cpus * 4
    )
    verts = verts.persist()
    edges_e = edges_e.persist()
    nv = verts.count()
    ne = edges_e.count()
    q["build_vertices"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    pr = pagerank(
        spark, verts, edges_e, max_supersteps=10,
        num_partitions=cpus * 4, halt_interval=4, encode=False,
    )
    pr.state.count()
    sec = time.monotonic() - t0
    q["pagerank_fixed10"] = round(sec, 3)
    d["pagerank"] = {
        "supersteps": pr.supersteps,
        "vertices": nv,
        "edges": ne,
        "edges_per_sec": round(ne * pr.supersteps / sec, 1),
    }

    # broadcast strategy above its auto cap: on ONE box a 10M-vertex
    # (~400 MB) per-superstep broadcast beats shuffling E message rows
    # (measured 22.9M vs 12.4M e/s) because local "broadcast" is a memory
    # copy; on a 1000-executor cluster it would be 400 GB of network per
    # superstep, which is why auto keeps the 5M cap and shuffle stays the
    # headline strategy here.
    t0 = time.monotonic()
    prb = pagerank(
        spark, verts, edges_e, max_supersteps=10,
        num_partitions=cpus * 4, halt_interval=2, encode=False,
        strategy="broadcast", broadcast_max_vertices=11_000_000,
    )
    prb.state.count()
    sec_b = time.monotonic() - t0
    q["pagerank_fixed10_broadcast"] = round(sec_b, 3)
    d["pagerank_broadcast"] = {
        "supersteps": prb.supersteps,
        "edges_per_sec": round(ne * prb.supersteps / sec_b, 1),
    }

    t0 = time.monotonic()
    cc = connected_components(
        spark, verts, edges_e, num_partitions=cpus * 4, encode=False
    )
    n_comp = cc.state.agg(F.countDistinct("label")).collect()[0][0]
    q["connected_components"] = round(time.monotonic() - t0, 3)
    d["cc"] = {"rounds": cc.supersteps, "components": n_comp}
    verts.unpersist()
    edges_e.unpersist()

    return {
        "sf": 10.0,
        "queries": q,
        "total_sec": round(sum(q.values()), 3),
        "graph": {"files": 10_000_000, "max_out_degree": 127, "edges": ne},
        "detail": d,
    }


# per-block driver heap: SF=10 (635M edges in one JVM) needs headroom or
# it trades the time back in shuffle/persist spill; SF=1 measured ~9%
# FASTER at 48g than 80g (smaller heap = tighter GC generations). An
# explicit SPARK_DRIVER_MEM always wins.
_BLOCK_MEM = {"sf1": "48g", "sf10": "80g"}


def _run_block_subprocess(name: str) -> dict | None:
    """Run bench_sf1/bench_sf10 in a CHILD python process (fresh JVM).

    Measured reason: after the headline + recommendations work, the aged
    local-mode JVM runs SF=1 PageRank at 2.9 s/superstep vs 1.0 s in a
    fresh JVM (123.6 s vs 354 s for the block) — accumulated code-cache /
    GC state, not the algorithm. On a cluster each scale run is its own
    spark-submit application anyway; the subprocess reproduces exactly
    that. Returns the block dict, or None (recorded, not fatal) if the
    child fails."""
    import subprocess

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", _BLOCK_MEM[name])
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--block", name],
        capture_output=True, text=True, env=env,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    sys.stderr.write(
        f"[bench] {name} block child failed (rc={proc.returncode}): "
        f"{proc.stderr[-2000:]}\n"
    )
    return None


def _block_main(name: str) -> None:
    """Child entry: one scale block in its own JVM, JSON as the sole
    final line (same tail-parse contract as the parent)."""
    from duwamish_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"duwamish-bench-{name}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    block = bench_sf1(spark, cpus) if name == "sf1" else bench_sf10(spark, cpus)
    spark.stop()
    sys.stdout.write("\n" + json.dumps(block) + "\n")
    sys.stdout.flush()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--block":
        _block_main(sys.argv[2])
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)
    n_files = int(os.environ.get("DUWAMISH_BENCH_FILES", str(max(1000, int(sf * 1_000_000)))))
    deg = int(os.environ.get("DUWAMISH_BENCH_DEG", "127"))

    from pyspark.sql import functions as F

    from duwamish_spark.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from duwamish_spark.functions import minhash_near_dups
    from duwamish_spark.functions.similarity import knn_cosine_lsh
    from duwamish_spark.graph import vertices_from
    from duwamish_spark.session import get_spark

    spark = get_spark("duwamish-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    queries: dict[str, float] = {}
    extra: dict[str, object] = {}

    epath, parse_sec = edges_parquet(spark, n_files, deg)
    if parse_sec:
        queries["parse_corpus"] = round(parse_sec, 3)
    edges = spark.read.parquet(epath)
    n_edges = edges.count()

    t0 = time.monotonic()
    verts_raw = vertices_from(None, edges)
    # encode string ids to dense longs ONCE and share across all algorithms
    # (a real deployment amortizes the dictionary the same way)
    from duwamish_spark.graph import prepare_encoding

    _mapping, verts, edges = prepare_encoding(spark, verts_raw, edges, cpus)
    verts = verts.persist()
    edges = edges.persist()
    n_verts = verts.count()
    edges.count()
    queries["build_vertices"] = round(time.monotonic() - t0, 3)

    # headline metric: best of 2 runs (sandbox wall-clock noise is +-30%;
    # the first run also absorbs codegen warmup)
    pr_sec = None
    for _ in range(2):
        t0 = time.monotonic()
        pr = pagerank(
            spark, verts, edges, tol=1e-6, max_supersteps=200, num_partitions=cpus,
            halt_interval=4, encode=False,
        )
        pr.state.count()
        sec = time.monotonic() - t0
        pr_sec = sec if pr_sec is None else min(pr_sec, sec)
    queries["pagerank_converged"] = round(pr_sec, 3)
    extra["pagerank"] = {
        "supersteps": pr.supersteps,
        "halted": pr.halted,
        "residual": pr.last.get("residual"),
        "vertices": n_verts,
        "edges": n_edges,
        "edges_per_sec": round(n_edges * pr.supersteps / pr_sec, 1),
        "supersteps_per_min": round(pr.supersteps / (pr_sec / 60.0), 2),
    }

    t0 = time.monotonic()
    cc = connected_components(spark, verts, edges, num_partitions=cpus, encode=False)
    n_comp = cc.state.agg(F.countDistinct("label")).collect()[0][0]
    queries["connected_components"] = round(time.monotonic() - t0, 3)
    extra["cc"] = {"rounds": cc.supersteps, "components": n_comp}

    # hash-min vs alternating-star on the same graph (the algorithm="auto"
    # switch picks between these; detail-only so the headline total stays
    # comparable across rounds)
    from duwamish_spark.algorithms import connected_components_alternating

    t0 = time.monotonic()
    alt = connected_components_alternating(
        spark, verts, edges, num_partitions=cpus, encode=False
    )
    alt.state.count()
    extra["cc"]["alternating_sec"] = round(time.monotonic() - t0, 3)
    extra["cc"]["alternating_rounds"] = alt.supersteps

    t0 = time.monotonic()
    lp = label_propagation(spark, verts, edges, max_supersteps=5, num_partitions=cpus, encode=False)
    lp.state.count()
    queries["label_propagation_5"] = round(time.monotonic() - t0, 3)

    # round-4: frontier/delta LP — identical labels, message volume
    # bounded by the changed frontier instead of E_sym every round
    from duwamish_spark.algorithms.labelprop import label_propagation_delta

    t0 = time.monotonic()
    lpd = label_propagation_delta(
        spark, verts, edges, max_supersteps=5, num_partitions=cpus, encode=False
    )
    lpd.state.count()
    queries["label_propagation_5_delta"] = round(time.monotonic() - t0, 3)
    _mismatch = (
        lp.state.join(lpd.state.withColumnRenamed("label", "dl"), "id")
        .where(F.col("label") != F.col("dl"))
        .count()
    )
    extra["lp_delta"] = {
        "sync_msgs": sum(m["message_count"] for m in lp.metrics),
        "delta_msgs": sum(m["message_count"] for m in lpd.metrics),
        "label_mismatches": _mismatch,
    }

    # community-quality gate on the LP labels (integer aggregation + one
    # fixed float expression — a few joins, detail-only)
    from duwamish_spark.algorithms import modularity

    t0 = time.monotonic()
    q_mod = modularity(edges, lp.state).collect()[0]["modularity"]
    extra["lp_modularity"] = {
        "sec": round(time.monotonic() - t0, 3), "modularity": q_mod,
    }

    # round-4: Louvain move phase — modularity-objective communities;
    # per-round cost model == one LP count exchange. Quality vs LP is the
    # point of the operator, so both modularities land in the artifact.
    from duwamish_spark.algorithms import louvain

    t0 = time.monotonic()
    lv = louvain(spark, verts, edges, max_rounds=10)
    lv_comms = lv.state.select("comm").distinct().count()
    lv_sec = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    lv_mod = modularity(
        edges, lv.state.select("id", F.col("comm").alias("label"))
    ).collect()[0]["modularity"]
    queries["louvain_10"] = lv_sec
    extra["louvain"] = {
        "sec": lv_sec, "rounds": lv.supersteps, "halted": lv.halted,
        "communities": lv_comms,
        "modularity": lv_mod, "lp5_modularity": q_mod,
        "modularity_sec": round(time.monotonic() - t0, 3),
    }

    t0 = time.monotonic()
    tri = triangle_count(edges)
    queries["triangle_count"] = round(time.monotonic() - t0, 3)
    extra["triangles"] = tri

    # round-3 link-analysis additions — detail-only (headline total stays
    # an apples-to-apples series across rounds)
    from duwamish_spark.algorithms import hits, k_core

    t0 = time.monotonic()
    ht = hits(spark, verts, edges, max_iters=5, tol=0.0, num_partitions=cpus, encode=False)
    ht.state.count()
    sec = time.monotonic() - t0
    extra["hits_5iter"] = {
        "sec": round(sec, 3),
        # two E-bounded message shuffles per iteration
        "edge_msgs_per_sec": round(2 * n_edges * ht.supersteps / sec, 1),
    }

    t0 = time.monotonic()
    kc = k_core(
        spark, verts, edges, 40, num_partitions=cpus, encode=False,
        max_rounds=30,
    )
    sec = time.monotonic() - t0
    extra["kcore_k40"] = {
        "sec": round(sec, 3),
        "rounds": kc.supersteps,
        "core_size": kc.state.count(),
        "halted": kc.halted,
    }

    from duwamish_spark.algorithms import strongly_connected_components
    from duwamish_spark.pregel import free_local_checkpoint

    t0 = time.monotonic()
    scc = strongly_connected_components(
        spark, verts, edges, num_partitions=cpus, encode=False
    )
    n_scc = scc.state.agg(F.countDistinct("scc_id")).collect()[0][0]
    sec = time.monotonic() - t0
    extra["scc"] = {
        "sec": round(sec, 3),
        "iterations": scc.supersteps,
        "components": n_scc,
        "halted": scc.halted,
    }
    free_local_checkpoint(scc.state)

    # distance / centrality sketches (HyperANF family): fixpoint is round
    # ~6 on this graph; h=4 already covers >99.9% of reachable pairs and
    # bounds the E*m-row register shuffle of the saturated rounds
    from duwamish_spark.algorithms import (
        effective_diameter,
        harmonic_centrality,
        neighborhood_function,
        random_walks,
    )

    t0 = time.monotonic()
    counts, anf_res = neighborhood_function(
        spark, edges, 4, m=16, num_partitions=cpus
    )
    sec = time.monotonic() - t0
    extra["anf_m16_h4"] = {
        "sec": round(sec, 3),
        "rounds": anf_res.supersteps,
        "pairs_h4": round(counts[-1]),
        "effective_diameter": round(effective_diameter(counts), 3),
    }
    free_local_checkpoint(anf_res.state)

    t0 = time.monotonic()
    n_walk_rows = random_walks(
        spark, edges, walk_length=5, walks_per_vertex=1
    ).count()
    extra["random_walks_l5"] = {
        "sec": round(time.monotonic() - t0, 3), "rows": n_walk_rows,
    }

    t0 = time.monotonic()
    hc = harmonic_centrality(spark, edges, 3, m=16, num_partitions=cpus)
    hc.count()
    extra["harmonic_h3"] = {"sec": round(time.monotonic() - t0, 3)}
    free_local_checkpoint(hc)

    from duwamish_spark.algorithms import closeness_centrality

    t0 = time.monotonic()
    cl = closeness_centrality(spark, edges, 3, m=16, num_partitions=cpus)
    cl.count()
    extra["closeness_h3"] = {"sec": round(time.monotonic() - t0, 3)}
    free_local_checkpoint(cl)

    t0 = time.monotonic()
    src_row = edges.limit(1).collect()
    if src_row:
        from duwamish_spark.algorithms.sssp import shortest_paths
        from pyspark.sql import functions as _F

        we = edges.withColumn("weight", _F.lit(1.0))
        sp = shortest_paths(
            spark, verts, we, source=src_row[0]["src"], num_partitions=cpus
        )
        reached = sp.last.get("reached")
        queries["sssp_converged"] = round(time.monotonic() - t0, 3)
        extra["sssp"] = {"rounds": sp.supersteps, "reached": reached}

    # neighborhood-structure ops on a sparser deg-15 graph of the same
    # vertex count: wedge-bounded workloads (the deg-127 graph's ~250 avg
    # sym degree means ~6G wedges — the regime the max_center_degree
    # guard exists for, not a sane default benchmark)
    from duwamish_spark.algorithms import (
        clustering_coefficient,
        k_truss,
        link_prediction,
    )

    spath, _ = edges_parquet(spark, n_files, 15)
    sedges = spark.read.parquet(spath)
    t0 = time.monotonic()
    clustering_coefficient(sedges).count()
    extra["clustering_coefficient_d15"] = {
        "sec": round(time.monotonic() - t0, 3)
    }
    t0 = time.monotonic()
    n_lp_pairs = link_prediction(sedges, k=5, min_common=2).count()
    extra["link_pred_top5_d15"] = {
        "sec": round(time.monotonic() - t0, 3), "pairs": n_lp_pairs,
    }
    t0 = time.monotonic()
    kt = k_truss(spark, sedges, 4)
    extra["ktruss_k4_d15"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": kt.supersteps,
        "edges": kt.state.count(),
    }
    free_local_checkpoint(kt.state)

    # round-3 session-3 additions (detail-only): spanning forest,
    # densest-subgraph peel, scalar graph stats — all on the main
    # deg-127 graph (they are E-bounded per round, no wedge blowup)
    from duwamish_spark.algorithms import (
        degree_assortativity,
        densest_subgraph,
        minimum_spanning_forest,
        reciprocity,
    )

    t0 = time.monotonic()
    msf = minimum_spanning_forest(spark, edges, num_partitions=cpus)
    extra["msf_boruvka"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": msf.rounds,
        "forest_edges": msf.forest.count(),
        "halted": msf.halted,
    }
    msf.free()

    t0 = time.monotonic()
    dsg = densest_subgraph(
        spark, edges, epsilon=0.125, max_rounds=30, num_partitions=cpus
    )
    extra["densest_peel"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": dsg.supersteps,
        "best_density": round(dsg.last.get("best_density", 0.0), 3),
        "best_round": dsg.last.get("best_round"),
        "subgraph_vertices": dsg.state.count(),
    }
    free_local_checkpoint(dsg.state)

    t0 = time.monotonic()
    rrow = reciprocity(edges).collect()[0]
    arow = degree_assortativity(edges).collect()[0]
    extra["graph_stats"] = {
        "sec": round(time.monotonic() - t0, 3),
        "reciprocity": rrow["reciprocity"],
        "assortativity": arow["assortativity"],
    }

    from duwamish_spark.algorithms import maximal_independent_set

    t0 = time.monotonic()
    mis = maximal_independent_set(spark, verts, edges, num_partitions=cpus)
    n_mis = mis.state.where(F.col("in_mis")).count()
    extra["luby_mis"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": mis.supersteps,
        "mis_size": n_mis,
        "halted": mis.halted,
    }
    free_local_checkpoint(mis.state)

    # round-3 session-4 additions: squares + cocitation live on the d15
    # graph (wedge/pivot-pair budgets — PLANS.md §session-4), layering on
    # the main deg-127 graph (E-bounded per round like SSSP)
    from duwamish_spark.algorithms import cocitation, square_count, topological_depth

    t0 = time.monotonic()
    sq = square_count(sedges).collect()[0]
    extra["square_count_d15"] = {
        "sec": round(time.monotonic() - t0, 3),
        "wedge_pairs": sq["wedge_pairs"],
        "squares": sq["squares"],
    }

    t0 = time.monotonic()
    n_cc_pairs = cocitation(sedges, k=5).count()
    extra["cocitation_top5_d15"] = {
        "sec": round(time.monotonic() - t0, 3), "rows": n_cc_pairs,
    }

    t0 = time.monotonic()
    topo = topological_depth(
        spark, verts, edges, max_supersteps=20, num_partitions=cpus
    )
    extra["topo_depth"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": topo.supersteps,
        "halted": topo.halted,
        "max_depth": topo.last.get("max_depth"),
    }
    free_local_checkpoint(topo.state)

    # round-4 session-7 additions (detail-only): cohesion decomposition,
    # micro-structure census and WL roles on the d15 graph (triangle/
    # wedge-bounded workloads); seeded LP / sampling / rich-club on the
    # main deg-127 graph (E-bounded per round)
    from duwamish_spark.algorithms import (
        percolation_sample,
        rich_club,
        seeded_label_propagation,
        triad_census,
        trussness,
        wl_signatures,
    )

    t0 = time.monotonic()
    tn = trussness(spark, sedges)
    tmax = tn.state.agg(F.max("trussness")).collect()[0][0]
    extra["trussness_d15"] = {
        "sec": round(time.monotonic() - t0, 3),
        "rounds": tn.supersteps,
        "halted": tn.halted,
        "max_truss": tmax,
    }
    free_local_checkpoint(tn.state)

    t0 = time.monotonic()
    # census vertex set must come from the d15 graph itself (ids isolated
    # at deg 15 would inflate the closed-form 003/012/102 classes if the
    # deg-127 graph's frame were reused — r4 ADVICE; SF=1 block already
    # does this with v15)
    tc_rows = {
        r["triad"]: int(r["count"])
        for r in triad_census(spark, vertices_from(None, sedges), sedges).collect()
    }
    extra["triad_census_d15"] = {
        "sec": round(time.monotonic() - t0, 3),
        "030T": tc_rows.get("030T", 0),
        "030C": tc_rows.get("030C", 0),
        "300": tc_rows.get("300", 0),
    }

    t0 = time.monotonic()
    wl = wl_signatures(spark, verts, edges, rounds=3)
    extra["wl_roles_r3"] = {
        "sec": round(time.monotonic() - t0, 3),
        "colors": wl.metrics[-1]["colors"] if wl.metrics else None,
    }
    free_local_checkpoint(wl.state)

    t0 = time.monotonic()
    slp = seeded_label_propagation(
        spark, verts, edges,
        verts.where(F.col("id") % 100 == 0).select(
            "id", (F.col("id") % 11).alias("label")
        ),
        max_supersteps=5, num_partitions=cpus,
    )
    extra["seeded_lp_5"] = {
        "sec": round(time.monotonic() - t0, 3),
        "labeled": slp.last.get("labeled"),
    }
    free_local_checkpoint(slp.state)

    t0 = time.monotonic()
    ps = percolation_sample(
        spark, edges, verts.where(F.col("id") % 1000 == 0), p_ppm=300_000
    )
    extra["percolation_sample_p03"] = {
        "sec": round(time.monotonic() - t0, 3),
        "sampled": ps.state.count(),
        "rounds": ps.supersteps,
    }
    free_local_checkpoint(ps.state)

    t0 = time.monotonic()
    rc = rich_club(edges).collect()
    extra["rich_club"] = {
        "sec": round(time.monotonic() - t0, 3),
        "thresholds": len(rc),
    }

    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        docs = spark.read.parquet(docs_path)
        t0 = time.monotonic()
        minhash_near_dups(docs, threshold=0.5).count()
        queries["minhash_near_dups"] = round(time.monotonic() - t0, 3)

        from duwamish_spark.functions import simhash_near_dups

        t0 = time.monotonic()
        n_sh = simhash_near_dups(docs, max_hamming=3).count()
        extra["simhash_near_dups"] = {
            "sec": round(time.monotonic() - t0, 3), "pairs": n_sh,
        }

        from duwamish_spark.functions import chunk_documents, mix_sources

        t0 = time.monotonic()
        n_chunks = chunk_documents(docs, chunk_tokens=64, overlap=16).count()
        extra["chunk_documents"] = {
            "sec": round(time.monotonic() - t0, 3), "chunks": n_chunks,
        }

        t0 = time.monotonic()
        n_mixed = mix_sources(
            docs, "doc_id", "source",
            {"src0": 0, "src1": 250_000}, default_ppm=600_000,
        ).count()
        extra["mix_sources"] = {
            "sec": round(time.monotonic() - t0, 3), "kept": n_mixed,
        }

        # training-pipeline text ops added round-3 session-3 (detail-only)
        from duwamish_spark.functions import (
            benchmark_contamination,
            hash_split,
            stratified_sample,
            tfidf_top_terms,
        )

        t0 = time.monotonic()
        n_tfidf = tfidf_top_terms(docs, 3).count()
        extra["tfidf_top3"] = {
            "sec": round(time.monotonic() - t0, 3), "rows": n_tfidf,
        }

        t0 = time.monotonic()
        bench_slice = docs.where(F.col("doc_id") % 20 == 0)
        train_slice = docs.where(F.col("doc_id") % 20 != 0)
        n_contam = benchmark_contamination(train_slice, bench_slice, k=3).count()
        extra["contamination"] = {
            "sec": round(time.monotonic() - t0, 3), "flagged": n_contam,
        }

        t0 = time.monotonic()
        n_train = (
            hash_split(docs, "doc_id").where(F.col("split") == "train").count()
        )
        n_sampled = stratified_sample(
            docs, "doc_id", "lang", {"en": 0.8}, default_fraction=0.25
        ).count()
        extra["split_sample"] = {
            "sec": round(time.monotonic() - t0, 3),
            "train_rows": n_train,
            "sampled_rows": n_sampled,
        }

        from duwamish_spark.functions import decode_media, frame_sample, synth_media

        t0 = time.monotonic()
        media = synth_media(docs)
        n_feats = decode_media(media).count()
        n_frames = frame_sample(media, every_k=2).count()
        queries["media_pipeline"] = round(time.monotonic() - t0, 3)
        extra["media"] = {"decoded": n_feats, "frames_sampled": n_frames}

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)
        # single-table config: comparable round-over-round (round 1 shape);
        # the operator's actual default (multi-table, 8x recall) is timed
        # in detail so the headline total stays an apples-to-apples series
        t0 = time.monotonic()
        knn_cosine_lsh(emb, k=3, n_planes=8, n_tables=1).count()
        queries["knn_cosine_lsh"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        knn_cosine_lsh(emb, k=3, n_planes=8, n_tables=8).count()
        extra["knn_lsh_mt8_sec"] = round(time.monotonic() - t0, 3)

        # quality gate for the approximate scale path: LSH top-k recall +
        # candidate fraction vs the exact top-k on a bounded sample (the
        # exact side is O(n^2)). This corpus's top-3 neighbors sit at
        # cosine 0.25-0.51 (weak structure), the hard regime for LSH —
        # multi-table is what keeps recall non-degenerate there.
        from duwamish_spark.functions.similarity import knn_lsh_recall

        sample = emb.limit(1500).persist()
        sample.count()
        extra["knn_lsh_recall_n1500"] = {
            # "default" IS the operator default since round 4 (6x16 —
            # the measured-quality point); "fast" is the old 8x8 default,
            # kept as the cheap-knob reference series
            "default": knn_lsh_recall(sample, k=3, n_planes=6, n_tables=16),
            "fast": knn_lsh_recall(sample, k=3, n_planes=8, n_tables=8),
        }

        # IVF (k-means bucketed) — the other ANN scale path. Config tuned
        # round 3 to the >=0.8-recall-at-<=25%-candidates gate on these
        # deliberately hard weakly-clustered embeddings: finer quantization
        # (160 centroids, 40 probes, 3 Lloyd iterations) buys recall at the
        # SAME scanned fraction (measured, not nominal: cluster imbalance
        # is included in candidate_fraction).
        from duwamish_spark.functions.similarity import knn_ivf_recall

        t0 = time.monotonic()
        extra["knn_ivf_recall_n1500"] = {
            **knn_ivf_recall(
                sample, k=3, n_centroids=160, n_probe=40, iters=3
            ),
            "sec": round(time.monotonic() - t0, 3),
        }

        # PCA whitening (functions/whiten.py) measured honestly, both ways:
        # (a) on THIS corpus whitening is recall-NEUTRAL — the synthetic
        # embeddings are near-isotropic (eig ratio ~4), so whitened-bucket
        # LSH measures within noise of raw (0.608 vs 0.622 at 6x16); we
        # record the eig ratio as the "would whitening help" diagnostic.
        # (b) the regime whitening exists for — anisotropic rogue-dimension
        # corruption (the transformer-embedding pathology): planted twin
        # pairs + shared high-variance noise, where raw cosine recovers
        # ~3% of planted neighbors and whitened recovers ~100%.
        from duwamish_spark.functions import (
            pca_whitening_model,
            whiten_embeddings,
        )
        from duwamish_spark.functions.similarity import knn_cosine_lsh as _lsh

        import numpy as np

        t0 = time.monotonic()
        wm = pca_whitening_model(spark, sample)
        eig_ratio = float(wm.eigvals[-1] / wm.eigvals[0])

        rng = np.random.default_rng(7)
        n_pairs, dd, rr = 750, 64, 4
        sig = rng.standard_normal((n_pairs, dd))
        twin = sig + 0.35 * rng.standard_normal((n_pairs, dd))
        xx = np.vstack([sig, twin])
        basis = np.linalg.qr(rng.standard_normal((dd, rr)))[0]
        xx = xx + (rng.standard_normal((2 * n_pairs, rr)) * 12.0) @ basis.T
        planted = spark.createDataFrame(
            [(i, [float(v) for v in xx[i]]) for i in range(2 * n_pairs)],
            "vec_id long, embedding array<float>",
        )
        pm = pca_whitening_model(spark, planted)
        pw = whiten_embeddings(planted, pm, out_col="_white").persist()
        pw.count()

        def _twin_rate(vec_col):
            top1 = _lsh(pw, 1, 6, 11, "vec_id", vec_col, 64, 16)
            hits = sum(
                1
                for r in top1.collect()
                if r["knn_rank"] == 1
                and r["neighbor_id"] == (r["vec_id"] + n_pairs) % (2 * n_pairs)
            )
            return round(hits / (2 * n_pairs), 4)

        extra["whiten"] = {
            "corpus_eig_ratio": round(eig_ratio, 2),
            "corpus_note": "near-isotropic -> whitening recall-neutral here",
            "planted_eig_ratio": round(float(pm.eigvals[-1] / pm.eigvals[0]), 1),
            "twin_recovery_lsh_raw": _twin_rate("embedding"),
            "twin_recovery_lsh_whitened": _twin_rate("_white"),
            "sec": round(time.monotonic() - t0, 3),
        }
        pw.unpersist()
        sample.unpersist()

    verts.unpersist()

    # detail-only (not in the headline total, which stays an apples-to-
    # apples series across rounds): the reference's published SGD rows
    rec_mode = os.environ.get("DUWAMISH_BENCH_REC", "1")
    if rec_mode != "0":
        bench_recommendations(spark, extra, stretch=(rec_mode == "2"))

    sf1_mode = os.environ.get("DUWAMISH_BENCH_SF1", "")
    sf1_cache = os.path.exists(
        os.path.join(CACHE, "edges_n1000000_d127_s42.parquet")
    )
    sf1_block = None
    if sf1_mode == "1" or (sf1_mode != "0" and sf1_cache):
        sf1_block = _run_block_subprocess("sf1")

    sf10_mode = os.environ.get("DUWAMISH_BENCH_SF10", "")
    sf10_cache = os.path.exists(
        os.path.join(CACHE, "edges_n10000000_d127_s42.parquet")
    )
    sf10_block = None
    if sf10_mode == "1" or (sf10_mode != "0" and sf10_cache):
        sf10_block = _run_block_subprocess("sf10")

    out = {
        "metric": "wall seconds per headline query (pagerank to L1<1e-6 convergence)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "graph": {"files": n_files, "max_out_degree": deg, "edges": n_edges},
        "detail": extra,
    }
    if sf1_block is not None:
        out["sf1"] = sf1_block
    if sf10_block is not None:
        out["sf10"] = sf10_block
    # north-rule scaling criterion: surface the latest dedicated
    # two-parallelism measurement (scaling_bench.py writes it; re-run
    # with the machine idle to refresh) so the bench artifact is
    # self-contained on the N-vs-4N gate
    scaling_path = os.path.join(REPO, "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        try:
            with open(scaling_path) as f:
                sc = json.load(f)
            low, high = sc.get("low", {}), sc.get("high", {})
            out["scaling"] = {
                "low_cpus": low.get("cpus"),
                "high_cpus": high.get("cpus"),
                "low_edges_per_sec": low.get("edges_per_sec"),
                "high_edges_per_sec": high.get("edges_per_sec"),
                "scaling_factor": sc.get("scaling_factor"),
                "scaling_efficiency": sc.get("scaling_efficiency"),
                "gate_ge_0_8": sc.get("gate"),
                "cpu_probe_ops_per_sec_M": sc.get("cpu_probe", {}).get(
                    "ops_per_sec_M"
                ),
                "source": "BENCH/scaling.json (scaling_bench.py, machine idle)",
            }
        except (json.JSONDecodeError, OSError):
            pass
    # Stop Spark BEFORE emitting the result so no JVM output can trail or
    # interleave with it, then print the JSON as the sole final line
    # (leading newline flushes any partial progress line). The driver
    # parses the tail of captured stdout — round 3's artifact had
    # "parsed": null because progress noise truncated this line.
    spark.stop()
    sys.stdout.write("\n" + json.dumps(out) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
