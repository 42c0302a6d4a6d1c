"""Deterministic source-code corpus synthesizer (FIXTURES.md F1).

Stands in for the Iceberg source-code table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). Everything is derived from a fixed
seed via NumPy PCG64 — no wall clock, no external data.

Graph shape intentionally mirrors the reference's benchmark generator
(reference: example/PageRank.java:113-122): out-degree ~ uniform{0..D},
uniform random targets, **duplicates and self-references allowed** — both
are semantically significant (each duplicate edge sends a duplicate
message; reference: example/PageRank.java:58-63).

Import-line syntax per lang (what parse.py must recognize):

- python: ``import pkgK.modJ`` / ``from pkgK.modJ import x``  (same repo)
- java:   ``import pkgK.modJ;``                               (same repo)
- c:      ``#include "pkgK/modJ.h"``                          (same repo)
- go:     ``import "repoN/pkgK/modJ"``                        (cross-repo)

Vertex id convention everywhere: ``repo + "/" + path``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

LANGS = np.array(["python", "java", "c", "go"])
LANG_WEIGHTS = np.array([4.0, 2.0, 1.0, 1.0]) / 8.0
EXT = {"python": "py", "java": "java", "c": "h", "go": "go"}

FILLER = (
    "the quick brown fox jumps over the lazy dog while the engine "
    "shuffles messages between partitions"
)


def synth_corpus(
    n_files: int, max_out_degree: int = 15, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return ``(corpus, edges_truth)`` pandas frames.

    ``corpus``:      repo, path, commit, lang, content
    ``edges_truth``: src, dst   (ground truth the parser must reproduce,
                                 duplicates preserved, row order not significant)
    """
    rng = np.random.default_rng(seed)
    n = int(n_files)
    n_repos = max(2, n // 64)

    file_idx = np.arange(n)
    repo_idx = file_idx % n_repos
    ordinal = file_idx // n_repos  # per-repo ordinal (unique within repo)
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_WEIGHTS)
    lang = LANGS[lang_idx]

    pkg = ordinal // 16
    ext = np.array([EXT[l] for l in LANGS])[lang_idx]
    repo = pd.array([f"repo{r}" for r in repo_idx], dtype="str")
    path = pd.Series(
        ["pkg" + p + "/mod" + o + "." + e
         for p, o, e in zip(pkg.astype(str), ordinal.astype(str), ext)],
        dtype="str",
    )
    commit = pd.Series(
        ["".join(f"{b:02x}" for b in row) for row in rng.integers(0, 256, size=(n, 20))],
        dtype="str",
    )
    file_id = (pd.Series(repo, dtype="str") + "/" + path).to_numpy()

    # --- target pools: same (repo, lang) for python/java/c; global lang pool for go
    # sort files so each pool is a contiguous index range
    is_go = lang == "go"
    pool_key_repo = np.where(is_go, -1, repo_idx)  # go pools ignore repo
    order = np.lexsort((file_idx, lang_idx, pool_key_repo))
    sorted_repo = pool_key_repo[order]
    sorted_lang = lang_idx[order]
    # pool id per sorted position
    pool_change = np.ones(n, dtype=bool)
    pool_change[1:] = (sorted_repo[1:] != sorted_repo[:-1]) | (
        sorted_lang[1:] != sorted_lang[:-1]
    )
    pool_id_sorted = np.cumsum(pool_change) - 1
    n_pools = pool_id_sorted[-1] + 1 if n else 0
    pool_start = np.zeros(n_pools, dtype=np.int64)
    pool_start[pool_id_sorted[pool_change]] = np.nonzero(pool_change)[0]
    pool_size = np.diff(np.append(pool_start, n))
    # pool id per original file index
    pool_of_file = np.empty(n, dtype=np.int64)
    pool_of_file[order] = pool_id_sorted

    out_deg = rng.integers(0, max_out_degree + 1, size=n)
    # a pool of size 1 would only ever self-reference; allow it (self-loops legal)
    src_edge = np.repeat(file_idx, out_deg)
    pool_edge = pool_of_file[src_edge]
    u = rng.random(len(src_edge))
    tgt_sorted_pos = pool_start[pool_edge] + (u * pool_size[pool_edge]).astype(np.int64)
    tgt = order[tgt_sorted_pos]

    # --- render import lines: one pass of f-strings over python lists.
    # (Was vectorized pandas object-dtype concat — value-identical, but
    # each op materialized a full 63M-row temporary; at n=1e6 the
    # process's own multi-GB allocation churn degrades the sandbox's
    # allocator ~25x and generation never finishes. The list pass does
    # one allocation per line and caps peak RSS ~3x lower.)
    E = len(src_edge)
    tgt_pkg_l = pkg[tgt].tolist()
    tgt_ord_l = ordinal[tgt].tolist()
    tgt_repo_l = repo_idx[tgt].tolist()
    src_lang_l = lang_idx[src_edge].tolist()  # 0=python 1=java 2=c 3=go
    lines: list = [None] * E
    for i in range(E):
        li = src_lang_l[i]
        p = tgt_pkg_l[i]
        o = tgt_ord_l[i]
        if li == 0:
            if i % 2:
                lines[i] = f"from pkg{p}.mod{o} import handler"
            else:
                lines[i] = f"import pkg{p}.mod{o}"
        elif li == 1:
            lines[i] = f"import pkg{p}.mod{o};"
        elif li == 2:
            lines[i] = f'#include "pkg{p}/mod{o}.h"'
        else:
            lines[i] = f'import "repo{tgt_repo_l[i]}/pkg{p}/mod{o}"'
    del tgt_pkg_l, tgt_ord_l, tgt_repo_l, src_lang_l

    # ground-truth resolved edge ids
    dst_id = file_id[tgt]
    edges_truth = pd.DataFrame({"src": file_id[src_edge], "dst": dst_id})

    # --- assemble content: header + imports + decoys + filler.
    # src_edge = repeat(arange, out_deg) is sorted, so each file's lines
    # are the contiguous slice at its out_deg offset.
    out_deg_l = out_deg.tolist()
    path_l = path.tolist()
    lang_idx_l = lang_idx.tolist()
    content: list = [None] * n
    pos = 0
    for f in range(n):
        d = out_deg_l[f]
        block = "\n".join(lines[pos : pos + d]) if d else ""
        pos += d
        pth = path_l[f]
        dec = (
            "# import decoy.not_a_real_edge"
            if lang_idx_l[f] == 0
            else "  // import decoy.not_a_real_edge"
        )
        content[f] = f"// module {pth}\n{dec}\n{block}\n{FILLER} :: {pth}"
    del lines

    corpus = pd.DataFrame(
        {
            "repo": [f"repo{r}" for r in repo_idx.tolist()],
            "path": path_l,
            "commit": list(commit),
            "lang": lang.tolist(),
            "content": content,
        }
    )
    return corpus, edges_truth


def corpus_path(cache_dir: str, n_files: int, max_out_degree: int, seed: int) -> str:
    return os.path.join(cache_dir, f"corpus_n{n_files}_d{max_out_degree}_s{seed}.parquet")


def corpus_df(
    spark,
    n_files: int,
    max_out_degree: int = 15,
    seed: int = 42,
    cache_dir: str | None = None,
):
    """Corpus as a Spark DataFrame; optionally cached to parquet on disk.

    The parquet cache is the local stand-in for the Iceberg table
    (``spark.read.format("iceberg")`` is a one-line switch at deploy time).
    """
    if cache_dir:
        p = corpus_path(cache_dir, n_files, max_out_degree, seed)
        if not os.path.exists(p):
            os.makedirs(cache_dir, exist_ok=True)
            corpus, _ = synth_corpus(n_files, max_out_degree, seed)
            tmp = p + ".tmp"
            corpus.to_parquet(tmp, index=False)
            os.replace(tmp, p)
        return spark.read.parquet(p)
    corpus, _ = synth_corpus(n_files, max_out_degree, seed)
    return spark.createDataFrame(corpus)
