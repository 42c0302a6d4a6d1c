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

    # --- render import lines (vectorized pandas string ops)
    tgt_pkg = pkg[tgt].astype(str)
    tgt_ord = ordinal[tgt].astype(str)
    tgt_repo = repo_idx[tgt].astype(str)
    src_lang = lang[src_edge]
    parity = (np.arange(len(src_edge)) % 2).astype(bool)

    mod_dotted = "pkg" + pd.Series(tgt_pkg) + ".mod" + pd.Series(tgt_ord)
    mod_slash = "pkg" + pd.Series(tgt_pkg) + "/mod" + pd.Series(tgt_ord)
    lines = pd.Series(np.empty(len(src_edge), dtype=object))
    m = src_lang == "python"
    lines[m & ~parity] = "import " + mod_dotted[m & ~parity]
    lines[m & parity] = "from " + mod_dotted[m & parity] + " import handler"
    m = src_lang == "java"
    lines[m] = "import " + mod_dotted[m] + ";"
    m = src_lang == "c"
    lines[m] = '#include "' + mod_slash[m] + '.h"'
    m = src_lang == "go"
    lines[m] = 'import "repo' + pd.Series(tgt_repo)[m] + "/" + mod_slash[m] + '"'

    # ground-truth resolved edge ids
    dst_id = file_id[tgt]
    edges_truth = pd.DataFrame({"src": file_id[src_edge], "dst": dst_id})

    # --- assemble content: header + imports + decoys + filler
    import_block = (
        lines.groupby(src_edge).agg("\n".join).reindex(file_idx).fillna("")
    )
    header = pd.Series(
        ["// module " + p for p in path], dtype="str"
    )
    decoy = pd.Series(
        np.where(
            lang == "python",
            "# import decoy.not_a_real_edge",
            "  // import decoy.not_a_real_edge",
        )
    )
    content = (
        header + "\n" + decoy + "\n" + import_block + "\n" + FILLER + " :: " + path
    )

    corpus = pd.DataFrame(
        {
            "repo": pd.Series(repo, dtype="str").astype(object),
            "path": path.astype(object),
            "commit": commit.astype(object),
            "lang": pd.Series(lang).astype(object),
            "content": content.astype(object),
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
