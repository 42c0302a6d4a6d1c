"""Corpus → edge-table extraction (the engine's "scan" stage).

The reference loads graphs programmatically one record at a time
(reference: Duwamish.java:144-150 addVertex/addEdge). Here the graph is
*derived* from the source-code corpus: a vectorized pandas UDF
(``mapInPandas``, Arrow-batched — never per-row Python, per BASELINE.json
input_hint) regex-extracts import/include references per language and
resolves them to file ids ``repo/path``.

Invariant (BASELINE.json input_hint): ``content`` passes through the engine
byte-identical — checked via the sha256 manifest (:func:`sha256_manifest`)
before/after the parse stage.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Anchored, line-oriented reference patterns per language (corpus.py syntax).
_PY = re.compile(r"^(?:import|from)\s+([\w.]+)", re.M)
_JAVA = re.compile(r"^import\s+([\w.]+)\s*;", re.M)
_C = re.compile(r'^#include\s+"([^"]+)"', re.M)
_GO = re.compile(r'^import\s+"([^"]+)"', re.M)

EDGE_SCHEMA = "src string, dst string"


def _resolve_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch of (repo, path, lang, content) → (src, dst) rows.

    All heavy lifting is pandas ``str.extractall`` (vectorized over the
    batch); no per-row Python function calls.
    """
    out_src: list[pd.Series] = []
    out_dst: list[pd.Series] = []
    src_id = pdf["repo"] + "/" + pdf["path"]

    def _extract(mask: pd.Series, pattern: re.Pattern, to_dst) -> None:
        if not mask.any():
            return
        sub = pdf.loc[mask, "content"]
        hits = sub.str.extractall(pattern)[0]
        if hits.empty:
            return
        row_pos = hits.index.get_level_values(0)
        out_src.append(src_id.loc[row_pos].reset_index(drop=True))
        out_dst.append(to_dst(hits.reset_index(drop=True), row_pos))

    lang = pdf["lang"]

    def _dotted(ext: str):
        def conv(hits: pd.Series, row_pos) -> pd.Series:
            rel = hits.str.replace(".", "/", regex=False) + ext
            return pdf.loc[row_pos, "repo"].reset_index(drop=True) + "/" + rel
        return conv

    _extract(lang == "python", _PY, _dotted(".py"))
    _extract(lang == "java", _JAVA, _dotted(".java"))
    _extract(
        lang == "c",
        _C,
        lambda hits, row_pos: pdf.loc[row_pos, "repo"].reset_index(drop=True)
        + "/"
        + hits.reset_index(drop=True),
    )
    _extract(lang == "go", _GO, lambda hits, row_pos: hits + ".go")

    if not out_src:
        return pd.DataFrame({"src": pd.Series(dtype=object), "dst": pd.Series(dtype=object)})
    return pd.DataFrame(
        {"src": pd.concat(out_src, ignore_index=True), "dst": pd.concat(out_dst, ignore_index=True)}
    )


def extract_edges(corpus: DataFrame) -> DataFrame:
    """Corpus → directed edge table ``(src, dst)``.

    Duplicates and self-loops are preserved (each duplicate import sends a
    duplicate message downstream; reference: example/PageRank.java:58-63).
    Column pruning: only (repo, path, lang, content) are read — at Iceberg
    scale the commit/metadata columns never leave the scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resolve_batch(pdf)

    return corpus.select("repo", "path", "lang", "content").mapInPandas(
        run, schema=EDGE_SCHEMA
    )


def sha256_manifest(corpus: DataFrame) -> DataFrame:
    """Per-row content fingerprint ``(repo, path, commit, sha256)``.

    JVM-side (``F.sha2``) — the invariant check never moves content through
    Python.
    """
    return corpus.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("sha256")
    )
