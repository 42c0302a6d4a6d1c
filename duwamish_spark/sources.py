"""Corpus table sources.

The deployment target is an Iceberg table of source-code repositories
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint). In
this sandbox no Iceberg runtime jar is present, so parquet directories
stand in; the DataFrame surface downstream (parse.extract_edges and
everything after) is identical — the source is a one-line config switch.

At 10^12-file scale the things that matter at the scan:

- **column pruning**: the parser selects only (repo, path, lang, content);
  commit and any metadata columns never leave the scan (ReadSchema in
  `.explain("formatted")` confirms).
- **partition/file pruning**: pass ``predicate`` (e.g. ``lang IN
  ('python','java')`` or a repo prefix) — it reaches the scan as a pushed
  filter on parquet and as partition/file pruning on Iceberg's metadata
  tree.
- **split sizing**: ``spark.sql.files.maxPartitionBytes`` governs scan
  parallelism for parquet; Iceberg splits on its own file/row-group
  metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def load_corpus(
    spark: SparkSession,
    location: str,
    source_format: str = "parquet",
    predicate: str | None = None,
) -> DataFrame:
    """Load the source-code corpus table from parquet or Iceberg.

    ``location``: a parquet directory/file, or an Iceberg table identifier
    (``catalog.db.table``) when ``source_format="iceberg"``.
    """
    if source_format == "iceberg":
        df = spark.read.format("iceberg").load(location)
    elif source_format == "parquet":
        df = spark.read.parquet(location)
    else:
        raise ValueError(f"unknown corpus source format: {source_format!r}")
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus table at {location} missing columns: {missing}")
    if predicate:
        df = df.where(predicate)
    return df


def write_edges(edges: DataFrame, location: str, source_format: str = "parquet") -> None:
    """Persist an extracted edge table (the parse stage's sink)."""
    w = edges.write.mode("overwrite")
    if source_format == "iceberg":
        w.format("iceberg").save(location)
    else:
        w.parquet(location)
