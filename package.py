"""Build the --py-files artifact for cluster submission.

Usage:
    python package.py                # writes dist/duwamish_spark.zip
    spark-submit --py-files dist/duwamish_spark.zip your_job.py

The package is pure Python (no native deps beyond the cluster's own
pyspark/pandas/numpy), so a single zip is the whole deployment. Cluster
executors import `duwamish_spark` by name inside mapInPandas workers —
the zip on --py-files is what makes that resolve (locally the repo root
on PYTHONPATH plays that role; see .claude/skills/verify).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "duwamish_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "duwamish_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
