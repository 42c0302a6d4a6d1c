"""Deployability: the --py-files zip must be a complete, self-contained
import source for `duwamish_spark` (what cluster executors' Python
workers see; north rule: run via spark-submit --py-files)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import package as packager

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_contains_every_module(tmp_path):
    out = packager.build(str(tmp_path / "duwamish_spark.zip"))
    with zipfile.ZipFile(out) as z:
        zipped = {n for n in z.namelist() if n.endswith(".py")}
    on_disk = set()
    for root, dirs, files in os.walk(os.path.join(REPO, "duwamish_spark")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                on_disk.add(os.path.relpath(os.path.join(root, f), REPO))
    assert zipped == on_disk and zipped, "zip and source tree diverge"


def test_zip_imports_standalone(tmp_path):
    # import from the zip alone, cwd outside the repo — the executor's view
    out = packager.build(str(tmp_path / "duwamish_spark.zip"))
    code = (
        "import duwamish_spark, duwamish_spark.pregel, "
        "duwamish_spark.algorithms, duwamish_spark.functions, "
        "duwamish_spark.streaming, duwamish_spark.sources, sys; "
        "assert 'duwamish_spark.zip' in duwamish_spark.__file__, "
        "duwamish_spark.__file__; print('ok')"
    )
    env = dict(os.environ, PYTHONPATH=out)
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "ok"
