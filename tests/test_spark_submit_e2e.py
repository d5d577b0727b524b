"""End-to-end check of the north rule's literal invocation path:

    spark-submit --py-files dist/irkg.zip scripts/submit.py synth/run

The package ships ONLY via the --py-files zip (cwd is a scratch dir, so
nothing resolves against the repo checkout by accident), the application
script is scripts/submit.py, and each step runs in a fresh JVM exactly as
it would under a cluster manager.  Complements test_submit_zip.py (which
checks zip importability in-process) by actually executing the two-step
pipeline and cross-checking the emitted lineage manifests with the
no-Spark `metrics` CLI.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH")


def _submit(zip_path, workdir, *args):
    cmd = [SPARK_SUBMIT, "--master", "local[8]",
           "--driver-memory", "4g",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zip_path,
           os.path.join(REPO, "scripts", "submit.py"), *args]
    out = subprocess.run(cmd, cwd=workdir, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-4000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_spark_submit_synth_run_metrics(tmp_path):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_submit_zip", os.path.join(REPO, "scripts",
                                        "make_submit_zip.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    zip_path = str(tmp_path / "irkg.zip")
    assert mod.build(zip_path) > 0

    pages = str(tmp_path / "pages")
    kg = str(tmp_path / "kg")
    r = _submit(zip_path, str(tmp_path), "synth", "--out", pages,
                "--n", "120")
    assert r == {"written": pages, "n": 120}

    r = _submit(zip_path, str(tmp_path), "run", "--pages", pages,
                "--workdir", kg)
    assert r["triples"] > 0
    assert r["manifests"]["triples"] == r["triples"]
    assert set(r["manifests"]) >= {"nodes", "qualifiers", "resolved",
                                   "triples"}

    # the lineage metrics surface needs no Spark session at all
    out = subprocess.run(
        [sys.executable, "-m", "inclusionreferenceskg_spark.cli",
         "metrics", "--workdir", kg, "--stage", "triples"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout)
    assert m["triples"]["rows"] == r["triples"]
    assert sum(p["rows"] for p in m["triples"]["partitions"]) == r["triples"]
