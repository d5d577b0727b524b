"""The --py-files archive must be complete: a fresh interpreter with ONLY
the zip on sys.path has to import every module spark-submit executors
need (catches missing subpackages / stray absolute imports)."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_make_submit_zip():
    # loaded by file path, NOT via sys.path.insert at module import —
    # a leaked scripts/ path entry could shadow same-named imports in
    # unrelated tests for the rest of the pytest session
    spec = importlib.util.spec_from_file_location(
        "make_submit_zip",
        os.path.join(REPO, "scripts", "make_submit_zip.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_zip_is_importable_standalone(tmp_path):
    make_submit_zip = _load_make_submit_zip()

    zip_path = str(tmp_path / "irkg.zip")
    n = make_submit_zip.build(zip_path)
    assert n > 20  # every package module, not a stub

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import inclusionreferenceskg_spark.queries as q\n"
        "import inclusionreferenceskg_spark.cli\n"
        "import inclusionreferenceskg_spark.plans.checkpoint\n"
        "import inclusionreferenceskg_spark.streaming.pipeline\n"
        "import inclusionreferenceskg_spark.functions.annotate\n"
        "assert len(q.QUERIES) >= 43 and len(q.ORACLES) >= 37\n"
        "print('ok', len(q.QUERIES))\n"
    )
    # -I: isolated mode — no repo cwd on sys.path, the zip is the only
    # source of the package (mirrors a bare executor)
    out = subprocess.run(
        [sys.executable, "-I", "-c", probe, zip_path],
        capture_output=True, text=True, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("ok")


def test_zip_build_is_reproducible(tmp_path):
    make_submit_zip = _load_make_submit_zip()

    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    make_submit_zip.build(z1)
    make_submit_zip.build(z2)
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()
