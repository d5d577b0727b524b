"""Checkpoint-resume: a resumed run equals the one-shot run exactly."""

from __future__ import annotations

import json
import os
import shutil

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.plans.checkpoint import run_checkpointed


def test_resume_after_partial_run(spark, tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("ckpt"))
    pages = synth.synthesize_pages(spark, 8)

    t1 = run_checkpointed(spark, pages, workdir)
    rows1 = sorted(tuple(r) for r in t1.collect())

    # simulate a crash after the resolve stage: drop later stage outputs
    for stage in ("graph_rows", "triples"):
        shutil.rmtree(os.path.join(workdir, stage), ignore_errors=True)
        m = os.path.join(workdir, "_lineage", f"{stage}.json")
        if os.path.exists(m):
            os.remove(m)

    t2 = run_checkpointed(spark, pages, workdir)
    rows2 = sorted(tuple(r) for r in t2.collect())
    assert rows1 == rows2

    # manifests present and consistent
    with open(os.path.join(workdir, "_lineage", "nodes.json")) as f:
        manifest = json.load(f)
    assert manifest["rows"] > 0
    assert manifest["partitions"]
