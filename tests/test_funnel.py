"""Materialized curation funnel (plans/funnel.py): stage commit, resume,
and the scanning-not-recomputing property the production design requires.
"""

from __future__ import annotations

import os
import shutil

import pytest

from inclusionreferenceskg_spark import queries
from inclusionreferenceskg_spark.plans import funnel
from inclusionreferenceskg_spark.sources.catalog import Catalog

SF_DIR = "/root/testdata/sf0.001"
STAGES = ("lang", "quality", "exact_keep", "neardup_clusters")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("funnel"))


@pytest.fixture(scope="module")
def staged(spark, workdir):
    return funnel.run_curation_funnel(spark, SF_DIR, workdir=workdir)


def test_staged_equals_inline(spark, staged):
    inline = queries.corpus_curated(spark, SF_DIR)
    assert sorted(map(tuple, staged.collect())) \
        == sorted(map(tuple, inline.collect()))


def test_all_stage_manifests_committed(spark, staged, workdir):
    staged.collect()
    cat = Catalog(workdir)
    for s in STAGES:
        assert cat.is_complete(s), s
        m = cat.manifest(s)
        assert m["rows"] >= 0 and m["checksum"], s


def test_final_plan_scans_stages_not_recomputes(spark, staged, workdir):
    plan = staged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # the stage tables are read back from the workdir...
    assert workdir in plan
    # ...and none of the expensive machinery appears in the plan: no
    # shingle explode (minhash/LSH), no regexp scoring, no CC iteration
    for marker in ("explode", "regexp_extract_all", "Generate"):
        assert marker not in plan, marker


def test_resume_skips_rebuild(spark, workdir):
    # second run against the same workdir: stage mtimes must not change
    # (is_complete short-circuits) and rows stay identical
    mtimes = {s: os.path.getmtime(
        os.path.join(workdir, "_lineage", f"{s}.json")) for s in STAGES}
    again = funnel.run_curation_funnel(spark, SF_DIR, workdir=workdir)
    rows = again.count()
    for s in STAGES:
        assert os.path.getmtime(
            os.path.join(workdir, "_lineage", f"{s}.json")) == mtimes[s], s
    assert rows == queries.corpus_curated(spark, SF_DIR).count()


def test_fingerprint_changes_with_data(tmp_path):
    # regenerated parquet under an sf_dir -> different fingerprint ->
    # fresh workdir (stale stage tables can never be served)
    src = os.path.join(SF_DIR, "documents.parquet")
    dst_dir = str(tmp_path / "sfX")
    os.makedirs(dst_dir)
    dst = os.path.join(dst_dir, "documents.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    w1 = funnel.funnel_workdir(dst_dir)
    # touch the data -> new mtime -> new fingerprint
    target = (os.path.join(dst, sorted(os.listdir(dst))[0])
              if os.path.isdir(dst) else dst)
    os.utime(target, None)
    w2 = funnel.funnel_workdir(dst_dir)
    assert w1 != w2
