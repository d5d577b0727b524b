"""Iceberg-style table maintenance: compact (rewrite_data_files) shadows
small files into right-sized ones without changing the table or losing
history; expire_snapshots garbage-collects shadowed/expired files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from inclusionreferenceskg_spark.sources.catalog import (
    Catalog,
    _list_data_files,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [Row(url=f"https://ex.org/{i}", lang="en" if i % 2 else "de",
             n=i) for i in range(lo, hi)])


@pytest.fixture()
def appended(spark, tmp_path):
    """A table built from 1 bootstrap + 3 fast-appends (small-file debris,
    like a daily crawl delta landing on the triples table)."""
    cat = Catalog(str(tmp_path))
    cat.write("t", _mk(spark, 0, 40), partition_by=["lang"],
              bucket_url="url", n_buckets=4)
    for lo in (40, 80, 120):
        cat.write("t", _mk(spark, lo, lo + 40), partition_by=["lang"],
                  bucket_url="url", n_buckets=4, mode="append")
    return cat


def test_compact_preserves_table_and_history(spark, appended):
    cat = appended
    want = _rows(cat.read(spark, "t"))
    want_v2 = _rows(cat.read(spark, "t", version=2))
    files_before = len(cat._latest_files("t"))
    man_before = cat.manifest("t")

    stats = cat.compact(spark, "t")

    # one file per (lang, url_bucket) partition — 8 partitions here
    assert stats["files_after"] == 8
    assert stats["files_after"] < files_before
    assert len(cat._latest_files("t")) == stats["files_after"]
    # table contents byte-identical, manifest checksum/rows preserved
    assert _rows(cat.read(spark, "t")) == want
    man_after = cat.manifest("t")
    assert man_after["rows"] == man_before["rows"]
    assert man_after["checksum"] == man_before["checksum"]
    # history gained a version; replaced files shadowed, NOT deleted:
    # every earlier snapshot still time-travels
    hist = cat.history("t")
    assert [h["version"] for h in hist] == [1, 2, 3, 4, 5]
    assert _rows(cat.read(spark, "t", version=2)) == want_v2
    assert _rows(cat.read(spark, "t", version=4)) == want
    # shadowed files are still on disk awaiting expiry
    assert len(_list_data_files(cat.table_path("t"))) \
        == files_before + stats["files_after"]


def test_append_after_compact_is_metadata_resolved(spark, appended):
    """A fast-append after compaction must not double-read the shadowed
    files through a directory listing."""
    cat = appended
    cat.compact(spark, "t")
    cat.write("t", _mk(spark, 160, 200), partition_by=["lang"],
              bucket_url="url", n_buckets=4, mode="append")
    got = cat.read(spark, "t")
    assert got.count() == 200
    assert got.select("url").distinct().count() == 200
    assert sorted(r["n"] for r in got.collect()) == list(range(200))
    assert cat.manifest("t")["rows"] == 200


def test_expire_snapshots_vacuums_shadowed_files(spark, appended):
    cat = appended
    want = _rows(cat.read(spark, "t"))
    cat.compact(spark, "t")
    n_live = len(cat._latest_files("t"))
    stats = cat.expire_snapshots("t", keep_last=1)

    assert stats["expired_snapshots"] == 4
    assert stats["deleted_files"] > 0
    # on-disk footprint is now exactly the live snapshot
    assert len(_list_data_files(cat.table_path("t"))) == n_live
    # current read unchanged; expired versions are genuinely gone
    assert _rows(cat.read(spark, "t")) == want
    assert [h["version"] for h in cat.history("t")] == [5]
    with pytest.raises(Exception):
        cat.read(spark, "t", version=2).collect()


def test_compact_unpartitioned_table(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = _mk(spark, 0, 30).repartition(6)
    cat.write("u", df)
    cat.write("u", _mk(spark, 30, 60).repartition(6), mode="append")
    want = _rows(cat.read(spark, "u"))
    stats = cat.compact(spark, "u")
    assert stats["files_after"] == 1
    assert _rows(cat.read(spark, "u")) == want


def test_compact_respects_max_records_per_file(spark, appended):
    cat = appended
    want = _rows(cat.read(spark, "t"))
    per_part = [r["c"] for r in cat.read(spark, "t")
                .groupBy("lang", "url_bucket")
                .agg(F.count("*").alias("c")).collect()]
    stats = cat.compact(spark, "t", max_records_per_file=10)
    # bin-packed: ceil(rows/10) files per partition, not one giant file
    assert stats["files_after"] == sum(-(-c // 10) for c in per_part)
    assert _rows(cat.read(spark, "t")) == want


def test_compact_empty_table_is_noop(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df = _mk(spark, 0, 10).filter("n < 0")  # zero rows
    cat.write("z", df, partition_by=["lang"], bucket_url="url")
    stats = cat.compact(spark, "z")
    assert stats == {"stage": "z", "files_before": 0, "files_after": 0,
                     "rows": 0, "wall_ms": 0}


def test_orphan_files_invisible_and_vacuumed(spark, appended):
    """A writer that crashed between writing data files and committing a
    snapshot leaves orphans on disk.  Metadata-resolved reads must never
    see them, and expire_snapshots must vacuum them."""
    cat = appended
    want = _rows(cat.read(spark, "t"))
    # fake a crashed write: a valid parquet file inside a partition dir
    # that no snapshot references
    orphan_dir = os.path.join(cat.table_path("t"), "lang=en",
                              "url_bucket=0")
    _mk(spark, 900, 910).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(cat.root), "_tmp_orphan"))
    src = [f for f in _list_data_files(
        os.path.join(str(cat.root), "_tmp_orphan"))][0]
    orphan = os.path.join(orphan_dir, "orphan-crashed-writer.parquet")
    os.rename(src, orphan)

    spark.catalog.refreshByPath(cat.table_path("t"))
    assert _rows(cat.read(spark, "t")) == want  # orphan invisible
    stats = cat.expire_snapshots("t", keep_last=1)
    assert not os.path.exists(orphan)  # orphan vacuumed
    assert _rows(cat.read(spark, "t")) == want


def test_rollback_restores_old_snapshot(spark, appended):
    cat = appended
    v2 = _rows(cat.read(spark, "t", version=2))
    latest = _rows(cat.read(spark, "t"))
    assert v2 != latest

    stats = cat.rollback(spark, "t", 2)
    assert stats["restored_version"] == 2
    assert stats["new_version"] == 5
    # current read is the old state; manifest follows; history keeps all
    assert _rows(cat.read(spark, "t")) == v2
    assert cat.manifest("t")["rows"] == len(v2)
    assert [h["version"] for h in cat.history("t")] == [1, 2, 3, 4, 5]
    # the rolled-back-PAST state is itself still in history (v4)
    assert _rows(cat.read(spark, "t", version=4)) == latest
    # a later append builds on the restored state
    cat.write("t", _mk(spark, 400, 410), partition_by=["lang"],
              bucket_url="url", n_buckets=4, mode="append")
    assert cat.read(spark, "t").count() == len(v2) + 10


def test_rollback_to_expired_snapshot_fails_cleanly(spark, appended):
    cat = appended
    cat.compact(spark, "t")
    cat.expire_snapshots("t", keep_last=1)
    # v2 was expired: its snapshot json (and files) are gone
    with pytest.raises(FileNotFoundError):
        cat.rollback(spark, "t", 2)
    # the live snapshot still rolls back onto itself harmlessly
    want = _rows(cat.read(spark, "t"))
    live = cat._snapshot_versions("t")[-1]
    cat.rollback(spark, "t", live)
    assert _rows(cat.read(spark, "t")) == want
