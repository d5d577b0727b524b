"""Streaming crawl-refresh with CONTENT changes: foreachBatch +
run_upsert keeps the durable triples table equal to a full rerun on the
latest snapshot, and redelivered identical files are no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.plans.checkpoint import run_checkpointed
from inclusionreferenceskg_spark.sources.catalog import Catalog
from inclusionreferenceskg_spark.streaming.pipeline import run_stream_upsert


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _mutate(spark, pages, doc_rank, marker):
    """One page's text deterministically changes (a real recrawl diff)."""
    schema = StructType([StructField(f.name, f.dataType, True)
                         for f in synth.PAGES_SCHEMA.fields])
    out = []
    for r in (tuple(r) for r in pages.collect()):
        if r[6] == doc_rank:
            r = list(r)
            r[3] = r[3] + ("\n\n3. The controller shall notify the "
                           f"authority subject to Article {marker}.\n")
            r = tuple(r)
        out.append(r)
    return spark.createDataFrame(out, schema)


def test_stream_upsert_crawl_refresh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sups"))
    inp = os.path.join(root, "in")
    work = os.path.join(root, "kg")
    ckpt = os.path.join(root, "ckpt")
    base = synth.synthesize_pages(spark, 10)

    # drop 1: the initial crawl (docs 0-7)
    base.filter(F.col("doc_rank") < 8).write.mode("append").parquet(inp)
    q = run_stream_upsert(spark, inp, work, ckpt)
    q.awaitTermination(600)
    assert Catalog(work).read(spark, "triples").count() > 0

    # drop 2: a recrawl — doc 2's CONTENT changed, docs 8-9 are new urls,
    # the rest are byte-identical redeliveries
    snap2 = _mutate(spark, base, 2, 1)
    snap2.write.mode("append").parquet(inp)
    q = run_stream_upsert(spark, inp, work, ckpt)
    q.awaitTermination(600)

    got = Catalog(work).read(spark, "triples")
    want = run_checkpointed(spark, snap2,
                            str(tmp_path_factory.mktemp("full")))
    assert _rows(got) == _rows(want)
    # exactly one copy-on-write delta was cut (drop 1 was the bootstrap)
    inc_root = os.path.join(work, "increments")
    assert len([d for d in os.listdir(inc_root)
                if d.startswith("ups_")]) == 1

    # drop 3: the crawler redelivers the identical snapshot as new files —
    # the fingerprint probe makes the batch a no-op (no second delta dir)
    snap2.write.mode("append").parquet(inp)
    q = run_stream_upsert(spark, inp, work, ckpt)
    q.awaitTermination(600)
    assert _rows(Catalog(work).read(spark, "triples")) == _rows(want)
    assert len([d for d in os.listdir(inc_root)
                if d.startswith("ups_")]) == 1


def test_maintenance_interleaves_with_stream(spark, tmp_path_factory):
    """compact + expire between streaming micro-batches must not disturb
    the next batch's append: the writer commits against the latest
    snapshot (metadata-resolved), not the directory."""
    root = str(tmp_path_factory.mktemp("smaint"))
    inp = os.path.join(root, "in")
    work = os.path.join(root, "kg")
    ckpt = os.path.join(root, "ckpt")
    base = synth.synthesize_pages(spark, 12)

    base.filter(F.col("doc_rank") < 6).write.mode("append").parquet(inp)
    q = run_stream_upsert(spark, inp, work, ckpt)
    q.awaitTermination(600)

    cat = Catalog(work)
    cat.compact(spark, "triples")
    cat.expire_snapshots("triples", keep_last=1)

    base.filter(F.col("doc_rank") >= 6).write.mode("append").parquet(inp)
    q = run_stream_upsert(spark, inp, work, ckpt)
    q.awaitTermination(600)

    got = cat.read(spark, "triples")
    want = run_checkpointed(spark, base,
                            str(tmp_path_factory.mktemp("full")))
    assert _rows(got) == _rows(want)
