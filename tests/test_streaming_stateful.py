"""applyInPandasWithState: duplicates dropped across micro-batches."""

from __future__ import annotations

import os
import time

from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.streaming.pipeline import stream_pages
from inclusionreferenceskg_spark.streaming.stateful import (
    streaming_exact_dedup,
)


def test_cross_batch_dedup(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sdedup"))
    inp = os.path.join(root, "in")
    ckpt = os.path.join(root, "ckpt")

    out = os.path.join(root, "out")
    pages = synth.synthesize_pages(spark, 8).filter("doc_rank < 6").cache()
    pages.write.mode("append").parquet(inp)

    def run_once():
        q = (streaming_exact_dedup(
            stream_pages(spark, inp, max_files_per_trigger=100))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True).start())
        q.awaitTermination(180)
        time.sleep(1)

    run_once()
    got = spark.read.parquet(out)
    assert got.select("text_hash").distinct().count() == 6
    assert got.count() == 6

    # second drop: 3 duplicate docs + 2 new ones; the state store remembers
    # the first batch's hashes across queries via the checkpoint
    dup = synth.synthesize_pages(spark, 8).filter("doc_rank < 3")
    new = synth.synthesize_pages(spark, 8).filter("doc_rank >= 6")
    dup.unionByName(new).write.mode("append").parquet(inp)

    run_once()
    got = spark.read.parquet(out)
    # 6 originals + only the 2 genuinely new pages
    assert got.count() == 8
    assert got.select("text_hash").distinct().count() == 8
