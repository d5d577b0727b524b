"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` keeps a per-bucket set of content hashes in the
state store, so a page whose normalized text was already ingested in ANY
earlier micro-batch is dropped exactly once across the stream's lifetime
(bounded by the state TTL).  Buckets are hash partitions of the content
fingerprint — the state key space is uniform by construction, never skewed
by url popularity.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("text_hash", T.StringType(), False),
])

STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.ArrayType(T.StringType()), False),
])

N_BUCKETS = 32


def _dedup_fn(key: Tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_urls, out_hashes = [], []
    for pdf in pdfs:
        for url, h in zip(pdf["url"], pdf["text_hash"]):
            if h not in seen:
                seen.add(h)
                out_urls.append(url)
                out_hashes.append(h)
    state.update((sorted(seen),))
    yield pd.DataFrame({"url": out_urls, "text_hash": out_hashes})


def streaming_exact_dedup(pages_stream: DataFrame) -> DataFrame:
    """pages stream -> first-seen (url, text_hash) rows across batches."""
    hashed = pages_stream.select(
        "url",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
        .alias("text_hash"))
    bucketed = hashed.withColumn(
        "bucket", F.pmod(F.xxhash64("text_hash"), F.lit(N_BUCKETS)))
    return bucketed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
