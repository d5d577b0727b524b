"""Bucketed tables: shuffle-free co-located joins.

The node/edge tables of the KG are repeatedly re-joined on the same key
(``url`` / node id) by downstream consumers — entity linking, incremental
merges, serving extracts.  At 100 TB every such join is a full shuffle of
both sides UNLESS the tables are stored pre-hash-partitioned on the join
key: Spark's ``bucketBy`` (the Parquet/Hive form) or Iceberg's
``bucket(N, key)`` partition transform (the production form — SURVEY
§7.0).  When both sides are bucketed on the join key with the same bucket
count, Catalyst plans the join with NO Exchange on either side: each task
reads bucket *i* of both tables and joins locally.  ``sortBy`` on the
same key additionally removes the Sort for sort-merge joins.

This module is the writer half of that contract; the test
(`tests/test_buckets.py`) asserts the Exchange-free plan, which is the
property that actually matters at scale.

Bucket-count choice at 100 TB: buckets are the unit of join parallelism
AND the minimum read granularity — pick ``rows_per_bucket ≈ what one
executor core can sort in memory`` (e.g. 2^13 buckets for a 100 TB edge
table ≈ 12 GB/bucket pre-compression; too few buckets caps parallelism,
too many makes small files).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, path: str,
                  key: Union[str, Sequence[str]], n_buckets: int) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    ``bucketBy`` requires the table-catalog API (``saveAsTable``); the
    ``path`` option keeps the data external so nothing lands in a
    default warehouse directory.  Metadata lives in the session's
    catalog — on a cluster that is the metastore; the Iceberg analog is
    ``writeTo(table).partitionedBy(bucket(n, key))``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    (df.write.mode("overwrite")
       .option("path", path)
       .bucketBy(n_buckets, *keys)
       .sortBy(*keys)
       .saveAsTable(table))


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: Union[str, Sequence[str]],
                   how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    This is a plain catalog-table join — the point is what Catalyst does
    with it: with ``spark.sql.sources.bucketing.enabled`` (default true)
    and matching bucket specs, the physical plan contains no Exchange.
    Callers should disable broadcast for the probe
    (``spark.sql.autoBroadcastJoinThreshold=-1``) when they want the
    co-located sort-merge plan demonstrated rather than a broadcast.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
