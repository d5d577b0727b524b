"""Bucketed tables: the co-located join must plan with ZERO Exchange."""

import pytest
from pyspark.sql import functions as F

from inclusionreferenceskg_spark.sources.buckets import (
    colocated_join,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    nodes = spark.range(0, 2000).select(
        F.col("id").alias("node_id"),
        F.concat(F.lit("https://d"), (F.col("id") % 37).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string"))
        .alias("url"))
    edges = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("node_id"),
        (F.col("id") % 97).alias("weight"))
    save_bucketed(nodes, "t_nodes_b", str(root / "nodes"), "node_id", 8)
    save_bucketed(edges, "t_edges_b", str(root / "edges"), "node_id", 8)
    yield "t_nodes_b", "t_edges_b", nodes, edges
    spark.sql("drop table if exists t_nodes_b")
    spark.sql("drop table if exists t_edges_b")


def test_colocated_join_has_no_exchange(spark, bucketed):
    ln, rn, _, _ = bucketed
    with _no_broadcast(spark):
        plan = (colocated_join(spark, ln, rn, "node_id")
                ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    # bucket-sorted on the key: the sort-merge join needs no extra Sort
    assert "SortMergeJoin" in plan


def test_plain_parquet_join_does_exchange(spark, bucketed, tmp_path):
    # control: identical data, unbucketed — Catalyst MUST shuffle it
    _, _, nodes, edges = bucketed
    nodes.write.mode("overwrite").parquet(str(tmp_path / "n"))
    edges.write.mode("overwrite").parquet(str(tmp_path / "e"))
    with _no_broadcast(spark):
        j = (spark.read.parquet(str(tmp_path / "n"))
             .join(spark.read.parquet(str(tmp_path / "e")), "node_id"))
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_colocated_join_values(spark, bucketed):
    ln, rn, nodes, edges = bucketed
    got = (colocated_join(spark, ln, rn, "node_id")
           .groupBy().agg(F.count("*").alias("n"),
                          F.sum("weight").alias("w")).first())
    want = (nodes.join(edges, "node_id")
            .groupBy().agg(F.count("*").alias("n"),
                           F.sum("weight").alias("w")).first())
    assert (got["n"], got["w"]) == (want["n"], want["w"])
    assert got["n"] == 6000  # every edge matches exactly one node


class _no_broadcast:
    """Scoped autoBroadcastJoinThreshold=-1 (restores the prior value)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev)
