"""Copy-on-write upsert vs Spark's on-disk partition-value encoding.

Round-3 ADVICE: shadow prefixes were built as f"{c}={value}", which does
not match Spark's directory names for null partition values
(__HIVE_DEFAULT_PARTITION__) or values containing escaped characters
(ExternalCatalogUtils percent-escapes "#%'*/:=?\\{[]^ and control
chars).  A changed url in such a partition would keep its OLD files in
the new snapshot (duplicate old+new rows) — and the survivor semi-join
on the partition columns silently dropped null-partition survivors.
These tests drive _cow_upsert directly over partitions with a null lang
and a slash-bearing lang.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inclusionreferenceskg_spark.plans.checkpoint import (
    _cow_upsert,
    _part_value,
)
from inclusionreferenceskg_spark.sources.catalog import Catalog


def test_part_value_spark_encoding():
    assert _part_value(None) == "__HIVE_DEFAULT_PARTITION__"
    assert _part_value("en/US") == "en%2FUS"
    assert _part_value("a:b") == "a%3Ab"
    assert _part_value("100%") == "100%25"
    assert _part_value(True) == "true"
    assert _part_value(7) == "7"
    assert _part_value("plain-value_1.2") == "plain-value_1.2"


def _rows(df):
    return sorted(tuple(r) for r in
                  df.select("url", "lang", "val").collect())


def test_cow_upsert_null_and_escaped_partitions(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("cow"))
    delta = str(tmp_path_factory.mktemp("cow_delta"))
    cat, dcat = Catalog(work), Catalog(delta)

    # four urls across three partitions: null lang, slash lang, plain
    base = spark.createDataFrame(
        [("u1", None, "old1"), ("u2", None, "keep2"),
         ("u3", "en/US", "old3"), ("u4", "en", "keep4")],
        "url string, lang string, val string")
    cat.write("t", base, partition_by=("lang",), bucket_url="url")

    # u1 (null partition) and u3 (escaped partition) change content
    changed = spark.createDataFrame([("u1",), ("u3",)], "url string")
    fresh = spark.createDataFrame(
        [("u1", None, "new1"), ("u3", "en/US", "new3")],
        "url string, lang string, val string")
    out = _cow_upsert(spark, cat, dcat, "t", changed, fresh,
                      partition_by=("lang",))

    want = [("u1", None, "new1"), ("u2", None, "keep2"),
            ("u3", "en/US", "new3"), ("u4", "en", "keep4")]
    # no duplicate old+new rows (shadowing matched the real dir names),
    # no lost survivors (null-safe semi-join kept u2)
    assert _rows(out) == want
    assert _rows(cat.read(spark, "t")) == want

    # pre-upsert snapshot still time-travels to the OLD state
    v1 = cat.read(spark, "t", version=1)
    assert _rows(v1) == [("u1", None, "old1"), ("u2", None, "keep2"),
                         ("u3", "en/US", "old3"), ("u4", "en", "keep4")]


def test_cow_upsert_survivors_in_untouched_partitions(spark,
                                                      tmp_path_factory):
    work = str(tmp_path_factory.mktemp("cow2"))
    delta = str(tmp_path_factory.mktemp("cow2_delta"))
    cat, dcat = Catalog(work), Catalog(delta)
    base = spark.range(20).select(
        F.concat(F.lit("u"), "id").alias("url"),
        F.when(F.col("id") % 3 == 0, F.lit(None)).otherwise(
            F.concat(F.lit("l"), F.col("id") % 3)).alias("lang"),
        F.lit("old").alias("val"))
    cat.write("t", base, partition_by=("lang",), bucket_url="url")
    changed = spark.createDataFrame([("u0",)], "url string")
    fresh = spark.createDataFrame([("u0", None, "new")],
                                  "url string, lang string, val string")
    out = _cow_upsert(spark, cat, dcat, "t", changed, fresh,
                      partition_by=("lang",))
    got = {r["url"]: r["val"] for r in out.collect()}
    assert len(got) == 20 and got["u0"] == "new"
    assert all(v == "old" for u, v in got.items() if u != "u0")
