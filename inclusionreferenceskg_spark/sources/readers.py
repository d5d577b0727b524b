"""Evaluation-data sources (SURVEY §2.1 S3/S6).

* gold reference CSV — ``;``-delimited, header row, one mention text per
  line in document order (``gold_standard_reference_detector.py:23-32``);
* expected-resolution JSON — array of ``{text, patterns}`` with recursive
  pattern objects (``evaluate_reference_resolver.py:30-31``);
* golden triples CSV — comma-delimited, headerless
  ``(subject, relation, object)`` (``evaluate_kg_creation.py:507-508``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def read_gold_references(spark: SparkSession, path: str,
                         delimiter: str = ";") -> DataFrame:
    """-> (seq, text) rows in document order."""
    df = (spark.read.option("sep", delimiter).option("header", "true")
          .csv(path).toDF("text"))
    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn("seq", F.row_number().over(w) - 1) \
        .select("seq", "text")


def read_expected_resolutions(spark: SparkSession, path: str) -> DataFrame:
    """-> (mention_seq, text, pattern_idx, pattern_json) rows."""
    df = spark.read.option("multiLine", "true").json(path)
    w = Window.orderBy(F.monotonically_increasing_id())
    df = df.withColumn("mention_seq", F.row_number().over(w) - 1)
    return (df.select("mention_seq", "text",
                      F.posexplode_outer("patterns")
                      .alias("pattern_idx", "pattern"))
            .withColumn("pattern_json", F.to_json("pattern"))
            .drop("pattern"))


def read_golden_triples(spark: SparkSession, path: str) -> DataFrame:
    """-> (subject, relation, object) rows."""
    return (spark.read.option("header", "false").csv(path)
            .toDF("subject", "relation", "object"))
