"""salted_join: semantics-preserving vs a plain join, plan actually salted."""

import pytest
from pyspark.sql import functions as F

from inclusionreferenceskg_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1, 201)],
        "row_id long, k string, v double")
    build = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("orphan", 3.0)],
        "k string, w double")
    return probe, build


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(frames):
    probe, build = frames
    plain = probe.join(build, "k")
    salted = salted_join(probe, build, on="k", salt_from="row_id",
                         n_salts=4)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*sorted(salted.columns))) == \
        _rows(plain.select(*sorted(plain.columns)))


def test_left_keeps_unmatched_probe_rows_once(spark, frames):
    probe, build = frames
    # drop 'cold' from the build side so those probe rows are unmatched
    b = build.filter(F.col("k") != "cold")
    out = salted_join(probe, b, on="k", salt_from="row_id",
                      n_salts=4, how="left")
    assert out.count() == probe.count()  # replication must not duplicate
    cold = out.filter(F.col("k") == "cold")
    assert cold.count() == 20
    assert cold.filter(F.col("w").isNull()).count() == 20


def test_plan_is_salted_shuffle_hash(frames):
    probe, build = frames
    salted = salted_join(probe, build, on="k", salt_from="row_id",
                         n_salts=4)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "__irkg_salt" in plan  # salt participates in the join keys


def test_rejects_bad_arguments(frames):
    probe, build = frames
    with pytest.raises(ValueError):
        salted_join(probe, build, on="k", salt_from="k")
    with pytest.raises(ValueError):
        salted_join(probe, build, on="k", salt_from="row_id", how="full")
