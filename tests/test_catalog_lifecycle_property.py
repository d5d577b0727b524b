"""Property test: random interleavings of the table-lifecycle operations
(append / compact / expire / rollback) against a pure-Python simulator of
the expected current contents and retained-version history."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from inclusionreferenceskg_spark.sources.catalog import Catalog

# op encoding: ("append", batch_idx) | ("compact",) | ("expire", keep)
# | ("rollback", pick) — pick selects among currently-retained versions
ops_strategy = st.lists(
    st.one_of(
        st.tuples(st.just("append")),
        st.tuples(st.just("compact")),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.tuples(st.just("rollback"), st.integers(0, 7)),
    ),
    min_size=1, max_size=5)


def _batch(spark, i):
    return spark.createDataFrame(
        [Row(url=f"https://ex.org/{i}/{j}", lang="en" if j % 2 else "de",
             n=i * 100 + j) for j in range(8)])


def _rows(df):
    # url_bucket is a derived layout column — compare logical contents
    df = df.drop("url_bucket")
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@settings(max_examples=8, deadline=None)
@given(ops_strategy)
def test_lifecycle_interleavings_match_simulator(spark, tmp_path_factory,
                                                 ops):
    cat = Catalog(str(tmp_path_factory.mktemp("life")))
    # bootstrap: version 1 = batch 0
    cat.write("t", _batch(spark, 0), partition_by=["lang"],
              bucket_url="url", n_buckets=4)
    cur = _rows(cat.read(spark, "t"))
    history = {1: cur}          # retained version -> expected rows
    next_batch = 1

    for op in ops:
        kind = op[0]
        if kind == "append":
            cat.write("t", _batch(spark, next_batch),
                      partition_by=["lang"], bucket_url="url",
                      n_buckets=4, mode="append")
            cur = sorted(cur + _rows(_batch(spark, next_batch)))
            next_batch += 1
            history[max(history) + 1] = cur
        elif kind == "compact":
            cat.compact(spark, "t")
            history[max(history) + 1] = cur  # contents unchanged
        elif kind == "expire":
            keep = op[1]
            cat.expire_snapshots("t", keep_last=keep)
            retained = sorted(history)[-keep:]
            history = {v: history[v] for v in retained}
        else:  # rollback to some retained version
            versions = sorted(history)
            target = versions[op[1] % len(versions)]
            cat.rollback(spark, "t", target)
            cur = history[target]
            history[max(history) + 1] = cur

        assert _rows(cat.read(spark, "t")) == cur, op
        assert cat.manifest("t")["rows"] == len(cur), op

    # every retained version still time-travels to its recorded contents
    for v, rows in history.items():
        assert _rows(cat.read(spark, "t", version=v)) == rows, v
