"""Local twin of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle on the same parquet tables, compare row count,
column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None or v is pd.NaT:
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Keep a float marker on integral floats: the driver's hash
        # distinguishes bigint 0 from float64 0.0 (that typing skew is
        # exactly how docs_pack_shards went red in round 3 while %.6g
        # masked it locally).  A DuckDB HUGEINT surfacing as float must
        # NOT collapse into the same token as a Spark bigint.
        s = f"{v:.6g}"
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_canon(row[i]) for i in order) for row in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"create view {t} as select * from read_parquet('{path}')")
    yield con
    con.close()


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name, sf_dir):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    # Both sides go through pandas, mirroring the driver's compare: a
    # nullable Spark bigint becomes float64+NaN in toPandas exactly as
    # a nullable DuckDB bigint does in cur.df(), so the twin neither
    # over- nor under-flags relative to the driver.
    spark_pdf = sdf.toPandas()
    spark_cols = [c.lower() for c in spark_pdf.columns]
    spark_rows = list(spark_pdf.itertuples(index=False, name=None))

    # Fetch the oracle side via pandas, NOT fetchall(): the driver's
    # compare goes through pandas/Arrow, where DuckDB HUGEINT surfaces
    # as float64 while fetchall() returns exact Python int.  fetchall()
    # kept local CI green across two rounds of driver typing reds
    # (docs_pack_shards r3, graph_pagerank r4) — this path is the one
    # under test.
    cur = ddb.execute(entry_mod.oracle_sql()[name])
    duck_df = cur.df()
    duck_cols = [c.lower() for c in duck_df.columns]
    duck_rows = list(duck_df.itertuples(index=False, name=None))

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows))
    # map spark row order to its own column list before hashing
    sh = _value_hash(spark_rows, spark_cols)
    dh = _value_hash(duck_rows, duck_cols)
    assert sh == dh, f"{name}: value hash mismatch"


def test_no_hugeint_oracle_columns(ddb):
    """No oracle may emit HUGEINT/UHUGEINT: DuckDB's 128-bit sum() type
    surfaces as float64 on the driver's pandas/Arrow path while Spark
    emits bigint, hash-mismatching even on identical values (the r3
    docs_pack_shards and r4 graph_pagerank bug class).  Cast such sums
    to BIGINT in the oracle SQL."""
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        rel = ddb.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper():
                bad.append((name, col, str(typ)))
    assert not bad, f"HUGEINT-typed oracle columns: {bad}"


def test_rows_only_queries_run(spark):
    # non-oracle queries must at least execute and return stable schemas
    qs = entry_mod.queries()
    for name in ("kg_extracted_text", "multimodal_image_meta"):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name
