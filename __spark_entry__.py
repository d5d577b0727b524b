"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship query — the full KG-construction pipeline (parse ->
detect -> resolve -> annotate/extract -> link -> triples) over pages
deterministically synthesized from the sf0.001 documents table.

``queries`` / ``oracle_sql``: the engine's query catalog
(``inclusionreferenceskg_spark/queries.py``) — relational operators,
text-analysis / dedup / similarity training-data ops (DuckDB oracles), and
the KG pipeline stages (rows-only: no SQL engine can replicate the
stack-machine parser or the NLP stages; their correctness gates are the
golden-corpus pytest suites vs the reference's own evaluation data).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from inclusionreferenceskg_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples over the sf0.001-derived synthetic corpus."""
    return _q.kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    # citation-analytics oracles are generator-replay twins built lazily
    # (bench imports queries.py with KG doc limits where an import-time
    # replay would cost minutes)
    _q._ensure_citation_oracles()
    return dict(_q.ORACLES)
