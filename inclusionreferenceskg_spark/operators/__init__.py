"""Spark DataFrame operators — the engine's stage library.

Each module exposes functions ``DataFrame -> DataFrame`` so stages compose
declaratively and Catalyst sees the whole plan (pushdown, pruning, join
planning, AQE).  Python only ever runs inside Arrow-batched ``mapInPandas``
for the genuinely sequential per-document algorithms.
"""
