"""PySpark-native knowledge-graph construction engine.

A from-scratch re-implementation of the capabilities of
`l-rossi/InclusionReferencesKG` (document-structure parsing, reference
detection/resolution, dependency-parse triple extraction, KG assembly with
entity linking) re-expressed as idiomatic Spark DataFrame dataflow over an
Iceberg-style table of Common-Crawl-style web pages:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Design: every per-document sequential algorithm from the reference lives in
``functions/`` as a pure-Python batch function invoked through Arrow-batched
pandas UDFs (``mapInPandas``); everything cross-document (reference-target
joins, entity-link blocking, connected components, dedup) is declarative
DataFrame code in ``operators/`` so Catalyst handles pushdown, pruning and
join planning. No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
