"""Export sinks (SURVEY §2.1 S4/S5).

* triples — the product sink: partitioned parquet via the catalog (or any
  DataFrameWriter); mirrors ``KnowledgeGraph.as_triplets``
  (``knowledge_graph.py:122-138``) which the triples operator already
  formats.  NOTE the reference's destination-id bug (``:136`` reuses the
  source id in the destination tuple) is intentionally NOT reproduced:
  only the string parts are comparable, and only strings are compared in
  its own evaluation (``evaluate_kg_creation.py:510``).
* graphviz — debug-only driver-side rendering of tiny samples
  (``knowledge_graph.py:140-160``); emits DOT text so no graphviz
  dependency is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_triples(triples: DataFrame, path: str,
                  partition_by: str = "url") -> None:
    (triples.write.mode("overwrite").partitionBy(partition_by)
     .parquet(path))


def to_dot(edges: DataFrame, displays: DataFrame, limit: int = 500) -> str:
    """Render a (small!) edge sample as DOT text; collects to the driver,
    guard with ``limit``."""
    disp = {r["kg_id"]: r["display"] for r in displays.limit(limit * 2)
            .collect()}
    lines = ["digraph kg {"]
    for r in edges.limit(limit).collect():
        s = disp.get(r["src"], r["src"]).replace('"', "'")
        d = disp.get(r["dst"], r["dst"]).replace('"', "'")
        lines.append(f'  "{s}" -> "{d}" [label="{r["label"]}"];')
    lines.append("}")
    return "\n".join(lines)
