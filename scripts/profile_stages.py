"""Dev tool: per-stage wall-clock of the KG pipeline at a given core count."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from inclusionreferenceskg_spark.session import get_spark  # noqa: E402
from inclusionreferenceskg_spark import synth  # noqa: E402
from inclusionreferenceskg_spark.operators.parse import parse_pages  # noqa: E402
from inclusionreferenceskg_spark.operators.detect import build_qualifiers  # noqa: E402
from inclusionreferenceskg_spark.operators.resolve import resolve_targets  # noqa: E402
from inclusionreferenceskg_spark.operators import kg as kg_ops  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16000

spark = get_spark("profile", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
pages = synth.synthesize_pages(spark, N, partitions=max(CPUS * 2, 16))


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.2f}s", flush=True)
    return r


nodes = parse_pages(pages).cache()
t("parse", lambda: nodes.count())
quals = build_qualifiers(nodes).cache()
t("qualify", lambda: quals.count())
resolved = resolve_targets(quals, nodes).cache()
t("resolve", lambda: resolved.count())
wide = kg_ops.extract_graph(nodes, resolved).cache()
t("extract_graph", lambda: wide.count())
kn = kg_ops.graph_nodes(wide)
ke = kg_ops.graph_edges(wide).unionByName(kg_ops.contains_edges(nodes))
pairs = kg_ops.entity_link_pairs(kn, kg_ops.l3_candidates(wide), nodes).cache()
t("link_pairs", lambda: pairs.count())
canon = t("cc", lambda: kg_ops.connected_components(pairs))
fe = kg_ops.apply_merges(kn, ke, canon)
tr = kg_ops.make_triples(fe, kn, canon, nodes)
t("triples", lambda: tr.count())
spark.stop()
