"""Dev tool: per-stage 2-vs-8 scaling table.

Runs the pipeline's stages with eager materialization between them at two
core counts on the identical input and prints per-stage wall at each level
plus the per-stage speedup — pinpoints which stage caps the end-to-end
N-vs-4N efficiency.  Run EXCLUSIVELY (no concurrent jobs on the box).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("PSS_DOCS", "8000"))
LEVELS = [int(x) for x in os.environ.get("PSS_LEVELS", "2,8").split(",")]

CHILD = r'''
import sys, time, json
sys.path.insert(0, "%(repo)s")
from inclusionreferenceskg_spark.session import get_spark
from inclusionreferenceskg_spark import synth
from inclusionreferenceskg_spark.operators.parse import parse_pages
from inclusionreferenceskg_spark.operators.detect import build_qualifiers
from inclusionreferenceskg_spark.operators.resolve import resolve_targets
from inclusionreferenceskg_spark.operators import kg as kg_ops
from inclusionreferenceskg_spark.plans.pipeline import run_pipeline

CPUS = %(cpus)d; N = %(n)d
spark = get_spark("pss", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
run_pipeline(synth.synthesize_pages(spark, 64, partitions=16)).triples.count()
t = {}
def stage(name, fn):
    t0 = time.perf_counter(); r = fn(); t[name] = round(time.perf_counter()-t0, 2)
    return r
pages = synth.synthesize_pages(spark, N, partitions=int(__import__("os").environ.get("PSS_PARTS", str(max(CPUS*2, 16)))))
t0_all = time.perf_counter()
nodes = stage("parse", lambda: parse_pages(pages).localCheckpoint(eager=True))
quals = stage("qualify", lambda: build_qualifiers(nodes).localCheckpoint(eager=True))
resolved = stage("resolve", lambda: resolve_targets(quals, nodes).localCheckpoint(eager=True))
wide = stage("extract", lambda: kg_ops.extract_graph(nodes, resolved).localCheckpoint(eager=True))
kn = kg_ops.graph_nodes(wide)
ke = kg_ops.graph_edges(wide).unionByName(kg_ops.contains_edges(nodes))
pairs = stage("link_pairs", lambda: kg_ops.entity_link_pairs(kn, kg_ops.l3_candidates(wide), nodes).localCheckpoint(eager=True))
canon = stage("cc", lambda: kg_ops.connected_components(pairs))
fe = kg_ops.apply_merges(kn, ke, canon)
tr = kg_ops.make_triples(fe, kn, canon, nodes)
stage("triples", lambda: tr.count())
t["TOTAL_staged"] = round(time.perf_counter()-t0_all, 2)
print(json.dumps(t))
spark.stop()
'''


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "cpus": cpus, "n": N}
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    results = {c: run(c) for c in LEVELS}
    lo, hi = LEVELS[0], LEVELS[-1]
    names = list(results[lo])
    print(f"{'stage':<14}{f'local[{lo}]':>10}{f'local[{hi}]':>10}{'speedup':>9}")
    for s in names:
        a, b = results[lo][s], results[hi][s]
        print(f"{s:<14}{a:>10.2f}{b:>10.2f}{(a / b if b else 0):>9.2f}")


if __name__ == "__main__":
    main()
