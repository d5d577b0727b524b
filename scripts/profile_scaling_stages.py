"""Dev tool: per-stage N-vs-4N scaling table.

Runs the pipeline's stages with eager materialization between them at two
core counts on the identical input and prints per-stage wall at each level
plus the per-stage speedup — pinpoints which stage caps the end-to-end
N-vs-4N efficiency.

Noise discipline (learned the hard way — a single co-tenant burst during
one leg dilated the 16-core parse reading 2.5x and mis-attributed the
whole fixed tail): legs are interleaved lo,hi,lo,hi,... (PSS_ROUNDS
each), each leg stamps 1-min load before/after, and the printed table is
the per-stage MINIMUM across legs of the same level — the same
adjudication rule as the gated end-to-end harness.  Set PSS_TASKSET=1 to
bound each leg to exactly N cores (JVM GC/netty pools then auto-size to
the mask, as on a real N-core executor).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("PSS_DOCS", "8000"))
LEVELS = [int(x) for x in os.environ.get("PSS_LEVELS", "2,8").split(",")]
ROUNDS = int(os.environ.get("PSS_ROUNDS", "1"))

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

def load1():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])

CPUS = %(cpus)d; N = %(n)d
spark = get_spark("pss", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
run_pipeline(synth.synthesize_pages(spark, 64, partitions=16)).triples.count()
t = {"load_before": load1()}
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
fe = stage("merge", lambda: kg_ops.apply_merges(kn, ke, canon))
tr = stage("triples_plan", lambda: kg_ops.make_triples(fe, kn, canon, nodes))
stage("triples", lambda: tr.count())
t["TOTAL_staged"] = round(time.perf_counter()-t0_all, 2)
t["load_after"] = load1()
print(json.dumps(t))
spark.stop()
'''

STAGES = ["parse", "qualify", "resolve", "extract", "link_pairs", "cc",
          "merge", "triples_plan", "triples", "TOTAL_staged"]


def run(cpus: int) -> dict:
    code = CHILD % {"repo": REPO, "cpus": cpus, "n": N}
    cmd = [sys.executable, "-c", code]
    if os.environ.get("PSS_TASKSET", "") == "1":
        # same rationale as bench_scaling_watcher.TASKSET: bound the whole
        # process tree to exactly N cores so JVM GC/netty pools auto-size
        # to the mask and a "local[4]" child cannot borrow extra CPU.
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"child local[{cpus}] failed rc={out.returncode}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"  leg local[{cpus}]: total {rec['TOTAL_staged']:.1f}s  "
          f"load {rec['load_before']:.2f}->{rec['load_after']:.2f}",
          flush=True)
    return rec


def main() -> None:
    legs: dict[int, list] = {c: [] for c in LEVELS}
    for _ in range(ROUNDS):
        for c in LEVELS:          # interleave lo,hi per round
            legs[c].append(run(c))
    minima = {c: {s: min(leg[s] for leg in legs[c]) for s in STAGES}
              for c in LEVELS}
    lo, hi = LEVELS[0], LEVELS[-1]
    print(f"{'stage':<14}{f'local[{lo}]':>10}{f'local[{hi}]':>10}{'speedup':>9}"
          f"{'fixed_s':>9}")
    ratio = hi / lo  # real ratio: 4,6 must not truncate to 1 (nor 4,10 to 2)
    for s in STAGES:
        a, b = minima[lo][s], minima[hi][s]
        # per-stage Amdahl fixed term from the two minima:
        # a = ratio*p + t, b = p + t  =>  t = (ratio*b - a) / (ratio - 1)
        # — the algebra holds for any real ratio > 1
        fixed = (ratio * b - a) / (ratio - 1) if ratio > 1 else 0.0
        print(f"{s:<14}{a:>10.2f}{b:>10.2f}{(a / b if b else 0):>9.2f}"
              f"{max(fixed, 0.0):>9.2f}")


if __name__ == "__main__":
    main()
