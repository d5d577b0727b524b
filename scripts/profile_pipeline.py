"""Dev tool: wall-clock of the composed run_pipeline (bench's exact flow,
single final action) vs the per-stage cached profiler — diagnoses
recompute/eviction inside the one-action plan."""

import sys
import time

sys.path.insert(0, "/root/repo")

from inclusionreferenceskg_spark.session import get_spark  # noqa: E402
from inclusionreferenceskg_spark import synth  # noqa: E402
from inclusionreferenceskg_spark.plans.pipeline import run_pipeline  # noqa: E402

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16000

spark = get_spark("pprof", master=f"local[{CPUS}]",
                  shuffle_partitions=max(CPUS * 2, 16))
spark.sparkContext.setLogLevel("ERROR")

sc = spark.sparkContext
status = sc.statusTracker()

pages = synth.synthesize_pages(spark, N, partitions=max(CPUS * 2, 16))
t0 = time.perf_counter()
res = run_pipeline(pages)
n = res.triples.count()
print(f"one-action triples: {time.perf_counter()-t0:.1f}s n={n}",
      flush=True)

# job/stage census via the REST-less status tracker
jobs = status.getJobIdsForGroup(None)
print(f"jobs run: {len(jobs)}", flush=True)
spark.stop()
