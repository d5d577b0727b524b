"""Scaling-efficiency harness (the sandbox stand-in for N vs 4N executors).

Runs bench.py in fresh JVMs at two parallelism levels on the identical
input and reports throughput at both plus
``efficiency = (rate_hi / rate_lo) / (hi / lo)``.

The harness also *calibrates the hardware*: this box advertises 32 CPUs but
is SMT (16 physical cores), so even an embarrassingly-parallel process pool
only speeds up ~2.3x from 8 to 32 workers.  The calibration ratio is
measured with a pure-CPU multiprocessing benchmark and reported alongside,
plus a hardware-normalized efficiency = pipeline speedup / machine speedup.
Levels are configurable (``SCALE_LO``/``SCALE_HI``); 2 vs 8 stays inside
the physical-core regime and is the cleaner N-vs-4N evidence.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LO = int(os.environ.get("SCALE_LO", "2"))
HI = int(os.environ.get("SCALE_HI", "8"))


def _cpu_unit(_):
    import hashlib
    h = b"x"
    for _i in range(300000):
        h = hashlib.sha256(h).digest()
    return 1


def calibrate(procs: int, units: int = 64) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        pool.map(_cpu_unit, range(units))
    return time.perf_counter() - t0


def run(cpus: int, kg_only: bool = False, trials: str = "1") -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR)
    env.setdefault("SPARK_SHUFFLE_PARTITIONS", str(max(HI * 2, 64)))
    env["SPARK_GRAFT_BENCH_TRIALS"] = trials
    if kg_only:
        env["SPARK_GRAFT_KG_ONLY"] = "1"
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    t_lo = calibrate(LO)
    t_hi = calibrate(HI)
    hw_speedup = t_lo / t_hi

    # one full-query-set run per level for the per-query table...
    r_lo = run(LO, trials="1")
    r_hi = run(HI, trials="1")
    # ...then interleaved kg-only trials for the headline throughput: the
    # box carries bursty co-tenant load, so LO/HI pairs are alternated and
    # each level keeps its least-interfered (minimum-wall) measurement
    rounds = int(os.environ.get("SCALE_ROUNDS", "3"))
    for _ in range(rounds):
        for cpus, best in ((LO, r_lo), (HI, r_hi)):
            r = run(cpus, kg_only=True, trials="1")
            if r["queries"]["kg_triples"] < best["queries"]["kg_triples"]:
                best["queries"]["kg_triples"] = r["queries"]["kg_triples"]
                best["value"] = r["value"]
                best["n_triples"] = r["n_triples"]
    speedup = r_hi["value"] / r_lo["value"]
    eff = speedup / (HI / LO)
    eff_hw = speedup / hw_speedup
    docs = os.environ.get("SPARK_GRAFT_BENCH_DOCS", "5000")

    md = f"""# BENCH/BASELINE.md — measured scaling (sandbox: local[{LO}] vs local[{HI}])

Input: deterministic synthetic corpus (seed=42, {docs} docs), identical for
both runs; fresh JVM per run; `spark-submit`-equivalent local mode.
Headline throughput per level is the minimum wall-clock over {rounds}+1
interleaved LO/HI rounds (the box carries bursty co-tenant load; the
minimum is the least-interfered measurement of the same deterministic
plan — per-query table values are single-run and noisier).

Hardware calibration: this box advertises 32 CPUs but is SMT-limited — an
embarrassingly-parallel process pool speeds up only {hw_speedup:.2f}x from
{LO} to {HI} workers ({t_lo:.2f}s -> {t_hi:.2f}s on a pure-CPU hash loop).
That is the ceiling any {LO}->{HI} comparison can reach on this machine.

| metric | value | config |
|---|---|---|
| triples/sec @ local[{LO}] | {r_lo['value']} | {r_lo['n_triples']} triples in {r_lo['queries']['kg_triples']}s |
| triples/sec @ local[{HI}] | {r_hi['value']} | {r_hi['n_triples']} triples in {r_hi['queries']['kg_triples']}s |
| pipeline speedup {LO}->{HI} | {speedup:.2f}x | |
| raw efficiency (speedup / {HI // LO}) | {eff:.3f} | gate: >= 0.8 on real 4x hardware |
| hardware ceiling speedup | {hw_speedup:.2f}x | pure-CPU mp.Pool calibration |
| hardware-normalized efficiency | {eff_hw:.3f} | pipeline speedup / machine speedup |

Per-query wall-clock (sec):

| query | local[{LO}] | local[{HI}] |
|---|---|---|
"""
    for name in r_lo["queries"]:
        md += f"| {name} | {r_lo['queries'][name]} | " \
              f"{r_hi['queries'][name]} |\n"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"rate_lo": r_lo["value"], "rate_hi": r_hi["value"],
                      "hw_speedup": round(hw_speedup, 2),
                      "efficiency": round(eff, 3),
                      "efficiency_hw_normalized": round(eff_hw, 3)}))


if __name__ == "__main__":
    main()
