"""Load-gated scaling measurement for a shared box.

The sandbox machine carries bursty co-tenant load (load-average swings
0 -> 11 on a ~10-minute period), which makes single scaling measurements
±2x.  This harness gates each trial on the 1-minute load average: it
waits (up to a timeout) for a quiet window before every LO/HI kg-only
bench invocation, interleaves levels, records the load before/after each
trial, and keeps the per-level minimum — the least-interfered
measurement of the same deterministic plan.

Output: one JSON line with per-trial records + the minima-based
efficiency; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LO = int(os.environ.get("SCALE_LO", "2"))
HI = int(os.environ.get("SCALE_HI", "8"))
TRIALS = int(os.environ.get("SCALE_TRIALS", "3"))
QUIET = float(os.environ.get("SCALE_QUIET_LOAD", "1.5"))
WAIT_MAX = int(os.environ.get("SCALE_WAIT_MAX", "600"))


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _quantum() -> float:
    """Instantaneous single-thread CPU quantum (same protocol as
    bench.py's in-run meter).  The 1-minute load average lags co-tenant
    bursts by up to a minute; the quantum reads the core NOW."""
    import hashlib
    h = b"x"
    t0 = time.perf_counter()
    for _ in range(300000):
        h = hashlib.sha256(h).digest()
    return time.perf_counter() - t0


#: a leg only starts when two quantum samples 1 s apart both read at or
#: below this (clean-core readings on this box: 0.14-0.17 s)
QUANTUM_CLEAN = float(os.environ.get("SCALE_QUANTUM_CLEAN", "0.175"))


def wait_quiet() -> float:
    t0 = time.time()
    while time.time() - t0 < WAIT_MAX:
        ld = load1()
        if ld <= QUIET and _quantum() <= QUANTUM_CLEAN:
            time.sleep(1.0)
            if _quantum() <= QUANTUM_CLEAN:
                return ld
        time.sleep(20)
    return load1()


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_KG_ONLY="1", SPARK_GRAFT_BENCH_TRIALS="1")
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    records = []
    best = {LO: None, HI: None}
    for t in range(TRIALS):
        for cpus in (LO, HI):
            ld_before = wait_quiet()
            r = run(cpus)
            rec = {"trial": t, "cpus": cpus,
                   "kg_secs": r["queries"]["kg_triples"],
                   "rate": r["value"], "n_triples": r["n_triples"],
                   "load_before": ld_before, "load_after": load1(),
                   # per-leg in-run interference meter (from bench.py):
                   # during/idle quantum dilation marks mid-leg co-tenant
                   # bursts that the load_before stamp cannot see
                   "cpu_quantum_idle": r.get("cpu_quantum_idle"),
                   "cpu_quantum_during": r.get("cpu_quantum_during")}
            records.append(rec)
            if best[cpus] is None or rec["kg_secs"] < best[cpus]["kg_secs"]:
                best[cpus] = rec
            print(json.dumps(rec), file=sys.stderr, flush=True)
    speedup = best[HI]["rate"] / best[LO]["rate"]
    print(json.dumps({
        "lo": LO, "hi": HI,
        "rate_lo": best[LO]["rate"], "rate_hi": best[HI]["rate"],
        "kg_secs_lo": best[LO]["kg_secs"], "kg_secs_hi": best[HI]["kg_secs"],
        "speedup": round(speedup, 2),
        "efficiency": round(speedup / (HI / LO), 3),
        "trials": records,
    }))


if __name__ == "__main__":
    main()
