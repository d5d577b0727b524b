"""Pooled staged-profile legs for a burst-saturated box.

Loops profile_scaling_stages legs in a configurable level pattern
(default hi,hi,lo — the hi level carries the fixed-tail signal and is
cheaper), appending each leg's per-stage JSON + load stamps to a JSONL
pool.  Adjudicate with per-stage minima per level, exactly like the
gated end-to-end harness.

Env: POOL_LEVELS ("16,16,4"), POOL_DOCS, POOL_HOURS, POOL_OUT.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# POOL_DOCS is the documented knob: when set it wins outright, so an
# inherited PSS_DOCS can never silently override it and skew rec['docs'].
if os.environ.get("POOL_DOCS"):
    os.environ["PSS_DOCS"] = os.environ["POOL_DOCS"]
else:
    os.environ.setdefault("PSS_DOCS", "80000")
os.environ.setdefault("PSS_TASKSET", "1")

import profile_scaling_stages as pss  # noqa: E402

PATTERN = [int(x) for x in
           os.environ.get("POOL_LEVELS", "16,16,4").split(",")]
HOURS = float(os.environ.get("POOL_HOURS", "6"))
OUT = os.environ.get("POOL_OUT", "/tmp/pss_pool.jsonl")


def main() -> None:
    t_end = time.time() + HOURS * 3600
    while time.time() < t_end:
        for cpus in PATTERN:
            try:
                rec = pss.run(cpus)
            except (SystemExit, ValueError, KeyError) as exc:
                # ValueError covers a child that exits 0 but prints a
                # stray non-JSON last line; neither may kill a
                # multi-hour unattended pool run.
                print(f"leg failed: {exc!r}", flush=True)
                time.sleep(30)
                continue
            rec["cpus"] = cpus
            rec["docs"] = pss.N
            rec["ts"] = time.time()
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if time.time() > t_end:
                break


if __name__ == "__main__":
    main()
