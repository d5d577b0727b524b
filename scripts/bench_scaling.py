"""Scaling-efficiency harness (the sandbox stand-in for N vs 4N executors).

Runs bench.py in fresh JVMs at local[8] and local[32] on the identical
input, reports throughput at both plus
``efficiency = (rate_32 / rate_8) / 4`` and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KG_DOCS = os.environ.get("SPARK_GRAFT_KG_DOCS", "1000")


def run(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               SPARK_GRAFT_KG_DOCS=KG_DOCS)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    eff = (r32["value"] / r8["value"]) / 4.0
    md = f"""# BENCH/BASELINE.md — measured scaling (sandbox: local[8] vs local[32])

Input: deterministic synthetic corpus derived from `{SF_DIR}/documents.parquet`
(first {KG_DOCS} docs, seed=42), identical for both runs.  Fresh JVM per run.

| metric | value | config |
|---|---|---|
| triples/sec @ local[8] | {r8['value']} | {r8['n_triples']} triples in {r8['queries']['kg_triples']}s |
| triples/sec @ local[32] | {r32['value']} | {r32['n_triples']} triples in {r32['queries']['kg_triples']}s |
| scaling efficiency (rate32/rate8)/4 | {eff:.3f} | gate: >= 0.8 |

Per-query wall-clock (sec):

| query | local[8] | local[32] |
|---|---|---|
"""
    for name in r8["queries"]:
        md += f"| {name} | {r8['queries'][name]} | {r32['queries'][name]} |\n"
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"rate8": r8["value"], "rate32": r32["value"],
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
