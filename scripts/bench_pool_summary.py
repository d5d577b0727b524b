"""Summarize a pooled watcher-legs JSONL into the round's scaling record.

Adjudication rule (same as BENCH/watcher_4v16_80k_r4_pinned_summary.json):
per-level pooled minima by wall-clock are the raw reading; the
meter-normalized reading scales each minimum leg's wall by its own
out-of-mask dilation (watcher-mean quantum during the leg vs the box's
absolute single-thread quantum floor).  Pooled minima are self-correcting
toward clean-vs-clean: dirty legs are never minima once a cleaner window
produces a faster leg, and a dirty floor is flagged by its own meter.

Usage: python3 scripts/bench_pool_summary.py LEGS.jsonl [OUT.json]
"""

import json
import sys

QUANTUM_FLOOR = 0.1075  # cleanest single-thread quantum ever sampled on this box


def summarize(path: str) -> dict:
    legs = [json.loads(line) for line in open(path) if line.strip()]
    if not legs:
        raise SystemExit(f"no legs in {path}")
    levels = sorted({l["cpus"] for l in legs})
    if len(levels) == 1:
        return _summarize_headline(legs, levels[0])
    if len(levels) != 2:
        raise SystemExit(f"expected 1 or 2 levels, got {levels}")
    lo_c, hi_c = levels
    docs = {l["docs"] for l in legs}
    if len(docs) != 1:
        raise SystemExit(f"mixed doc counts in pool: {docs}")

    def best(cpus: int) -> dict:
        pool = [l for l in legs if l["cpus"] == cpus]
        return min(pool, key=lambda l: l["kg_secs"]), len(pool)

    lo, n_lo = best(lo_c)
    hi, n_hi = best(hi_c)

    def meter_mean(leg: dict) -> float:
        return leg.get("watcher_quantum_during", {}).get("mean", QUANTUM_FLOOR)

    def normalized(leg: dict) -> float:
        return leg["kg_secs"] / (meter_mean(leg) / QUANTUM_FLOOR)

    raw = (lo["kg_secs"] / hi["kg_secs"]) / (hi_c / lo_c)
    norm = (normalized(lo) / normalized(hi)) / (hi_c / lo_c)
    return {
        "protocol": ("quantum-gated opportunistic pooled legs, "
                     "taskset-pinned to N cores"),
        "docs": lo["docs"],
        "lo": lo_c,
        "hi": hi_c,
        "n_legs_lo": n_lo,
        "n_legs_hi": n_hi,
        "rate_lo": lo["rate"],
        "rate_hi": hi["rate"],
        "kg_secs_lo": lo["kg_secs"],
        "kg_secs_hi": hi["kg_secs"],
        "watcher_mean_lo": meter_mean(lo),
        "watcher_mean_hi": meter_mean(hi),
        "quantum_floor": QUANTUM_FLOOR,
        "speedup": round(lo["kg_secs"] / hi["kg_secs"], 2),
        "efficiency_raw": round(raw, 3),
        "efficiency_meter_normalized": round(norm, 3),
    }


def _summarize_headline(legs: list, cpus: int) -> dict:
    """Single-level pool = the driver headline protocol run as pooled
    quantum-gated legs (r4 verdict task #3): the record is the fastest
    leg, with its own meter stamps so a burst-free floor is
    self-evidencing — the pooled answer to three rounds of
    load-hostage one-shot headline records."""
    best = min(legs, key=lambda l: l["kg_secs"])
    during = best.get("watcher_quantum_during", {}) or \
        best.get("cpu_quantum_during", {})
    return {
        "protocol": ("driver headline protocol (warm-started best-of-"
                     f"{best.get('trials', 1)}, local[{cpus}]) as "
                     "quantum-gated pooled legs; record = fastest leg"),
        "docs": best["docs"],
        "cpus": cpus,
        "n_legs": len(legs),
        "rate": best["rate"],
        "kg_secs": best["kg_secs"],
        "n_triples": best["n_triples"],
        "gate_quantum": best.get("gate_quantum"),
        "best_leg_meter_during": during,
        "quantum_floor": QUANTUM_FLOOR,
        "all_rates": sorted((l["rate"] for l in legs), reverse=True),
    }


if __name__ == "__main__":
    out = summarize(sys.argv[1])
    text = json.dumps(out, indent=1)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            f.write(text + "\n")
    print(text)
