"""Evaluation operators (SURVEY §2.9 E1-E4).

* ``triple_prf`` — the E4 comparator (``evaluate_kg_creation.py:495-523``):
  set comparison of ``(subject, relation, object)`` strings excluding
  structural defines/contains edges, via two anti-joins (``exceptAll``
  semantics on distinct sets).
* ``detector_alignment_prf`` — the E2 comparator
  (``evaluate_reference_detector.py:18-72``): order-sensitive
  SequenceMatcher alignment of detected vs expected mention-text lists;
  per-document lists are small, so alignment runs driver-side on collected
  rows exactly like the reference (exactness beats scale here).
* ``StatAccumulator`` twin: a plain dataclass
  (``evaluation/stat_accumulator.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from difflib import SequenceMatcher
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F


@dataclass
class Stats:
    false_positives: int = 0
    false_negatives: int = 0
    n_detected: int = 0
    n_expected: int = 0
    extra: Dict[str, float] = field(default_factory=dict)

    def precision(self) -> float:
        return ((self.n_detected - self.false_positives) / self.n_detected
                if self.n_detected else 0.0)

    def recall(self) -> float:
        return ((self.n_expected - self.false_negatives) / self.n_expected
                if self.n_expected else 0.0)

    def f1(self) -> float:
        p, r = self.precision(), self.recall()
        return 2 * p * r / (p + r) if p + r else 0.0


def triple_prf(actual: DataFrame, expected: DataFrame) -> Stats:
    """E4: set-compare triples, structural edges excluded."""
    a = (actual
         .filter(~F.col("relation").isin("defines", "contains"))
         .select("subject", "relation", "object").distinct())
    e = expected.select("subject", "relation", "object").distinct()
    stats = Stats()
    stats.n_detected = a.count()
    stats.n_expected = e.count()
    stats.false_positives = a.join(e, ["subject", "relation", "object"],
                                   "left_anti").count()
    stats.false_negatives = e.join(a, ["subject", "relation", "object"],
                                   "left_anti").count()
    return stats


def detector_alignment_prf(detected: List[str],
                           expected: List[str]) -> Stats:
    """E2: order-sensitive opcode alignment of mention-text lists."""
    sm = SequenceMatcher(None, detected, expected)
    stats = Stats(n_detected=len(detected), n_expected=len(expected))
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag == "equal":
            continue
        stats.false_positives += i2 - i1
        stats.false_negatives += j2 - j1
    return stats
