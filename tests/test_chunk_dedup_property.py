"""Property test: chunk_dedup against a pure-Python simulator.

The operator's contract (global first-occurrence-wins at (doc_id, pos)
order, short tail chunks, whitespace normalization, per-doc reassembly)
is easy to state imperatively; hypothesis drives random small corpora
through both the Spark plan and the simulator and requires identical
output, catching boundary bugs (tie-breaks, tail chunks, fully-dropped
docs) that the fixed oracles might miss."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from inclusionreferenceskg_spark.operators.dedup import chunk_dedup

WORDS = ["aa", "bb", "cc", "dd"]
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, " \
              "n_chars bigint"


def _simulate(texts, width):
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        words = " ".join(text.split()).lower().split(" ")
        chunks = [" ".join(words[i:i + width])
                  for i in range(0, len(words), width)]
        kept = []
        for ch in chunks:
            if ch not in seen:
                seen.add(ch)
                kept.append(ch)
        out[doc_id] = (
            len(chunks), len(kept),
            round(len(kept) / len(chunks), 6),
            hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=9).map(" ".join),
    min_size=1, max_size=6))
def test_chunk_dedup_matches_simulator(spark, texts):
    width = 3
    d = spark.createDataFrame(
        [(i, t, "en", "prop", len(t)) for i, t in enumerate(texts)],
        DOCS_SCHEMA)
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.kept_ratio, r.kept_md5)
           for r in chunk_dedup(d, width=width).collect()}
    assert got == _simulate(texts, width)
