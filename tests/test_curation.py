"""Curation operators on crafted rows: the catalog's synthetic documents
contain no PII / newlines / exact dups, so these tests plant the phenomena
the operators exist to catch (the DuckDB oracle twins in test_oracles.py
cover engine parity on the real tables)."""

from __future__ import annotations

from inclusionreferenceskg_spark.operators import curation

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, " \
              "n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "crafted", len(t)) for i, t in rows], DOCS_SCHEMA)


def test_pii_counts_and_redaction(spark):
    d = _docs(spark, [
        (0, "contact alice@example.com or bob.smith+x@sub.example.org"),
        (1, "call +49 171 555 0123 or 030-1234567 today"),
        (2, "server at 10.0.0.1 and 192.168.1.254 (port 8080)"),
        (3, "nothing sensitive here"),
    ])
    rows = {r["doc_id"]: r for r in curation.pii_stats(d).collect()}
    assert rows[0]["n_emails"] == 2 and rows[0]["has_pii"] == 1
    assert rows[1]["n_phones"] >= 1 and rows[1]["has_pii"] == 1
    assert rows[2]["n_ipv4"] == 2 and rows[2]["n_phones"] == 0
    assert rows[3]["has_pii"] == 0

    # redaction is total: the placeholder hash differs from the raw hash
    # exactly when PII was present
    from pyspark.sql import functions as F
    raw = {r["doc_id"]: r["m"]
           for r in d.select("doc_id", F.md5("text").alias("m")).collect()}
    for i in (0, 1, 2):
        assert rows[i]["redacted_md5"] != raw[i]
    assert rows[3]["redacted_md5"] == raw[3]


def test_gopher_repetition_features(spark):
    dup_heavy = "\n".join(["the same boilerplate line"] * 8
                          + ["a unique closing line"])
    clean = " ".join(f"word{i} filler text goes here" for i in range(20))
    elliptical = "read more...\nclick here...\nfull article"
    d = _docs(spark, [(0, dup_heavy), (1, clean), (2, elliptical), (3, "")])
    rows = {r["doc_id"]: r for r in curation.gopher_quality(d).collect()}
    assert rows[0]["dup_line_frac"] > 0.7
    assert rows[0]["gopher_keep"] == 0          # repetition kills it
    assert rows[1]["dup_line_frac"] == 0.0
    assert rows[1]["gopher_keep"] == 1
    assert abs(rows[2]["ellipsis_line_frac"] - 2 / 3) < 1e-6
    assert rows[3]["n_words"] == 0 and rows[3]["gopher_keep"] == 0


def test_decontaminate_flags_planted_overlap(spark):
    bench_text = " ".join(f"tok{i}" for i in range(30))
    # doc 97*2 is benchmark (id % 97 == 0); doc 5 copies 15 consecutive
    # benchmark tokens (=> three distinct 13-grams), doc 6 shares nothing
    contaminated = ("leading words then "
                    + " ".join(f"tok{i}" for i in range(10, 25))
                    + " trailing words")
    d = _docs(spark, [(0, bench_text), (5, contaminated),
                      (6, "completely disjoint vocabulary entirely")])
    hits = {r["doc_id"]: r["n_hit_grams"]
            for r in curation.decontaminate(d).collect()}
    assert hits == {5: 3}


def test_stratified_sample_deterministic(spark):
    rows = [(i, f"text {i}", ["en", "de"][i % 2], ["web", "news"][i // 8],
             10) for i in range(16)]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = curation.stratified_sample(d, per_stratum=2).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault((r["source"], r["lang"]), []).append(r)
    assert set(by_stratum) == {("web", "en"), ("web", "de"),
                               ("news", "en"), ("news", "de")}
    assert all(len(v) == 2 for v in by_stratum.values())
    # byte-reproducible: a second run picks the identical docs
    again = curation.stratified_sample(d, per_stratum=2).collect()
    assert sorted(r["doc_id"] for r in out) == \
        sorted(r["doc_id"] for r in again)


def test_chunk_dedup_first_occurrence_wins(spark):
    from inclusionreferenceskg_spark.operators.dedup import chunk_dedup
    # width=3: doc 0 = [A B], doc 1 = [B C], doc 2 = [A A] (internal dup)
    a, b, c = "w1 w2 w3", "x1 x2 x3", "y1 y2 y3"
    d = _docs(spark, [(0, f"{a} {b}"), (1, f"{b} {c}"), (2, f"{a} {a}")])
    rows = {r.doc_id: r for r in chunk_dedup(d, width=3).collect()}
    assert (rows[0].n_chunks, rows[0].n_kept) == (2, 2)  # first sees both
    assert (rows[1].n_chunks, rows[1].n_kept) == (2, 1)  # B already seen
    assert (rows[2].n_chunks, rows[2].n_kept) == (2, 0)  # A seen in doc 0
    import hashlib
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[0].kept_md5 == md5(f"{a} {b}")
    assert rows[1].kept_md5 == md5(c)
    assert rows[2].kept_md5 == md5("")  # fully-duplicate doc reassembles empty
    assert rows[2].kept_ratio == 0.0 and rows[0].kept_ratio == 1.0


def test_chunk_dedup_partial_tail_chunk(spark):
    from inclusionreferenceskg_spark.operators.dedup import chunk_dedup
    # 5 words at width=3 -> chunks of 3 and 2; whitespace is normalized
    d = _docs(spark, [(0, "  p1  p2 p3   p4 p5 ")])
    row = chunk_dedup(d, width=3).collect()[0]
    assert (row.n_chunks, row.n_kept) == (2, 2)
    import hashlib
    assert row.kept_md5 == hashlib.md5(b"p1 p2 p3 p4 p5").hexdigest()


def test_boilerplate_by_source_counts(spark):
    from inclusionreferenceskg_spark.operators.dedup import (
        boilerplate_by_source)
    # srcA: chunk "h1 h2 h3" shared by both docs (boilerplate), tails unique;
    # srcB: same chunk appears once only -> NOT boilerplate there
    rows = [(0, "h1 h2 h3 a1 a2 a3", "srcA"), (1, "h1 h2 h3 b1 b2 b3", "srcA"),
            (2, "h1 h2 h3 c1 c2 c3", "srcB")]
    d = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOCS_SCHEMA)
    out = {r.source: r for r in boilerplate_by_source(d, width=3).collect()}
    a, b = out["srcA"], out["srcB"]
    assert (a.n_chunks, a.n_distinct_chunks, a.n_boiler) == (4, 3, 2)
    assert a.boiler_ratio == 0.5
    assert (b.n_chunks, b.n_boiler) == (2, 0)


def test_incremental_new_docs_anti_join(spark):
    from inclusionreferenceskg_spark.operators.dedup import (
        incremental_new_docs)
    seen_src = _docs(spark, [(0, "alpha beta"), (1, "gamma delta")])
    from inclusionreferenceskg_spark.operators.dedup import exact_duplicates
    seen = exact_duplicates(seen_src).select("text_hash")
    # doc 10 duplicates doc 0 (post-normalization), doc 11 is new
    new = _docs(spark, [(10, "  ALPHA   beta "), (11, "epsilon zeta")])
    out = incremental_new_docs(new, seen).collect()
    assert [r.doc_id for r in out] == [11]


def test_pack_shards_global_matches_serial_and_is_partition_invariant(spark):
    """The two-pass distributed prefix sum must equal the serial global
    cumsum and be invariant to the range-partition count.  1500 docs in
    shuffled insert order with 3 partitions forces (a) multiple Arrow
    record batches per partition (session caps batches at 256 rows), so
    the cross-batch running state is exercised, and (b) rows arriving
    unsorted, so the range sort is load-bearing."""
    import random

    rng = random.Random(7)
    rows = [(i, " ".join("tok" for _ in range(rng.randint(0, 40))))
            for i in range(1500)]
    rng.shuffle(rows)
    d = _docs(spark, rows)

    # serial expectation: exclusive cumsum in doc_id order, div 512
    toks = {i: (0 if not t else len(t.split())) for i, t in rows}
    run, expect = 0, {}
    for i in sorted(toks):
        expect[i] = run // 512
        run += toks[i]

    for parts in (3, 17):
        out = curation.pack_shards_global(d, parts=parts).collect()
        assert [r.doc_id for r in out] == sorted(toks)
        got = {r.doc_id: r.shard_id for r in out}
        assert got == expect, f"parts={parts}"
