"""Training-data curation operators: PII detection/redaction, Gopher-style
repetition/quality filters, benchmark decontamination, and deterministic
stratified sampling.

These are the standard curation stages a web-scale (Common-Crawl-style)
training-data pipeline runs between raw ingest and tokenization — the
reference repo has no analog (it is a per-document KG pipeline), so the
semantics here follow the published recipes (Gopher / Rae et al. 2021
repetition filters; GPT-3 appendix-C style 13-gram decontamination) rather
than any reference file.

All four operators are JVM-only (built-in ``pyspark.sql.functions``, no
Python in the hot path) and each has a direct DuckDB oracle twin in
``queries.py``.  Scale notes per operator:

* ``pii_stats`` / ``gopher_quality`` — narrow per-row maps inside
  whole-stage codegen; no shuffle, trivially linear at 100 TB.
* ``decontaminate`` — the benchmark side is *bounded by construction*
  (benchmark suites are a few MB), so broadcasting its distinct gram
  hashes is the correct plan at any corpus size; the corpus side is a
  narrow explode + map-side-combinable count.
* ``stratified_sample`` — one shuffle on the (stratum) key with a
  row_number cutoff; per-stratum order is a uniform md5 so the sample is
  deterministic and reproducible across runs/cluster sizes.  At extreme
  per-stratum cardinality swap the window for a per-partition top-K
  (``F.max_by``-style reservoir) — noted, not needed at catalog K.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textstats import WORD_RE, hash64, norm_text

#: PII patterns — kept RE2-compatible (no lookaround, no backrefs) so the
#: DuckDB oracle uses the byte-identical pattern strings.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: GPT-3-style decontamination gram size
DECONTAM_N = 13
#: deterministic benchmark membership: doc_id % DECONTAM_MOD == 0
DECONTAM_MOD = 97


def _count(col, pattern: str):
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_stats(documents: DataFrame) -> DataFrame:
    """Per-document PII counts + the md5 of the redacted text.

    Redaction replaces emails, then phone-like digit runs, then IPv4
    literals with typed placeholders (order matters and the oracle applies
    the same order).  Emitting the *hash* of the redacted text rather than
    the text keeps the output narrow while still value-checking the full
    redaction byte-for-byte.
    """
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    n_emails = _count(t, EMAIL_RE)
    n_ipv4 = _count(t, IPV4_RE)
    # phones are counted on the email- then IP-redacted text — the same
    # prefix of the redaction pipeline that runs before <PHONE> replacement
    # — so a digit run inside an email local part is never double-counted
    # as a phone (it is already <EMAIL> by the time phone redaction runs)
    n_phones = _count(
        F.regexp_replace(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                         IPV4_RE, "<IP>"),
        PHONE_RE)
    return documents.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        ((n_emails + n_phones + n_ipv4) > 0).cast("int").alias("has_pii"),
        F.md5(redacted).alias("redacted_md5"),
    )


def gopher_quality(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition/quality features + keep flag.

    Features: word count, mean word length, duplicate-line fraction,
    ellipsis-line fraction.  ``gopher_keep`` applies the published
    thresholds (50 <= words <= 100k, 3 <= mean word len <= 10,
    dup-line fraction <= 0.3).
    """
    t = F.col("text")
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    dup_frac = F.when(n_lines <= F.lit(0), F.lit(0.0)).otherwise(
        F.round(1.0 - n_distinct / n_lines, 6))
    ell_frac = F.when(n_lines <= F.lit(0), F.lit(0.0)).otherwise(
        F.round(F.size(F.filter(lines, lambda x: x.endswith("...")))
                / n_lines, 6))
    n_words = _count(t, WORD_RE)
    word_chars = F.length(F.regexp_replace(t, r"[^A-Za-z0-9_]", ""))
    mean_wlen = F.round(word_chars / F.greatest(n_words, F.lit(1)), 6)
    keep = ((n_words >= 50) & (n_words <= 100000)
            & (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
            & (dup_frac <= 0.3)).cast("int")
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        dup_frac.alias("dup_line_frac"),
        ell_frac.alias("ellipsis_line_frac"),
        keep.alias("gopher_keep"),
    )


def _gram_hashes(n: int):
    """Column expr: distinct 64-bit hashes of the word n-grams of the
    normalized text (same slice-truncation semantics as the dedup
    shingler: docs shorter than n words yield one whole-text gram)."""
    words = F.split(norm_text(F.col("text")), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1))),
        lambda i: hash64(F.concat_ws(" ", F.slice(words, i, n))))
    return F.array_distinct(grams)


def decontaminate(documents: DataFrame, n: int = DECONTAM_N,
                  bench_mod: int = DECONTAM_MOD) -> DataFrame:
    """Benchmark decontamination: for every corpus document, the number of
    distinct word n-grams it shares with the benchmark set (docs with
    ``doc_id % bench_mod == 0`` stand in for an eval suite).  Docs with
    zero hits are absent — downstream, an anti-join on this output drops
    contaminated documents.

    The benchmark gram set is broadcast (bounded by construction); the
    corpus side is a narrow explode followed by a map-side-combinable
    count — no large shuffle at any corpus size.
    """
    is_bench = (F.col("doc_id") % bench_mod) == 0
    bench_grams = (documents.filter(is_bench)
                   .filter(F.col("text").isNotNull())
                   .select(F.explode(_gram_hashes(n)).alias("gram"))
                   .distinct())
    corpus = (documents.filter(~is_bench)
              .filter(F.col("text").isNotNull())
              .select("doc_id", F.explode(_gram_hashes(n)).alias("gram")))
    return (corpus.join(F.broadcast(bench_grams), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_grams"))
            .orderBy("doc_id"))


def stratified_sample(documents: DataFrame,
                      per_stratum: int = 3) -> DataFrame:
    """Deterministic stratified sample: the ``per_stratum`` docs with the
    smallest md5(doc_id) per (source, lang) stratum.  Uniform in
    expectation, byte-reproducible across runs and cluster sizes (no RNG
    state), and expressible identically in the DuckDB oracle."""
    w = (Window.partitionBy("source", "lang")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (documents
            .select("doc_id", "source", "lang",
                    F.row_number().over(w).alias("rk"))
            .filter(F.col("rk") <= per_stratum)
            .orderBy("source", "lang", "rk"))


def pack_shards(documents: DataFrame, budget: int = 512) -> DataFrame:
    """Sequence packing: assign each document to a fixed-token-budget
    training shard — the last pre-tokenization stage of a pretraining
    data pipeline.

    A document belongs to the shard in which it STARTS: shard_id =
    start_offset div budget, where start_offset is the running token
    total of all earlier documents (doc_id order) in the same source.
    Packing is per source (domain), which is how real pipelines shard
    anyway (domain-contiguous shards improve cache locality for
    curriculum mixing); the cumsum window therefore shuffles on the
    domain key and sorts only within a domain.  A GLOBAL pack would be a
    distributed prefix sum — two passes: per-partition token totals,
    broadcast the per-partition offsets, then a narrow per-partition
    cumsum — implemented as ``pack_shards_global``.  All arithmetic is
    integer, so the oracle comparison is hash-exact.
    """
    from .textstats import WORD_RE

    toks = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(WORD_RE), F.lit(0))).cast("bigint")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (documents
            .select("doc_id", "source", toks.alias("n_tokens"))
            .withColumn("start_off", start)
            .select("doc_id", "source", "n_tokens",
                    F.expr(f"start_off div {budget}").alias("shard_id"))
            .orderBy("source", "doc_id"))


def pack_shards_global(documents: DataFrame, budget: int = 512,
                       parts: int | None = None) -> DataFrame:
    """GLOBAL sequence packing over a total document order — the
    distributed prefix sum ``pack_shards`` only documents.

    A naive global cumsum would be ``Window.orderBy("doc_id")`` with no
    partition key: Spark plans that as a SINGLE-partition sort — the
    whole corpus through one task, a non-starter at any scale.  The
    scalable shape is the classic two-pass scan:

    1. range-partition by ``doc_id`` and sort within partitions (one
       exchange; partition p holds ids strictly below partition p+1);
    2. pass 1 — per-partition token totals (P rows, P = partition
       count, collected to the driver exactly like AQE's per-partition
       statistics) folded into exclusive per-partition offsets;
    3. pass 2 — a NARROW Arrow-batched cumsum per partition seeded with
       that partition's offset (state carries across the partition's
       record batches; no further shuffle).

    The output is invariant to where the range sampler happens to place
    partition boundaries (offsets are computed from actual partition
    contents), so the result is byte-reproducible across runs AND
    cluster sizes — the property that makes the DuckDB oracle
    (single-threaded global window) hash-exact against a 1000-executor
    run.
    """
    from .textstats import WORD_RE

    spark = documents.sparkSession
    if parts is None:
        parts = max(spark.sparkContext.defaultParallelism, 8)
    toks = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(WORD_RE), F.lit(0))).cast("bigint")
    base = (documents
            .select("doc_id", toks.alias("n_tokens"))
            .repartitionByRange(parts, "doc_id")
            .sortWithinPartitions("doc_id")
            .withColumn("pid", F.spark_partition_id())
            # pin the partition layout: pass 2's pid->offset seed must
            # see the exact partitioning pass 1 measured (a re-run of
            # the range sampler could legally draw different bounds)
            .localCheckpoint(eager=True))
    totals = {r["pid"]: r["tot"] for r in
              base.groupBy("pid").agg(F.sum("n_tokens").alias("tot"))
              .collect()}
    offsets, running = {}, 0
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]

    def _cumsum(batches):
        run = None  # exclusive running total at the current row
        for pdf in batches:
            if pdf.empty:
                continue
            if run is None:
                run = offsets.get(int(pdf["pid"].iloc[0]), 0)
            start = run + pdf["n_tokens"].cumsum().shift(1, fill_value=0)
            run += int(pdf["n_tokens"].sum())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "shard_id": (start // budget).astype("int64"),
            })

    out = base.mapInPandas(
        _cumsum, "doc_id bigint, n_tokens bigint, shard_id bigint")
    return out.orderBy("doc_id")
