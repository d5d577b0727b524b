"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in ``pyspark.sql.functions`` only — no Python in the hot
path) and expressed so a DuckDB oracle is a direct SQL translation: language
identification (stopword n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + word-regex),
and document fingerprinting (normalized md5 + 64-bit prefix hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: tiny per-language marker lexicons for the n-gram language heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|shall)\b",
    "de": r"\b(der|die|und|das|den|ist|nicht|mit|für|ein)\b",
    "fr": r"\b(le|la|les|et|des|une|est|dans|pour|que)\b",
    "es": r"\b(el|los|las|y|una|es|en|por|para|que)\b",
}

STOPWORD_RE = LANG_MARKERS["en"]
WORD_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[^A-Za-z0-9_\s]"


def norm_text(col):
    """lower + collapse whitespace — the shared normalization."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def hash64(col):
    """Portable 64-bit hash: first 15 hex chars of md5 as a bigint.
    DuckDB twin: ``cast('0x' || substring(md5(x),1,15) as bigint)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish word/punct pieces per document."""
    ws = F.size(F.split(norm_text(F.col("text")), r" "))
    pieces = F.size(F.regexp_extract_all(
        F.col("text"), F.lit(fr"{WORD_RE}|{PUNCT_RE}"), F.lit(0)))
    return documents.select(
        "doc_id",
        ws.alias("ws_tokens"),
        pieces.alias("piece_tokens"),
        F.length("text").alias("chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]."""
    n_chars = F.length("text")
    words = F.size(F.regexp_extract_all(F.col("text"), F.lit(WORD_RE),
                                        F.lit(0)))
    puncts = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_RE),
                                         F.lit(0)))
    stops = F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                        F.lit(STOPWORD_RE), F.lit(0)))
    word_ratio = words / F.greatest(n_chars, F.lit(1))
    punct_ratio = puncts / F.greatest(words, F.lit(1))
    stop_ratio = stops / F.greatest(words, F.lit(1))
    score = (
        F.least(n_chars / F.lit(2000.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio, F.lit(1.0))) * 0.2
    )
    return documents.select(
        "doc_id",
        words.alias("n_words"),
        puncts.alias("n_puncts"),
        stops.alias("n_stopwords"),
        F.round(word_ratio, 6).alias("word_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-stopword language guess (argmax across lexicons, 'und' =
    undetermined on zero evidence; ties break by language code order)."""
    counts = {
        lang: F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                          F.lit(rx), F.lit(0)))
        for lang, rx in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        guess = guess.when(counts[lang] == best, F.lit(lang))
    return documents.select(
        "doc_id",
        *[counts[lang].alias(f"n_{lang}") for lang in sorted(LANG_MARKERS)],
        guess.alias("lang_guess"),
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Normalized-content fingerprints: md5 + 64-bit prefix hash."""
    normed = norm_text(F.col("text"))
    return documents.select(
        "doc_id",
        F.md5(normed).alias("fp_md5"),
        hash64(normed).alias("fp_h64"),
    )


def ngram_topk(documents: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word n-grams with counts — the standard corpus-
    composition / contamination probe.  Shuffle-aware: explode produces
    (ngram, 1) rows whose groupBy aggregates map-side (partial counts)
    before the single shuffle on the n-gram key; the top-k is a total-order
    sort of the (tiny) aggregate, not of the raw rows.  Ties broken by
    n-gram text for determinism."""
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(trim(regexp_replace("
        f"lower(text), '\\\\s+', ' ')), ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split(trim(regexp_replace(lower(text), "
        f"'\\\\s+', ' ')), ' '), i, {n})))")
    return (documents
            .filter(F.col("text").isNotNull())
            .select(F.explode(grams).alias("ngram"))
            .groupBy("ngram")
            .agg(F.count("*").alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
            .limit(k))


def tfidf_topk(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k distinguishing terms, TF-IDF-ranked.

    The rank key is integer-only — ``(tf desc, df asc, term asc)`` —
    which is order-equivalent to tf·idf for any strictly df-decreasing
    idf and, unlike a float score, cannot be flipped by engine
    libm/summation ulp differences (the value-hash gate compares exact
    bytes).  ``df`` is emitted so a consumer can apply any idf form
    downstream.

    Scale shape: tokenize+explode is narrow; the ``(doc_id, term)`` and
    ``(term)`` aggregates both combine map-side before their single
    shuffle; the tf⋈df join shuffles on the term key, whose zipf head is
    probe-side-only skew (the build side is exactly one row per term) —
    AQE's skew split replicates the build row, or broadcast ``df`` under
    a bounded-vocabulary contract.  The final top-k is a doc-partitioned
    window, never a global sort.
    """
    words = (documents
             .filter(F.col("text").isNotNull())
             .select("doc_id",
                     F.explode(F.expr(
                         "regexp_extract_all(lower(text), '[a-z]{3,}', 0)"
                     )).alias("term")))
    # tf feeds BOTH the df aggregate and the join probe; persist it so the
    # tokenize+explode+agg subtree (the dominant cost at corpus scale) is
    # computed once — same policy as dedup.py's minhash bucket persist.
    tf = (words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
          .persist())
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term"))
    return (tf.join(dfreq, "term")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "term", "tf", "df", "rk"))


def length_histogram(documents: DataFrame,
                     bucket_width: int = 500) -> DataFrame:
    """Document-length distribution in fixed-width buckets (the first
    filter-design plot of any corpus curation pass).  One narrow map +
    one tiny groupBy — no data leaves the scan shape."""
    bucket = (F.floor(F.length("text") / bucket_width)
              .cast("bigint").alias("bucket"))
    return (documents
            .select(bucket,
                    F.length("text").alias("len"))
            .groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.min("len").alias("min_len"),
                 F.max("len").alias("max_len"))
            .select(F.col("bucket"),
                    (F.col("bucket") * bucket_width).alias("bucket_lo"),
                    "n_docs", "min_len", "max_len")
            .orderBy("bucket"))


def inverted_index(documents: DataFrame, k: int = 5,
                   min_df: int = 2) -> DataFrame:
    """Capped inverted index: for each term with document frequency >=
    ``min_df``, the top-``k`` posting doc_ids ranked by term frequency
    (ties to the lower doc_id), serialized as a comma-joined string so
    the oracle comparison is order-exact.

    Scale shape: tokenize+explode is narrow; tf is one map-side-
    combinable groupBy; the per-term top-k is a row_number over the term
    key — hot boilerplate terms make that window sort-heavy at corpus
    scale, where the swap is a per-partition top-K reservoir
    (``dedup.py``'s groupBy-count + equi-join cap pattern) since only k
    survivors per term are ever needed.  The tf table feeds both the
    ranking and the df aggregate, so it is persisted once (the
    ``tfidf_topk`` policy).
    """
    words = (documents
             .filter(F.col("text").isNotNull())
             .select("doc_id",
                     F.explode(F.expr(
                         "regexp_extract_all(lower(text), '[a-z]{3,}', 0)"
                     )).alias("term")))
    tf = (words.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
          .persist())
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = (tf.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= k))
    postings = (top.groupBy("term")
                .agg(F.concat_ws(",", F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("rk", "doc_id"))),
                    lambda s: s["doc_id"].cast("string")))
                    .alias("postings")))
    return (postings.join(dfreq, "term")
            .filter(F.col("df") >= min_df)
            .select("term", "df", "postings")
            .orderBy("term"))
