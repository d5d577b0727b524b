"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the full embedding table, JVM-side dot products via
  higher-order array functions (no Python, no UDF);
* LSH-bucketed ANN — the scale path: deterministic signed-random-projection
  hyperplanes derived from the portable md5 hash (no RNG, resumable),
  bucket join + rerank inside buckets only;
* IVF ANN — the data-adaptive scale path: a deterministic centroid sample
  partitions the corpus into cells (argmax cosine, computed entirely inside
  codegen against one broadcast centroid array — zero shuffle on the big
  side), queries probe their ``n_probe`` nearest cells and rerank only
  there.

At 10^12 rows the brute force is per-query O(n); the LSH/IVF variants
shuffle once on bucket/cell keys and rerank O(bucket) — the standard
IVF/LSH trade.
"""

from __future__ import annotations

import math
from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

#: dimensionality of the ``embeddings.embedding`` column (testdata contract,
#: TESTDATA.md).  Passed explicitly so building a plan never runs a driver-side
#: job to sniff the dimension from data.
EMB_DIM = 64


def planes_for(n_rows: int, target_bucket: int = 1024) -> int:
    """SRP plane count sized to the corpus: enough hyperplanes that the
    EXPECTED bucket population is ``target_bucket`` (2^planes buckets).
    At 10^12 vectors this yields ~30 planes instead of a fixed handful,
    keeping the per-bucket rerank bounded."""
    if n_rows <= target_bucket:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket)))


def corpus_rows(sf_dir: str, table: str = "embeddings") -> int:
    """Corpus row count from parquet footer metadata — the sandbox
    stand-in for an Iceberg snapshot manifest's ``total-records``.  A pure
    driver-side file-metadata read: no Spark job, no data scan, so plan
    construction stays free (test_no_driver_job_at_plan_build).  This is
    what feeds ``planes_for`` in the sized ANN path."""
    import glob
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    files = (sorted(glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _dot(a, b):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                  f"cast(0 as double), (acc, v) -> acc + v)")


def _norm(col):
    return F.sqrt(F.expr(
        f"aggregate({col}, cast(0 as double), (acc, v) -> acc + v * v)"))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """Exact top-k neighbours by cosine for the first ``n_queries`` vectors
    (query set broadcast; candidates never leave the JVM)."""
    queries = (embeddings
               .filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q")))
    cands = embeddings.select("vec_id", "embedding")
    joined = (cands.join(F.broadcast(queries),
                         F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot("q", "embedding")
                          / (_norm("q") * _norm("embedding"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id",
                    F.round("cosine", 4).alias("cosine")))


def _hyperplane(dim: int, plane: int) -> List[float]:
    """Deterministic pseudo-random unit hyperplane: component j is derived
    from md5(plane:j) mapped to [-1, 1].  No RNG -> identical across runs,
    executors and engines."""
    import hashlib
    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane}:{j}".encode()).hexdigest()[:8], 16)
        comps.append((h / float(0xFFFFFFFF)) * 2.0 - 1.0)
    n = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / n for c in comps]


def srp_bucket(embeddings: DataFrame, n_planes: int = 8,
               dim: int = EMB_DIM) -> DataFrame:
    """Signed-random-projection bucket id per vector (JVM-side dots against
    literal hyperplanes).  ``dim`` comes from the table contract (or
    ``planes_for``-style sizing code) — never sniffed from the data, so
    constructing the plan costs zero driver-side jobs."""
    sig = F.lit(0).cast("int")
    for p in range(n_planes):
        plane_sql = "array({})".format(",".join(
            f"cast({c!r} as double)" for c in _hyperplane(dim, p)))
        dot = F.expr(
            f"aggregate(zip_with(embedding, {plane_sql}, (x, y) -> x * y), "
            f"cast(0 as double), (acc, v) -> acc + v)")
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return embeddings.select("vec_id", "embedding",
                             sig.alias("bucket"))


def _cap_buckets(bucketed: DataFrame,
                 max_bucket: Optional[int]) -> DataFrame:
    """Drop buckets larger than ``max_bucket`` (boilerplate / hot-bucket
    guard, same policy as minhash LSH's cap — an explicit, documented drop
    rather than an unbounded quadratic rerank)."""
    if max_bucket is None:
        return bucketed
    # groupBy-count + equi-join on the under-cap keys, NOT
    # count-over-window: a window shuffles every row of a hot boilerplate
    # bucket into ONE sort task, while groupBy does map-side partial
    # aggregation and the join is AQE-skew-splittable — the same skew-safe
    # pattern as dedup.minhash_lsh_pairs (operators/dedup.py).
    ok_keys = (bucketed.groupBy("bucket")
               .agg(F.count("*").alias("bucket_size"))
               .filter(F.col("bucket_size") <= max_bucket)
               .select("bucket"))
    return bucketed.join(ok_keys, "bucket")


def ann_lsh_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5,
                 n_planes: int = 6,
                 max_bucket: Optional[int] = 100_000) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket,
    exact cosine rerank inside the bucket.  Candidate buckets above
    ``max_bucket`` are dropped; queries keep their bucket id regardless so
    an oversize bucket degrades that query's recall rather than silently
    exploding the rerank."""
    bucketed = srp_bucket(embeddings, n_planes)
    queries = (bucketed.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q"),
                       F.col("bucket")))
    joined = (_cap_buckets(bucketed, max_bucket)
              .join(F.broadcast(queries), "bucket")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot("q", "embedding")
                          / (_norm("q") * _norm("embedding"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id",
                    F.round("cosine", 4).alias("cosine")))


def ivf_centroids(embeddings: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic centroid sample: the ``n_cells`` vectors with the
    smallest ``md5(vec_id)`` — a portable, RNG-free stand-in for a k-means
    sample (same role as the reference-free SRP hyperplanes above).
    ``orderBy().limit()`` compiles to TakeOrdered (per-partition top-K +
    driver merge of K·parts rows), so centroid selection never sorts the
    corpus; the row_number window then runs on the K-row result only."""
    sampled = (embeddings
               .select("vec_id", "embedding",
                       F.md5(F.col("vec_id").cast("string")).alias("h"))
               .orderBy("h", "vec_id")
               .limit(n_cells))
    w = Window.orderBy("h", "vec_id")
    return (sampled
            .withColumn("cell_id", F.row_number().over(w) - 1)
            .select("cell_id", F.col("embedding").alias("c")))


#: per-centroid cosine scores as an array<struct<cos,negcell>> — evaluated
#: against the single broadcast ``cents`` array so cell assignment is pure
#: projection (whole-stage codegen, zero shuffle).  ``negcell`` makes the
#: lexicographic array_max tie-break toward the SMALLEST cell id, matching
#: the oracle's ``order by cos desc, cell_id asc``.
_SCORED_CELLS = (
    "transform(cents, ct -> named_struct("
    "'cos', aggregate(zip_with(embedding, ct.c, (x, y) -> x * y), "
    "cast(0 as double), (acc, v) -> acc + v) / "
    "(sqrt(aggregate(embedding, cast(0 as double), "
    "(acc, v) -> acc + v * v)) * "
    "sqrt(aggregate(ct.c, cast(0 as double), (acc, v) -> acc + v * v))), "
    "'negcell', -ct.cell_id))")


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine.

    The centroid table is collapsed to a one-row array and broadcast; the
    argmax runs as ``array_max(transform(...))`` inside codegen, so the
    corpus side needs no shuffle, no window, and no groupBy — the only
    cost at 10^12 rows is the O(K) per-row score loop, which is the
    irreducible IVF assignment work."""
    cents_row = centroids.agg(F.collect_list(
        F.struct("cell_id", "c")).alias("cents"))
    return (embeddings.join(F.broadcast(cents_row))
            .withColumn("best", F.array_max(F.expr(_SCORED_CELLS)))
            .select("vec_id", "embedding",
                    (-F.col("best.negcell")).alias("cell_id")))


def ivf_probes(embeddings: DataFrame, centroids: DataFrame,
               n_queries: int, n_probe: int) -> DataFrame:
    """Each query's ``n_probe`` nearest cells: sort the per-centroid score
    array descending (reverse of the ascending lexicographic sort — ties
    fall to the smaller cell id, as in assignment) and explode the head."""
    cents_row = centroids.agg(F.collect_list(
        F.struct("cell_id", "c")).alias("cents"))
    return (embeddings
            .filter(F.col("vec_id") < n_queries)
            .join(F.broadcast(cents_row))
            .withColumn("s", F.explode(F.expr(
                f"slice(reverse(array_sort({_SCORED_CELLS})), 1, "
                f"{int(n_probe)})")))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q"),
                    (-F.col("s.negcell")).alias("cell_id")))


def ann_ivf_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 5,
                 n_cells: int = 16, n_probe: int = 3,
                 max_cell: Optional[int] = 100_000) -> DataFrame:
    """IVF approximate top-k: candidates restricted to the query's
    ``n_probe`` nearest centroid cells, exact cosine rerank inside them.

    Every vector lives in exactly one cell, so multi-probe never produces
    duplicate candidates and needs no distinct.  Cells above ``max_cell``
    are dropped from the CANDIDATE side only (the hot-cell guard mirrored
    from the LSH/minhash caps); queries keep probing regardless, so an
    oversize cell degrades recall instead of exploding the rerank."""
    cents = ivf_centroids(embeddings, n_cells)
    assigned = ivf_assign(embeddings, cents)
    if max_cell is not None:
        # under-cap cell ids via groupBy-count (map-side combinable; the
        # old count-over-window funneled every row of a hot cell into one
        # sort task).  The key set is bounded by n_cells, so the probe
        # join broadcasts — the corpus side needs no shuffle at all; the
        # price is a second evaluation of the O(K)-per-row assignment
        # projection on the agg branch, which is narrow and
        # whole-stage-codegen (strictly cheaper than shuffling the corpus).
        ok_cells = (assigned.groupBy("cell_id")
                    .agg(F.count("*").alias("cell_size"))
                    .filter(F.col("cell_size") <= max_cell)
                    .select("cell_id"))
        assigned = assigned.join(F.broadcast(ok_cells), "cell_id")
    probes = ivf_probes(embeddings, cents, n_queries, n_probe)
    joined = (assigned.join(F.broadcast(probes), "cell_id")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot("q", "embedding")
                          / (_norm("q") * _norm("embedding"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "vec_id",
                    F.round("cosine", 4).alias("cosine")))


def embedding_neardup_pairs(embeddings: DataFrame,
                            threshold: float = 0.95,
                            n_planes: int = 6,
                            max_bucket: Optional[int] = 100_000
                            ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucketed by SRP signature
    (exact cosines computed only within buckets; buckets above
    ``max_bucket`` dropped, mirroring the minhash LSH cap)."""
    bucketed = _cap_buckets(srp_bucket(embeddings, n_planes), max_bucket)
    a = bucketed.select("bucket", F.col("vec_id").alias("a"),
                        F.col("embedding").alias("ea"))
    b = bucketed.select("bucket", F.col("vec_id").alias("b"),
                        F.col("embedding").alias("eb"))
    return (a.join(b, "bucket")
            .filter(F.col("a") < F.col("b"))
            .withColumn("cosine", _dot("ea", "eb") / (_norm("ea")
                                                      * _norm("eb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 4).alias("cosine")))
