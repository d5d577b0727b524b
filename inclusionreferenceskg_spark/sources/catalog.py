"""Table catalog: Iceberg-style partitioned tables with lineage manifests.

The production design targets Iceberg tables partitioned by
``(lang, bucket(url))``; no Iceberg runtime jar ships in this sandbox, so
this module provides the documented fallback (SURVEY §7.0): Parquet tables
with the identical logical schema and partition directory layout plus a
hand-written per-partition manifest under ``_lineage/`` — which the
checkpoint-resume path needs anyway.  The DataFrame-facing API is identical
either way (``writeTo(...).partitionedBy(lang, bucket(N, url))`` maps 1:1).

Manifest rows: ``(stage, partition, rows, checksum, wall_ms, written_at)``
— a resumed run reads the manifest and skips completed stages.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 16


def with_bucket(df: DataFrame, url_col: str = "url",
                n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Stable hash bucket column (the bucket(url) transform)."""
    return df.withColumn(
        "url_bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)))


class Catalog:
    """A directory-backed table catalog with lineage manifests."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, "_lineage", f"{name}.json")

    def is_complete(self, name: str) -> bool:
        return os.path.exists(self._manifest_path(name))

    def write(self, name: str, df: DataFrame,
              partition_by: Sequence[str] = (),
              bucket_url: Optional[str] = None,
              n_buckets: int = DEFAULT_BUCKETS,
              mode: str = "overwrite") -> DataFrame:
        """Write a stage table + manifest; returns the re-read DataFrame
        (cuts lineage like an Iceberg commit).  ``mode="append"`` is the
        incremental-snapshot path: the delta lands as new files under the
        same partition layout (an Iceberg fast-append) and the manifest
        is recommitted from the full table.
        ``mode="upsert"`` is the copy-on-write commit of the recrawl
        path (``plans.checkpoint.run_upsert``): physically an append —
        the caller has already deleted the replaced partition
        directories — but the snapshot log resets because files were
        removed and older snapshots would dangle."""
        t0 = time.perf_counter()
        cols = list(partition_by)
        if bucket_url:
            df = with_bucket(df, bucket_url, n_buckets)
            cols.append("url_bucket")
        writer = df.write.mode("append" if mode == "upsert" else mode)
        if cols:
            writer = writer.partitionBy(*cols)
        path = self.table_path(name)
        writer.parquet(path)

        spark = df.sparkSession
        try:
            out = spark.read.parquet(path)
        except Exception:
            # a partitionBy write of ZERO rows leaves no part files (only
            # _SUCCESS), so schema inference fails — commit an honest
            # empty table with the writer's schema instead of crashing
            # (an upsert whose changed pages produce no rows hits this)
            out = spark.createDataFrame([], df.schema)
        if cols:
            part_rows = [
                {"partition": "/".join(f"{c}={r[c]}" for c in cols),
                 "rows": r["rows"]}
                for r in out.groupBy(*cols)
                .agg(F.count("*").alias("rows")).collect()
            ]
        else:
            part_rows = [{"partition": "", "rows": out.count()}]
        hashable = [c for c, t in out.dtypes if not t.startswith("map")]
        checksum = out.agg(
            F.expr("bit_xor(xxhash64({}))".format(
                ", ".join(f"`{c}`" for c in hashable)))
            .alias("c")).first()["c"]
        manifest = {
            "stage": name,
            "partitions": part_rows,
            "rows": sum(p["rows"] for p in part_rows),
            "checksum": str(checksum),
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(manifest, f, indent=1)
        self._commit_snapshot(name, out, manifest, mode)
        return out

    # ------------------------------------------------ snapshot log
    # Iceberg-style time travel: every commit records the exact data-file
    # set, so a past snapshot is re-readable as long as its files survive.
    # Fast-appends (the incremental path) keep all prior files — full
    # history; an overwrite physically replaces files (this fallback has
    # no expire_snapshots grace period), so it resets the log.

    def _snapshot_dir(self, name: str) -> str:
        return os.path.join(self.root, "_lineage", f"{name}.snapshots")

    def _commit_snapshot(self, name: str, out: DataFrame,
                         manifest: dict, mode: str) -> None:
        # append keeps every prior file, so history stays readable; both
        # overwrite flavors physically delete replaced files (this
        # fallback has no expire_snapshots grace period), so they reset
        # the snapshot log rather than leave dangling versions
        d = self._snapshot_dir(name)
        if mode != "append" and os.path.isdir(d):
            for f in os.listdir(d):
                os.unlink(os.path.join(d, f))
        os.makedirs(d, exist_ok=True)
        version = len(os.listdir(d)) + 1
        snap = {
            "version": version,
            "rows": manifest["rows"],
            "checksum": manifest["checksum"],
            "files": sorted(out.inputFiles()),
        }
        with open(os.path.join(d, f"v{version}.json"), "w") as f:
            json.dump(snap, f, indent=1)

    def history(self, name: str) -> list:
        """Snapshot log (oldest first): [{version, rows, checksum}, ...]."""
        d = self._snapshot_dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d),
                         key=lambda s: int(s[1:-5])):
            with open(os.path.join(d, fn)) as f:
                s = json.load(f)
            out.append({k: s[k] for k in ("version", "rows", "checksum")})
        return out

    def read(self, spark: SparkSession, name: str,
             version: Optional[int] = None) -> DataFrame:
        """Read a stage table; ``version=k`` time-travels to snapshot k
        (partition columns recovered via basePath)."""
        if version is None:
            return spark.read.parquet(self.table_path(name))
        with open(os.path.join(self._snapshot_dir(name),
                               f"v{version}.json")) as f:
            snap = json.load(f)
        return (spark.read
                .option("basePath", self.table_path(name))
                .parquet(*snap["files"]))

    def manifest(self, name: str) -> dict:
        with open(self._manifest_path(name)) as f:
            return json.load(f)

    def committed_stages(self) -> list:
        """Names of every stage with a committed lineage manifest."""
        d = os.path.join(self.root, "_lineage")
        return [f[:-5] for f in os.listdir(d) if f.endswith(".json")]
