"""Iceberg-style snapshot catalog (SURVEY §7, T5).

The Iceberg runtime jars are not present in the sandbox, so this module
implements the semantics we need from Iceberg — atomic per-superstep
snapshot commits with a lineage manifest, plus resume-from-latest —
as plain parquet directories:

    {root}/superstep=K/{table}.parquet      (written first)
    {root}/superstep=K/_MANIFEST.json       (written last = commit)

A snapshot is visible iff its manifest exists, so a job killed mid-write
leaves no partially-visible state and ``latest_superstep`` resumes from
the last complete commit (north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

On a real cluster the same call sites switch to
``df.writeTo("catalog.db.tbl").overwritePartitions()`` — the engine
only talks to this thin interface.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, superstep: int) -> str:
        return os.path.join(self.root, f"superstep={superstep}")

    def commit(self, superstep: int, tables: dict[str, DataFrame],
               lineage: Optional[dict] = None,
               bucket: Optional[dict] = None) -> None:
        """Write all tables, then the manifest (the commit point).

        ``bucket={name: (cols, n_buckets)}`` writes that table
        hash-bucketed (Spark ``bucketBy`` + an external table at the
        snapshot path), so a same-session read satisfies hash-
        distribution requirements on the bucket columns WITHOUT an
        Exchange — the frontier drain window (partitionBy job_id) reads
        pre-bucketed data shuffle-free (SURVEY §7.6). Bucket metadata
        lives in the session metastore; a fresh session reading the
        bare parquet path falls back to a shuffled (still correct)
        plan — on a real cluster the persistent catalog (Iceberg/Hive)
        keeps it across sessions."""
        d = self._dir(superstep)
        os.makedirs(d, exist_ok=True)
        manifest: dict = {
            "superstep": superstep,
            "committed_at": time.time(),
            "tables": {},
            "lineage": lineage or {},
        }
        bucket = bucket or {}
        for name, df in tables.items():
            path = os.path.join(d, f"{name}.parquet")
            entry = {"path": path}
            if name in bucket:
                cols, n_buckets = bucket[name]
                tbl = self._table_name(superstep, name)
                df.sparkSession.sql(f"DROP TABLE IF EXISTS {tbl}")
                (
                    df.write.mode("overwrite")
                    .format("parquet")
                    .bucketBy(n_buckets, *cols)
                    .sortBy(*cols)
                    .option("path", path)
                    .saveAsTable(tbl)
                )
                entry["bucketed"] = {
                    "table": tbl, "cols": list(cols), "n": n_buckets
                }
            else:
                df.write.mode("overwrite").parquet(path)
            # per-partition lineage: file list is the parquet footprint
            entry["files"] = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            manifest["tables"][name] = entry
        tmp = os.path.join(d, "_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))

    def _table_name(self, superstep: int, name: str) -> str:
        import hashlib
        import re

        root = os.path.abspath(self.root)
        slug = re.sub(r"[^a-zA-Z0-9_]", "_", os.path.basename(root))
        # two catalogs whose roots share a basename (any pair of
        # '<tmp>/snap' dirs) must NOT share metastore table names —
        # the later commit would DROP+recreate the shared name and the
        # earlier catalog would silently read the other's rows
        h = hashlib.md5(root.encode("utf-8")).hexdigest()[:8]
        return f"snapcat_{slug}_{h}_s{superstep}_{name}"

    def latest_superstep(self) -> Optional[int]:
        best = None
        if not os.path.isdir(self.root):
            return None
        for entry in os.listdir(self.root):
            if not entry.startswith("superstep="):
                continue
            if not os.path.exists(
                os.path.join(self.root, entry, "_MANIFEST.json")
            ):
                continue
            k = int(entry.split("=", 1)[1])
            best = k if best is None or k > best else best
        return best

    def read(self, spark: SparkSession, superstep: int, name: str) -> DataFrame:
        """Read a snapshot table; a bucketed table is read THROUGH the
        metastore entry when present (bucketed scan, no Exchange on the
        bucket key), else straight from parquet."""
        try:
            m = self.manifest(superstep)
            entry = m["tables"].get(name, {})
            b = entry.get("bucketed")
            if (
                b
                and spark.catalog.tableExists(b["table"])
                and self._location_matches(spark, b["table"], entry["path"])
            ):
                return spark.table(b["table"])
        except FileNotFoundError:
            pass
        return spark.read.parquet(
            os.path.join(self._dir(superstep), f"{name}.parquet")
        )

    @staticmethod
    def _location_matches(spark: SparkSession, tbl: str, path: str) -> bool:
        """Belt-and-braces vs metastore-name collisions: only trust the
        bucketed table if it actually points at THIS snapshot's files."""
        try:
            rows = spark.sql(f"DESCRIBE FORMATTED {tbl}").collect()
            loc = next(
                (r.data_type for r in rows
                 if r.col_name.strip() == "Location"), None,
            )
            if loc is None:
                return False
            norm = os.path.abspath(loc.removeprefix("file:"))
            return norm == os.path.abspath(path)
        except Exception:
            return False

    def manifest(self, superstep: int) -> dict:
        with open(os.path.join(self._dir(superstep), "_MANIFEST.json")) as fh:
            return json.load(fh)

    # ------------------------------------------------------------ compaction
    def _compact_dir(self, upto: int) -> str:
        return os.path.join(self.root, f"compact={upto}")

    def compact(self, spark: SparkSession, upto: int,
                tables: tuple = ("crawled_delta", "metrics_delta",
                                 "seen_delta"),
                drop_deltas: bool = False) -> None:
        """Merge the append-only delta ``tables`` of supersteps
        0..``upto`` into ONE consolidated snapshot (the Iceberg
        rewrite_data_files analogue). After hundreds of supersteps a
        resume otherwise opens O(steps) per-step delta directories —
        this caps it at one base read + the post-compaction tail.

        Same commit discipline as ``commit``: data first, manifest
        last, so a crash mid-compaction leaves the per-step deltas
        authoritative. ``drop_deltas=True`` removes the covered delta
        parquet files AFTER the manifest lands (storage reclaim; the
        frontier/job_state full-state snapshots are never touched).

        Compactions COMPOSE: a later, larger compaction starts from
        the newest committed compaction's base and unions only the
        post-base per-step deltas (mirroring the resume path), so it
        keeps working after an earlier ``drop_deltas=True`` removed
        the covered delta directories — and stays O(tail), not
        O(steps), even when they still exist.
        """
        base = self.latest_compaction()
        if base is not None and base >= upto:
            return  # already covered — and never overwrite our own input
        base_tables: dict = {}
        if base is not None:
            with open(os.path.join(self._compact_dir(base),
                                   "_MANIFEST.json")) as fh:
                base_tables = json.load(fh)["tables"]
        d = self._compact_dir(upto)
        os.makedirs(d, exist_ok=True)
        manifest: dict = {"upto": upto, "committed_at": time.time(),
                          "tables": {}}
        for name in tables:
            df = None
            start = 0
            if name in base_tables:
                df = self.read_compacted(spark, base, name)
                start = base + 1
            for k in range(start, upto + 1):
                part = self.read(spark, k, name)
                df = part if df is None else df.unionByName(part)
            path = os.path.join(d, f"{name}.parquet")
            df.write.mode("overwrite").parquet(path)
            manifest["tables"][name] = {
                "path": path,
                "files": sorted(
                    f for f in os.listdir(path) if f.endswith(".parquet")
                ),
            }
        tmp = os.path.join(d, "_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, os.path.join(d, "_MANIFEST.json"))
        if drop_deltas:
            import shutil

            for name in tables:
                for k in range(upto + 1):
                    p = os.path.join(self._dir(k), f"{name}.parquet")
                    if os.path.isdir(p):
                        shutil.rmtree(p)

    def latest_compaction(self) -> Optional[int]:
        best = None
        if not os.path.isdir(self.root):
            return None
        for entry in os.listdir(self.root):
            if not entry.startswith("compact="):
                continue
            if not os.path.exists(
                os.path.join(self.root, entry, "_MANIFEST.json")
            ):
                continue
            k = int(entry.split("=", 1)[1])
            best = k if best is None or k > best else best
        return best

    def read_compacted(self, spark: SparkSession, upto: int,
                       name: str) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self._compact_dir(upto), f"{name}.parquet")
        )
