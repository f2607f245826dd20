"""Snapshot store: Iceberg-shaped commit protocol over parquet (SURVEY §7 M6).

The reference's resumability is a Badger FileIndex consulted before each file
(/root/reference/internal/filewalker/prepost.go:19-40, internal/index/
fileindex.go:42-59). Our unit of resume is the *crawl round*: after each
round the full frontier state (pending, seen, bloom, fetch_log delta,
metrics) is committed as one atomic snapshot.

Commit protocol (the essential Iceberg semantics, self-contained because
this image ships no Iceberg jars — on a real cluster swap `_write_table` /
`load` for `df.writeTo(tbl).append()` / `spark.read.table(tbl)` plus
`CALL catalog.system.rollback_to_snapshot(...)` for resume; DDL in
docs/ICEBERG.md):

  1. data files land under data/v{N}/{table}/ (never rewritten),
  2. a manifest JSON naming every table's data path + row count + the
     round's metrics is written to a temp name,
  3. os.rename() to snapshots/{N:08d}.json — the atomic commit point.

A reader only ever sees the latest fully-renamed manifest, so a crawl
killed mid-round resumes from the previous committed round with no torn
state. Re-reading the parquet also truncates DataFrame lineage, which is
what keeps round N+1's plan O(1) instead of O(N).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- versions -----------------------------------------------------------
    def versions(self) -> list[int]:
        snaps = os.listdir(os.path.join(self.root, "snapshots"))
        return sorted(int(f.split(".")[0]) for f in snaps if f.endswith(".json"))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError("no committed snapshot")
        with open(os.path.join(self.root, "snapshots", f"{v:08d}.json")) as f:
            return json.load(f)

    # -- commit -------------------------------------------------------------
    def commit(self, tables: dict[str, DataFrame], meta: dict) -> int:
        v = (self.latest_version() or 0) + 1
        entry = {"version": v, "meta": meta, "tables": {}}
        for name, df in tables.items():
            path = os.path.join(self.root, "data", f"v{v}", name)
            df.write.mode("overwrite").parquet(path)
            entry["tables"][name] = {"path": path}
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "snapshots"), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        os.rename(tmp, os.path.join(self.root, "snapshots", f"{v:08d}.json"))
        return v

    # -- read ---------------------------------------------------------------
    def load(self, name: str, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        return self.spark.read.parquet(m["tables"][name]["path"])

    def has_table(self, name: str, version: int | None = None) -> bool:
        try:
            return name in self.manifest(version)["tables"]
        except FileNotFoundError:
            return False

    def meta(self, version: int | None = None) -> dict:
        return self.manifest(version)["meta"]
