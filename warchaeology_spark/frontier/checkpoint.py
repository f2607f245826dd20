"""Snapshot store: Iceberg-shaped commit protocol over parquet (SURVEY §7 M6).

The reference's resumability is a Badger FileIndex consulted before each file
(/root/reference/internal/filewalker/prepost.go:19-40, internal/index/
fileindex.go:42-59). Our unit of resume is the *crawl round*: after each
round the frontier state (pending, seen, bloom, fetch_log, metrics) is
committed as one atomic snapshot. Append-only tables (seen, fetch_log)
commit ONLY the round's delta — the manifest lists the delta-file chain
and ``load`` unions it, compacting chains past ``compact_after`` files.

Commit protocol (the essential Iceberg semantics — full-table commits are
Iceberg overwrite, delta commits are Iceberg ``append()``, chain
compaction is ``rewrite_data_files``; self-contained because this image
ships no Iceberg jars — on a real cluster swap `_write_table` / `load`
for `df.writeTo(tbl).append()` / `spark.read.table(tbl)` plus
`CALL catalog.system.rollback_to_snapshot(...)` for resume; DDL in
docs/ICEBERG.md):

  1. data files land under data/v{N}/{table}/ (never rewritten),
  2. a manifest JSON naming every table's data path(s) + the round's
     metrics is written to a temp name (never *.json),
  3. rename to snapshots/{N:08d}.json — the commit point.

ALL manifest/version IO goes through the Hadoop FileSystem API resolved
from the store root's scheme, so `--store hdfs://...` or `s3a://...` works
the same as a local path (the parquet data writes already did; previously
the manifests used os.* and silently landed on the driver's local disk for
remote roots). Atomicity: rename is atomic on HDFS/posix; on S3A it is
copy+delete — still safe here because the driver is the only manifest
writer and readers key on the fully-written final name.

A reader only ever sees the latest fully-renamed manifest, so a crawl
killed mid-round resumes from the previous committed round with no torn
state. Re-reading the parquet also truncates DataFrame lineage, which is
what keeps round N+1's plan O(1) instead of O(N).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

# a committed snapshot manifest is EXACTLY 8 digits + .json; anything else
# under snapshots/ (in-flight temps, editor droppings) is not a commit
_MANIFEST_RE = re.compile(r"\d{8}\.json")


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._Path = spark._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        self._fs.mkdirs(self._Path(f"{self.root}/snapshots"))
        self._fs.mkdirs(self._Path(f"{self.root}/data"))
        self._gc_tmp_manifests()

    def _gc_tmp_manifests(self) -> None:
        """Remove in-flight temp manifests left by a driver killed between
        write and rename. Safe: the commit point is the rename to the final
        8-digit name, so a *.json.tmp file is by definition uncommitted, and
        this store is single-writer (the driver)."""
        snaps = self._Path(f"{self.root}/snapshots")
        for st in self._fs.listStatus(snaps):
            name = st.getPath().getName()
            if name.endswith(".json.tmp"):
                self._fs.delete(st.getPath(), False)

    # -- hadoop-fs helpers ----------------------------------------------------
    def _read_text(self, path: str) -> str:
        stream = self._fs.open(self._Path(path))
        try:
            data = bytes(
                self.spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
            return data.decode("utf-8")
        finally:
            stream.close()

    def _write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- versions -----------------------------------------------------------
    def versions(self) -> list[int]:
        snaps = self._Path(f"{self.root}/snapshots")
        out = []
        for st in self._fs.listStatus(snaps):
            name = st.getPath().getName()
            if _MANIFEST_RE.fullmatch(name):
                out.append(int(name.split(".")[0]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError("no committed snapshot")
        return json.loads(self._read_text(f"{self.root}/snapshots/{v:08d}.json"))

    # -- commit -------------------------------------------------------------
    #: compact an append table's delta chain once it exceeds this many files
    compact_after = 16

    def commit(
        self,
        tables: dict[str, DataFrame],
        meta: dict,
        append: dict[str, DataFrame] | None = None,
    ) -> int:
        """Commit a snapshot. ``tables`` are rewritten in full; ``append``
        frames are DELTAS appended to that table's chain — the manifest
        lists the chain and ``load`` unions it, so per-round committed
        bytes for append-only tables (seen, fetch_log) are proportional
        to the ROUND DELTA, not the accumulated state (VERDICT r2 #4:
        full rewrites were O(rounds x state) write amplification —
        untenable at 10^10 seen keys). This is exactly Iceberg's
        ``append()`` fast path; chains longer than ``compact_after`` are
        compacted into one file set to bound read fan-in (Iceberg's
        rewrite_data_files), so manifest size and plan depth stay O(1)
        amortized."""
        v = (self.latest_version() or 0) + 1
        prev = self.manifest(v - 1)["tables"] if v > 1 else {}
        # snapshot semantics: tables not touched by this commit keep their
        # previous data (Iceberg: an append/overwrite on table X leaves
        # table Y's snapshot intact). Without this, a commit with an empty
        # round delta (e.g. a flush where no rounds logged fetches) would
        # silently DROP the previous chain from the manifest.
        entry = {"version": v, "meta": meta, "tables": dict(prev)}
        for name, df in tables.items():
            path = f"{self.root}/data/v{v}/{name}"
            df.write.mode("overwrite").parquet(path)
            entry["tables"][name] = {"paths": [path]}
        for name, df in (append or {}).items():
            path = f"{self.root}/data/v{v}/{name}"
            df.write.mode("overwrite").parquet(path)
            chain = list(self._paths_of(prev[name])) if name in prev else []
            chain.append(path)
            if len(chain) > self.compact_after:
                cpath = f"{self.root}/data/v{v}/{name}__compact"
                self.spark.read.parquet(*chain).write.mode("overwrite").parquet(cpath)
                chain = [cpath]
            entry["tables"][name] = {"paths": chain}
        # temp name must NOT end in .json: if the driver dies between write
        # and rename (or an S3A copy+delete rename half-fails), a leftover
        # that matched the manifest filter would poison versions() forever
        tmp = f"{self.root}/snapshots/{v:08d}.json.tmp"
        final = f"{self.root}/snapshots/{v:08d}.json"
        self._write_text(tmp, json.dumps(entry))
        if not self._fs.rename(self._Path(tmp), self._Path(final)):
            raise IOError(f"snapshot commit rename failed: {tmp} -> {final}")
        return v

    # -- read ---------------------------------------------------------------
    @staticmethod
    def _paths_of(table_entry: dict) -> list[str]:
        # pre-r3 manifests carried a single "path"; r3+ a "paths" chain
        return table_entry.get("paths") or [table_entry["path"]]

    def load(self, name: str, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        return self.spark.read.parquet(*self._paths_of(m["tables"][name]))

    def has_table(self, name: str, version: int | None = None) -> bool:
        try:
            return name in self.manifest(version)["tables"]
        except FileNotFoundError:
            return False

    def meta(self, version: int | None = None) -> dict:
        return self.manifest(version)["meta"]
