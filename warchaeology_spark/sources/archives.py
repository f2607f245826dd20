"""Archive mounting: zip / wacz / tar / tgz members as engine inputs.

Reference: /root/reference/internal/fs/fs.go:36-134 mounts archives as an
in-process virtual filesystem, dispatched by suffix at
internal/filewalker/filewalker.go:135-138. Spark's unit of input is files
on (shared) storage, so the idiomatic rendering is a distributed
PRE-EXTRACTION job: each archive becomes one task (binaryFile rows), its
members are written under ``staging_dir/<archive-stem>/``, and the
existing walker (sources/walker.py) then sees them as ordinary files —
``mount_archives -> walk_files -> validate/convert`` is the `warc validate
foo.wacz` analogue.

Scale shape: archives parallelize per-file (one task each, the same unit
the reference uses); member writes resolve ``staging_dir``'s scheme
through ``pyarrow.fs`` (ADVICE r2: plain open() landed members on each
executor's local disk while the manifest presented them as shared
storage). pyarrow — not the JVM Hadoop FileSystem — because the write
happens INSIDE a mapInPandas task, where the Python worker has no JVM
gateway; pyarrow.fs covers file/posix, s3:// (s3a:// normalized), and
hdfs:// where libhdfs is present, executor-side. WACZ is zip (the wacz
spec packages WARCs + indexes in a zip container), so .wacz routes
through the zip codec; .tar/.tgz/.tar.gz through tarfile.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyarrow import fs as pafs
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ZIP_SUFFIXES = (".zip", ".wacz")
TAR_SUFFIXES = (".tar", ".tgz", ".tar.gz")
ARCHIVE_SUFFIXES = ZIP_SUFFIXES + TAR_SUFFIXES

_OUT_SCHEMA = "archive string, member string, out_path string, n_bytes long"


def _safe_member(name: str) -> str | None:
    """Zip-slip guard: reject absolute or parent-escaping member names."""
    norm = posixpath.normpath(name)
    if norm.startswith("/") or norm.startswith("..") or norm == ".":
        return None
    return norm


def _staging_fs(staging_dir: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, root-path-inside-it) for the staging scheme.

    s3a:// (the Hadoop spelling) is normalized to pyarrow's s3://; a bare
    posix path short-circuits to LocalFileSystem without a URI probe."""
    p = staging_dir
    if p.startswith("s3a://"):
        p = "s3://" + p[len("s3a://"):]
    if "://" not in p and not p.startswith("file:"):
        return pafs.LocalFileSystem(), p
    return pafs.FileSystem.from_uri(p)


def _extract_one(path: str, content: bytes, staging_dir: str) -> Iterator[dict]:
    stem = os.path.splitext(os.path.basename(path))[0]
    if path.endswith(".tar.gz"):
        stem = os.path.basename(path)[: -len(".tar.gz")]
    fs, staging_root = _staging_fs(staging_dir)
    out_root = f"{staging_root.rstrip('/')}/{stem}"
    # manifest paths keep the caller's staging_dir spelling (s3a:// etc.)
    # so downstream Spark readers resolve them through Hadoop as usual
    manifest_root = f"{staging_dir.rstrip('/')}/{stem}"

    def _write(member: str, data: bytes) -> str:
        target = f"{out_root}/{member}"
        fs.create_dir(posixpath.dirname(target), recursive=True)
        with fs.open_output_stream(target) as out:
            out.write(data)
        return f"{manifest_root}/{member}"

    low = path.lower()
    if low.endswith(ZIP_SUFFIXES):
        with zipfile.ZipFile(io.BytesIO(content)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                member = _safe_member(info.filename)
                if member is None:
                    continue
                data = zf.read(info)
                out_path = _write(member, data)
                yield dict(archive=path, member=member, out_path=out_path, n_bytes=len(data))
    elif low.endswith(TAR_SUFFIXES):
        mode = "r:gz" if low.endswith((".tgz", ".tar.gz")) else "r:"
        with tarfile.open(fileobj=io.BytesIO(content), mode=mode) as tf:
            for info in tf.getmembers():
                if not info.isfile():
                    continue
                member = _safe_member(info.name)
                if member is None:
                    continue
                data = tf.extractfile(info).read()
                out_path = _write(member, data)
                yield dict(archive=path, member=member, out_path=out_path, n_bytes=len(data))


def mount_archives(
    spark: SparkSession,
    root: str,
    staging_dir: str,
    suffixes: tuple[str, ...] = ARCHIVE_SUFFIXES,
) -> DataFrame:
    """Extract every archive under ``root`` into ``staging_dir``; returns
    the member manifest (archive, member, out_path, n_bytes), materialized
    so the extraction has happened when this returns.

    One archive = one task (mapInPandas over binaryFile rows); members of
    distinct archives never collide (per-archive subdir). Duplicate
    archive paths are deduped like the walker does.
    """
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    cond = F.lit(False)
    for s in suffixes:
        cond = cond | F.lower(F.col("path")).endswith(s)
    archives = reader.load(root).filter(cond).dropDuplicates(["path"])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # binaryFile paths are file: URIs; strip the scheme for io
                p = r["path"]
                local = p[len("file:"):] if p.startswith("file:") else p
                rows.extend(_extract_one(local, bytes(r["content"]), staging_dir))
            yield pd.DataFrame(rows, columns=["archive", "member", "out_path", "n_bytes"])

    manifest = archives.select("path", "content").mapInPandas(extract, _OUT_SCHEMA)
    return manifest.localCheckpoint(eager=True)  # extraction is a side effect: run it now
