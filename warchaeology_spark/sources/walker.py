"""File walker (SURVEY §2 S4/S5, G4).

Reference: /root/reference/internal/filewalker/filewalker.go:70-153 —
recursive walk, suffix filtering (:58-68), duplicate-path skip
(:99-104,144-149), plus the source-file list at
cmd/internal/flag/source_file_flags.go:58-84.

Spark-first: the cluster file index does the recursion
(``recursiveFileLookup``), ``pathGlobFilter`` is the suffix filter, and
duplicate-path skip is ``dropDuplicates`` on the logical path. Archive
mounting (zip/wacz/tar) is an ingest-time concern (SURVEY marks it env) —
pre-extraction happens before the table exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def walk_files(
    spark: SparkSession,
    root: str,
    suffixes: tuple[str, ...] = (),
    recursive: bool = True,
) -> DataFrame:
    """-> (path, length, modificationTime) for every matching file.

    Uses the binaryFile source WITHOUT reading content (Catalyst prunes the
    ``content`` column away, so this is a pure file-index listing).
    """
    reader = spark.read.format("binaryFile")
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if len(suffixes) == 1:
        reader = reader.option("pathGlobFilter", f"*{suffixes[0]}")
    df = reader.load(root).select("path", "length", "modificationTime")
    if len(suffixes) > 1:
        cond = F.lit(False)
        for s in suffixes:
            cond = cond | F.col("path").endswith(s)
        df = df.filter(cond)
    # duplicate-path skip (filewalker.go:99-104): identical logical paths
    # reached twice (symlinks, overlapping roots) processed once
    return df.dropDuplicates(["path"])


def read_source_file_list(spark: SparkSession, list_path: str) -> list[str]:
    """S5: one input path per line, blanks dropped (source_file_flags.go:58-84)."""
    rows = (
        spark.read.text(list_path)
        .select(F.trim("value").alias("p"))
        .filter(F.col("p") != "")
        .collect()
    )
    return [r["p"] for r in rows]


def resume_filter(files: DataFrame, processed: DataFrame) -> DataFrame:
    """J4: drop files already present in the checkpoint table
    (prepost.go:19-40 / fileindex.go:42-59) — a left-anti join."""
    return files.join(processed.select("path"), "path", "left_anti")
