"""`warc validate` semantics: per-file + global validation aggregates.

Reference surface:
- per-file Result (records / errors / duplicates / hash):
  /root/reference/internal/stat/results.go:28-60
- global Stats merge (partial -> final):
  /root/reference/internal/stat/stats.go:22-27 with the collector goroutine
  at cmd/validate/validate.go:196-221
- exit code 1 iff any record error: validate.go:218-220
- whole-file hash while scanning: cmd/validate/readers.go:15-62

Spark-first: one ``groupBy(file).agg`` produces the per-file Results; Spark's
partial aggregation *is* the reference's results-channel merge, so the global
Stats row is just a second aggregate over the same frame (no extra scan when
cached / one extra exchange when not — both trivially parallel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_file_stats(df: DataFrame, with_hash: bool = False) -> DataFrame:
    """stat.Result per file: records, error_records, errors, first_errors.

    ``is_dup`` (when present, produced by the dedup pass) feeds the
    duplicates counter exactly like dedup's Result does.
    """
    has_dup = "is_dup" in df.columns
    n_errs = F.size(F.col("validation_errors"))
    aggs = [
        F.count(F.lit(1)).alias("records"),
        F.sum((n_errs > 0).cast("long")).alias("error_records"),
        F.sum(n_errs.cast("long")).alias("errors"),
        F.flatten(F.collect_list("validation_errors")).alias("error_messages"),
    ]
    if has_dup:
        aggs.append(F.sum(F.col("is_dup").cast("long")).alias("duplicates"))
    else:
        aggs.append(F.lit(0).cast("long").alias("duplicates"))
    if with_hash:
        # file hash analogue (readers.go:15-62): hash of payload digests in
        # offset order — a content fingerprint computable distributively.
        aggs.append(
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list(F.struct("offset", "checksum"))).cast("string")))
            .alias("file_fingerprint")
        )
    return df.groupBy("file").agg(*aggs)


def file_hash_raw(spark, root: str, algo: str = "sha256", glob: str | None = None) -> DataFrame:
    """EXACT whole-file hash over the raw bytes — bit-identical to the
    reference's countingReader (cmd/validate/readers.go:15-62), selectable
    algo md5/sha1/sha256/sha512 like its hashFunction switch.

    Complements the record-level ``file_fingerprint`` analogue above
    (which hashes per-record digests and therefore does NOT match the
    reference's output): a user comparing hashes against ``warc validate``
    gets the same hex digest from this one. One file = one task
    (binaryFile source); each file must fit a task's memory — the same
    constraint the reference's ⌈1.5xCPU⌉ whole-file workers have.
    """
    exprs = {
        "md5": lambda c: F.md5(c),
        "sha1": lambda c: F.sha1(c),
        "sha256": lambda c: F.sha2(c, 256),
        "sha512": lambda c: F.sha2(c, 512),
    }
    if algo not in exprs:
        raise ValueError(f"unsupported hash algo: {algo}")
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    return df.select(
        F.col("path").alias("file"),
        exprs[algo](F.col("content")).alias("file_hash"),
        F.col("length").alias("n_bytes"),
    )


def global_stats(file_stats: DataFrame) -> DataFrame:
    """stat.Stats: files / records / error_records / errors / duplicates."""
    return file_stats.agg(
        F.count(F.lit(1)).alias("files"),
        F.sum("records").alias("records"),
        F.sum("error_records").alias("error_records"),
        F.sum("errors").alias("errors"),
        F.sum("duplicates").alias("duplicates"),
    )


def exit_code(global_row) -> int:
    """validate.go:218-220: exit 1 iff any record error."""
    return 1 if (global_row["errors"] or 0) > 0 else 0
