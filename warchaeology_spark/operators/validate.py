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
