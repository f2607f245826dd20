"""Structured-Streaming rendering of incremental file arrival (SURVEY §2.J).

The reference's closest analogue is batch-with-resume: files arrive, the
FileIndex skips already-processed ones (prepost.go:19-40). The streaming
translation: a file-source stream (``maxFilesPerTrigger`` = arrival pacing)
with ``foreachBatch`` folding per-file validation Results into a running
stats table — exactly-once per batch via the sink's idempotent DYNAMIC
partition overwrite keyed on batch id: a foreachBatch retry re-runs with
the same batch_id and overwrites exactly its own partition, so replays
never duplicate rows.

The frontier itself deliberately stays iterative-batch (scheduler.py):
10^10-key seen-state in a streaming state store is the wrong shape; rounds
over snapshot tables give the same incrementality with resumable commits.
This module covers the *ingest* side (validate/dedup passes over newly
landed files), which IS streaming-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warchaeology_spark.operators.validate import per_file_stats


def write_batch_stats(stats: DataFrame, batch_id: int, results_dir: str) -> None:
    """Idempotent per-batch sink: dynamic partition overwrite on batch_id.

    A foreachBatch retry re-runs with the SAME batch_id and overwrites
    exactly its own partition — replays never duplicate rows (a blind
    append would)."""
    (
        stats.withColumn("batch_id", F.lit(batch_id))
        .drop("error_messages")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(results_dir)
    )


def incremental_validate(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    results_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start a stream validating files as they land; per-batch Results are
    appended to ``results_dir`` (parquet), keyed by batch id. Returns the
    StreamingQuery (caller: processAllAvailable() in tests; awaitTermination
    in production)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_stats(per_file_stats(batch_df), batch_id, results_dir)

    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
