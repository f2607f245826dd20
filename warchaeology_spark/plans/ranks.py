"""Distributed dense global sequence (no single-partition window).

``row_number() OVER (ORDER BY ...)`` with no partitioning collapses to one
task — unusable at 10^10 rows. The classic two-pass replacement:

  1. range-repartition + sort within partitions on the order key
     (one shuffle, fully parallel — this is what ORDER BY compiles to),
  2. count rows per physical partition (cheap scan),
  3. prefix-sum the counts on the driver (P integers),
  4. mapInPandas adds ``offset[pid] + local position``.

Deterministic for a deterministic input because range partitioning and the
in-partition sort both key on the total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_sequence(
    df: DataFrame, order_cols: list[str], seq_col: str = "seq", num_partitions: int | None = None
) -> DataFrame:
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
    d = d.sortWithinPartitions(*order_cols)
    d = d.withColumn("_pid", F.spark_partition_id())
    # materialize so both passes (counts, mapInPandas) see identical
    # partitioning even under AQE; localCheckpoint also truncates lineage
    d = d.localCheckpoint(eager=True)
    counts = {r["_pid"]: r["count"] for r in d.groupBy("_pid").count().collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = ", ".join(f"{n} {t}" for n, t in df.dtypes) + f", {seq_col} long"

    def add_seq(it):
        import pandas as pd  # noqa: F401

        pos = None
        for pdf in it:
            if len(pdf) == 0:
                yield pdf.drop(columns=["_pid"]).assign(**{seq_col: []})
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf.drop(columns=["_pid"]).assign(
                **{seq_col: range(pos, pos + len(pdf))}
            )
            pos += len(pdf)
            yield out

    out = d.mapInPandas(add_seq, schema)
    return out
