"""Deterministic sampling / split assignment for training-data curation.

A 100 TB corpus pipeline needs reproducible sampling: the same document
must land in the same split (train/val/test) and the same sample on every
run, on any cluster layout, with no RNG state — so membership is a pure
function of a portable hash of the document id (``textdedup.phash``:
first 15 hex chars of md5, reproducible in the DuckDB oracle). Everything
here is scan-side JVM expression work — no shuffle, no UDF, no driver
data; Catalyst pushes the membership predicate into the scan.

Contrast with ``df.sample()``: Spark's sampler is seed-deterministic only
for a FIXED partitioning — repartition the input and membership changes.
Hash-based membership survives any re-layout, and the reference's
first-wins determinism contract (cmd/dedup/dedup.go:143-147) sets the
same bar for order-independence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warchaeology_spark.operators.textdedup import phash

BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 42) -> Column:
    """Stable bucket in [0, BUCKETS) from the portable hash of the id."""
    return F.pmod(phash(seed, id_col.cast("string")), F.lit(BUCKETS))


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Buckets [0, w1*B) -> split 1, [w1*B, (w1+w2)*B) -> split 2, ... in the
    given dict order (insertion-ordered); weights must sum to ~1. Adds a
    ``split`` column; deterministic in the row's id alone.
    """
    b = hash_bucket(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)


def sample_deterministic(
    df: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~fraction of rows, membership a pure function of the id."""
    return df.filter(
        hash_bucket(F.col(id_col), seed) < int(round(fraction * BUCKETS))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 100% of low-resource languages, 10% of the head language).

    The per-stratum threshold is a small CASE expression (strata counts
    are dict-sized, e.g. languages), the membership test stays scan-side;
    no shuffle, no sampleBy RNG.
    """
    thr = None
    for k, frac in fractions.items():
        cond = F.col(strata_col) == k
        v = int(round(frac * BUCKETS))
        thr = F.when(cond, v) if thr is None else thr.when(cond, v)
    thr = (
        F.lit(int(round(default_fraction * BUCKETS)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * BUCKETS)))
    )
    return df.filter(hash_bucket(F.col(id_col), seed) < thr)
