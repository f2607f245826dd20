"""`warc dedup` semantics: digest first-occurrence-wins dedup (SURVEY §2.E J1-J3).

Reference surface:
- DigestIndex.IsRevisit — atomic read-or-insert into an LSM index; first
  arrival wins: /root/reference/internal/index/digestindex.go:45-68
- candidate gating (only response/resource by default; revisit always
  excluded): cmd/dedup/dedup.go:133-135, 444-447
- digest source: header payload digest else computed: dedup.go:449-452,527-551
- size-gain theta guard (default 2 KB): dedup.go:483-489
- revisit-record construction: dedup.go:491-503
- deterministic order = sorted paths (dedup.go:143-147, 249-253)

Spark-first translation — THE key semantic move of the whole build
(SURVEY §7): the reference's "arrival order under concurrency" is replaced
by its own ``--deterministic`` contract, the total order ``(file, offset)``,
expressed as one window over a hash shuffle on ``digest``:

    rn = row_number() over (partitionBy(digest) orderBy(file, offset))

rn==1 is "first" (the Badger insert winner); rn>1 are duplicates that join
back to their first via the same shuffle partitioning (no second exchange —
the window and the self-join share the hash partitioning on digest; AQE
handles digest skew). At 10^10 keys the hash-partitioned shuffle *is* the
index; no single-node LSM bottleneck exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warchaeology_spark.functions.digests import payload_digest_or_computed

DEFAULT_CANDIDATE_TYPES = ("response", "resource")  # dedup.go:133-135
DEFAULT_MIN_SIZE_GAIN = 2048  # bytes, dedup.go:33-34,103
REVISIT_OVERHEAD = 512  # serialized revisit record size stand-in (headers + ref)


def with_digest(df: DataFrame) -> DataFrame:
    """Materialize the dedup key: header payload digest else computed sha1."""
    return df.withColumn(
        "digest", payload_digest_or_computed("payload_digest", "payload")
    )


def dedup_first_wins(
    df: DataFrame,
    candidate_types: tuple[str, ...] = DEFAULT_CANDIDATE_TYPES,
    min_size_gain: int = DEFAULT_MIN_SIZE_GAIN,
) -> DataFrame:
    """Annotate every record with the dedup verdict.

    Output adds:
      digest          – the dedup key
      is_candidate    – type gate (revisit never a candidate)
      is_dup          – candidate with an earlier (file,offset) same-digest record
      rewrite         – is_dup AND the size-gain guard passes (record becomes
                        a revisit record; otherwise original is kept)
      ref_file/ref_offset/ref_record_id/ref_url/ref_ts – the "first" record
                        (the reference's RevisitRef, codec.go:11-16)
    """
    df = with_digest(df)
    is_cand = (
        F.col("record_type").isin(*candidate_types)
        & (F.col("record_type") != "revisit")
        & F.col("digest").isNotNull()
    )
    df = df.withColumn("is_candidate", is_cand)

    # ONE window pass: row_number gives the dup flag, and first_value over
    # the same frame carries the RevisitRef fields — no join-back, a single
    # exchange on digest (plan-asserted in tests/test_plans.py)
    w = Window.partitionBy("digest").orderBy("file", "offset")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cands = df.filter(F.col("is_candidate"))
    annotated = (
        cands.withColumn("_rn", F.row_number().over(w))
        .withColumn("ref_file", F.first("file").over(frame))
        .withColumn("ref_offset", F.first("offset").over(frame))
        .withColumn("ref_record_id", F.first("record_id").over(frame))
        .withColumn("ref_url", F.first("url").over(frame))
        .withColumn("ref_ts", F.first("ts").over(frame))
        .withColumn("is_dup", F.col("_rn") > 1)
        .drop("_rn")
    )
    non_cands = df.filter(~F.col("is_candidate"))
    for c in ("ref_file", "ref_offset", "ref_record_id", "ref_url", "ref_ts"):
        non_cands = non_cands.withColumn(
            c, F.lit(None).cast(dict(annotated.dtypes)[c])
        )
    non_cands = non_cands.withColumn("is_dup", F.lit(False))
    out = annotated.unionByName(non_cands)

    # size-gain theta guard (dedup.go:483-489): rewrite only if the revisit
    # stand-in is at least min_size_gain smaller than the payload
    payload_len = F.coalesce(F.length(F.col("payload")), F.lit(0))
    return out.withColumn(
        "rewrite",
        F.col("is_dup") & (F.lit(REVISIT_OVERHEAD) < payload_len - F.lit(min_size_gain)),
    )


def to_revisit_records(annotated: DataFrame) -> DataFrame:
    """Project records marked ``rewrite`` into revisit records (J3,
    dedup.go:491-503): type flips to revisit, payload dropped, the ref
    triple (TargetRecordId / Date / Uri) carried from the first record.
    """
    dups = annotated.filter(F.col("rewrite"))
    return dups.select(
        "file",
        "offset",
        "record_id",
        F.lit("revisit").alias("record_type"),
        F.lit(32).alias("type_mask"),  # revisit bit, filter.go:76
        "url",
        "ts",
        "digest",
        F.col("ref_record_id").alias("warc_refers_to"),
        F.col("ref_ts").alias("warc_refers_to_date"),
        F.col("ref_url").alias("warc_refers_to_target_uri"),
    )


def dedup_stats(annotated: DataFrame) -> DataFrame:
    """Per-file dedup counters feeding stat.Result (results.go:49-60)."""
    return annotated.groupBy("file").agg(
        F.count(F.lit(1)).alias("records"),
        F.sum(F.col("is_candidate").cast("long")).alias("candidates"),
        F.sum(F.col("is_dup").cast("long")).alias("duplicates"),
        F.sum(F.col("rewrite").cast("long")).alias("rewritten"),
    )
