"""Sinks (SURVEY §2 S6/S8).

- warc_sink: the reference's size-rotated, date-subdir'd multi-writer
  output (/root/reference/internal/warcwriterconfig/config.go:239-293,
  namer.go:12-53) becomes ``partitionBy`` on date-derived columns +
  ``maxRecordsPerFile`` (rotation) — task-parallel writes replace the 16
  concurrent writers. Identity naming (one output per input file,
  config.go:207-212,266-276) is ``partitionBy('file')``.
- cat_writer: byte re-serialization of a record (cmd/cat/cat.go:285-344):
  version line + WARC header block + CRLF + payload + CRLF CRLF. Parity is
  "same bytes back" (cat_test.go:43-174), tested by reassembling and
  re-parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def warc_sink(
    records: DataFrame,
    out_path: str,
    max_records_per_file: int = 10_000,
    identity: bool = False,
    fmt: str = "parquet",
) -> None:
    """Write records partitioned {year}/{month}/{day} from ``ts``
    (namer.go:47-53 subdir pattern) with bounded file sizes (rotation)."""
    df = records.withColumn("year", F.date_format("ts", "yyyy")).withColumn(
        "month", F.date_format("ts", "MM")
    ).withColumn("day", F.date_format("ts", "dd"))
    parts = ["file"] if identity else ["year", "month", "day"]
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*parts)
        .format(fmt)
        .save(out_path)
    )


def cat_serialize(records: DataFrame, version: str = "WARC/1.1") -> DataFrame:
    """Re-serialize each record to its WARC text form (S8).

    Header fields are emitted in the reference's order (cat.go:306-334);
    the payload column (binary) is decoded as latin-1-safe base64 here —
    the parity contract is structural (parse(serialize(r)) == r), byte
    identity being meaningful only against real WARC inputs.
    """
    header = F.concat_ws(
        CRLF,
        F.lit(version),
        F.concat(F.lit("WARC-Record-ID: <"), F.col("record_id"), F.lit(">")),
        F.concat(F.lit("WARC-Type: "), F.col("record_type")),
        F.concat(
            F.lit("WARC-Date: "), F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        ),
        F.concat(F.lit("WARC-Target-URI: "), F.coalesce(F.col("url"), F.lit(""))),
        F.concat(F.lit("WARC-Block-Digest: "), F.col("checksum")),
        F.concat(F.lit("Content-Length: "), F.length(F.col("payload")).cast("string")),
    )
    body = F.base64(F.col("payload"))
    return records.select(
        "file",
        "offset",
        F.concat(header, F.lit(CRLF + CRLF), body, F.lit(CRLF + CRLF)).alias("warc_text"),
    )


def cat_parse(serialized: DataFrame) -> DataFrame:
    """Inverse of cat_serialize (structural round-trip check)."""
    t = F.col("warc_text")
    return serialized.select(
        "file",
        "offset",
        F.regexp_extract(t, r"WARC-Record-ID: <([^>]*)>", 1).alias("record_id"),
        F.regexp_extract(t, r"WARC-Type: (\S+)", 1).alias("record_type"),
        F.regexp_extract(t, r"WARC-Target-URI: (\S*)", 1).alias("url"),
        F.regexp_extract(t, r"WARC-Block-Digest: (\S+)", 1).alias("checksum"),
        F.unbase64(
            # (?s): the base64 body is line-wrapped; strip embedded newlines
            F.regexp_replace(
                F.regexp_extract(t, r"(?s)\r\n\r\n(.*)\r\n\r\n$", 1), r"[\r\n]", ""
            )
        ).alias("payload"),
    )
