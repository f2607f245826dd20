"""ARC v1 ingest converter (SURVEY §2 S2).

Reference: /root/reference/arcreader/unmarshaler.go:250-284 parses the ARC
v1 header line ``url ip date mime length`` (space-separated); the reader
resynchronizes after corruption by scanning for a gzip magic or an
``http|file|dns|ftp`` URL prefix (unmarshaler.go:85-145).

Spark-first: this is an *ingest-time batch converter*, not a query
operator — splittable columnar formats make byte-level resync moot. The
line parse is one regexp per field, entirely JVM; malformed lines carry a
``validation_errors`` entry instead of aborting (the reference's --force /
L6 continue semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# url ip 14-digit-date mime length   (unmarshaler.go:250-284, V1 layout)
ARC_V1_RE = r"^(\S+) (\d{1,3}(?:\.\d{1,3}){3}) (\d{14}) (\S+) (\d+)$"


def parse_arc_v1_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """text lines -> typed record rows with L6 error-carrying semantics."""
    c = F.col(line_col)
    m = [F.regexp_extract(c, ARC_V1_RE, i) for i in range(6)]
    ok = m[0] != ""
    resyncable = c.rlike(r"^(http|file|dns|ftp)")  # unmarshaler.go:85-145
    return lines.select(
        F.when(ok, m[1]).alias("url"),
        F.when(ok, m[2]).alias("ip_address"),
        F.when(ok, F.to_timestamp(m[3], "yyyyMMddHHmmss")).alias("ts"),
        F.when(ok, m[4]).alias("mime_type"),
        F.when(ok, m[5].cast("long")).alias("size"),
        F.lit("resource").alias("record_type"),
        F.when(ok, F.array().cast("array<string>"))
        .when(
            resyncable,
            F.array(F.lit("malformed ARC header line (resynchronized)")),
        )
        .otherwise(F.array(F.lit("unparseable ARC data")))
        .alias("validation_errors"),
    )
