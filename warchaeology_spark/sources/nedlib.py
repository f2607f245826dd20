"""Nedlib ingest converter (SURVEY §2 S3).

Reference: /root/reference/nedlibreader/nedlibreader.go:36-126 — one record
per ``.meta`` + payload file pair; HTTP headers parsed from the meta file;
``Arc-Url`` / ``Arc-Length`` promoted to record headers; lenient date parse
for ``Date`` (the F4 chain).

Spark-first: ``binaryFile`` scan over the meta files + an Arrow-batched
pandas UDF for the header split (multi-line text -> map) — the one
genuinely Python-shaped step; everything downstream is columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warchaeology_spark.functions.dates import parse_http_date_full

_HDR_TYPE = T.MapType(T.StringType(), T.StringType())


@F.pandas_udf(_HDR_TYPE)
def _parse_headers(content: pd.Series) -> pd.Series:
    """HTTP-style header block -> lowercased-key map (vectorized split)."""

    def parse(b) -> dict:
        try:
            text = bytes(b).decode("utf-8", errors="replace")
        except Exception:
            return {}
        out = {}
        for line in text.splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                out[k.strip().lower()] = v.strip()
            elif line.startswith("HTTP/"):
                parts = line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    out["__status__"] = parts[1]
        return out

    return content.map(parse)


def parse_nedlib_pairs(meta_files: DataFrame) -> DataFrame:
    """binaryFile rows (path, content) of .meta files -> record rows.

    Promotions mirror nedlibreader.go:62-101: Arc-Url -> url,
    Arc-Length -> size, Content-Type -> mime_type, Date -> ts (lenient
    chain incl. the Norwegian formats), HTTP status -> status_code.
    """
    h = _parse_headers(F.col("content"))
    df = meta_files.select(
        F.col("path").alias("file"), h.alias("hdrs")
    )
    return df.select(
        "file",
        F.col("hdrs")["arc-url"].alias("url"),
        F.col("hdrs")["arc-length"].cast("long").alias("size"),
        F.col("hdrs")["content-type"].alias("mime_type"),
        F.col("hdrs")["__status__"].cast("int").alias("status_code"),
        parse_http_date_full(F.col("hdrs")["date"]).alias("ts"),
        F.lit("response").alias("record_type"),
        F.when(
            F.col("hdrs")["arc-url"].isNull(),
            F.array(F.lit("missing Arc-Url header")),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("validation_errors"),
    )
