"""`warc ls` semantics: filter -> per-file nth/limit -> CDX projection.

Reference surface:
- RecordFilter (conjunctive id/type/status/mime filter):
  /root/reference/internal/filter/filter.go:69-118
- status range parse ('200-300' -> [200,300)):
  /root/reference/cmd/internal/flag/filter_flags.go:135-167
- Filter/Limit/Nth/Skip/Compose combinators ("nth wins over limit"):
  /root/reference/internal/warc/combinators.go:11-112
- CDX field letters + width crop/pad, default format 'V+11iT-8a100':
  /root/reference/cmd/ls/recordwriter.go:17-30,136,201-345

Spark-first translation decisions:
- limit/nth/skip in the reference are *per file* (its unit of parallelism).
  Here: ``row_number() over (partitionBy(file).orderBy(offset))`` — the
  reference's own ``--deterministic`` total order, kept under parallelism.
- the filter is a single Column predicate -> Catalyst pushes it into the
  parquet scan; the projection prunes the payload columns away so a format
  without 'm'/'s' never reads blocks (the reference's WithSkipParseBlock
  rewrite, ls.go:116-118, is free here via column pruning).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warchaeology_spark.functions.strings import crop_string

# record-type bitmask (filter.go:76; combinators.go:127-137)
TYPE_MASKS = {
    "warcinfo": 1, "response": 2, "resource": 4, "request": 8,
    "metadata": 16, "revisit": 32, "conversion": 64, "continuation": 128,
}

_RANGE_RE = re.compile(r"^(\d*)-(\d*)$|^(\d+)$")


def parse_status_range(spec: str) -> tuple[int, int]:
    """'200-300'->[200,300); '500-'->[500,inf); '-400'->[0,400); '404'->[404,405).

    Mirrors filter_flags.go:135-167.
    """
    m = _RANGE_RE.match(spec.strip())
    if not m:
        raise ValueError(f"bad status range: {spec!r}")
    if m.group(3) is not None:
        v = int(m.group(3))
        return v, v + 1
    lo = int(m.group(1)) if m.group(1) else 0
    hi = int(m.group(2)) if m.group(2) else 2**31 - 1
    return lo, hi


@dataclass
class RecordFilter:
    """Conjunctive record filter (filter.go:69-118).

    ids: record-id membership (semi-join, J5); record_types: OR-bitmask;
    status: half-open range; mimes: OR of substring matches.
    """

    ids: list[str] = field(default_factory=list)
    record_types: list[str] = field(default_factory=list)
    status: str | None = None
    mimes: list[str] = field(default_factory=list)

    def predicate(self) -> Column:
        pred = F.lit(True)
        if self.ids:
            pred = pred & F.col("record_id").isin(self.ids)
        if self.record_types:
            mask = 0
            for t in self.record_types:
                mask |= TYPE_MASKS[t]
            pred = pred & (F.col("type_mask").bitwiseAND(F.lit(mask)) != 0)
        if self.status:
            lo, hi = parse_status_range(self.status)
            pred = pred & F.col("status_code").between(lo, hi - 1)
        if self.mimes:
            mp = F.lit(False)
            for mtype in self.mimes:
                mp = mp | F.lower(F.col("mime_type")).contains(mtype.lower())
            pred = pred & mp
        return pred

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate())


def _file_window() -> Window:
    # the reference's deterministic total order within a file (offset is the
    # byte position, strictly increasing): dedup.go:143-147 contract
    return Window.partitionBy("file").orderBy("offset")


def per_file_limit(df: DataFrame, n: int) -> DataFrame:
    """First n records per file (combinators.go:32-53)."""
    return (
        df.withColumn("_rn", F.row_number().over(_file_window()))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def per_file_nth(df: DataFrame, n: int) -> DataFrame:
    """Exactly the n-th (1-based) record per file (combinators.go:55-75)."""
    return (
        df.withColumn("_rn", F.row_number().over(_file_window()))
        .filter(F.col("_rn") == n)
        .drop("_rn")
    )


def per_file_skip(df: DataFrame, n: int) -> DataFrame:
    """Drop first n records per file (combinators.go:77-99)."""
    return (
        df.withColumn("_rn", F.row_number().over(_file_window()))
        .filter(F.col("_rn") > n)
        .drop("_rn")
    )


def compose(
    df: DataFrame,
    record_filter: RecordFilter | None = None,
    nth: int = 0,
    limit: int = 0,
    offset: int = 0,
) -> DataFrame:
    """Pipeline assembly with the reference's precedence: filter first,
    then nth XOR limit with **nth winning** (combinators.go:101-112,
    tested at combinators_test.go:56). ``offset`` is the L5 byte-seek.
    """
    if offset:
        df = df.filter(F.col("offset") >= offset)
    if record_filter is not None:
        df = record_filter.apply(df)
    if nth > 0:
        return per_file_nth(df, nth)
    if limit > 0:
        return per_file_limit(df, limit)
    return df


# ---------------------------------------------------------------------------
# CDX projection (P1): field letters per recordwriter.go:239-345
# ---------------------------------------------------------------------------

# letter -> (column expression builder, default alias)
_FIELD_EXPRS = {
    "a": (lambda: F.col("url"), "url"),
    "b": (lambda: F.date_format("ts", "yyyyMMddHHmmss"), "date14"),
    "B": (lambda: F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"), "date_w3c"),
    "e": (lambda: F.col("ip_address"), "ip"),
    "g": (lambda: F.col("file"), "file"),
    "h": (lambda: F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1), "host"),
    "i": (lambda: F.regexp_replace("record_id", r"^<?(urn:uuid:)?|>$", ""), "record_id"),
    "k": (lambda: F.col("checksum"), "checksum"),
    "m": (lambda: F.col("mime_type"), "mime"),
    "s": (lambda: F.col("status_code").cast("string"), "status"),
    "S": (lambda: F.col("size").cast("string"), "size"),
    "T": (lambda: F.col("record_type"), "type"),
    "V": (lambda: F.col("offset").cast("string"), "offset"),
    # The reference's text writer renders M, N and r as the literal "-"
    # placeholder (recordwriter.go:299-311); we keep M and r faithful to
    # that, and enrich N to the SURT key (the letter's documented intent).
    "M": (lambda: F.lit("-"), "meta"),
    "r": (lambda: F.lit("-"), "redirect"),
    "N": (lambda: None, "surt"),  # filled lazily to avoid circular import
}

_SPEC_RE = re.compile(r"([abBeghikmMNrsSTV])([+-]?)(\d*)")

DEFAULT_FORMAT = "V+11iT-8a100"  # recordwriter.go:21
DEFAULT_FORMAT_ID = "V+11i"      # with --id flag, recordwriter.go:136


def parse_format_spec(spec: str) -> list[tuple[str, str, int]]:
    """'V+11iT-8a100' -> [('V','+',11), ('i','',0), ('T','-',8), ('a','',100)].

    Mirrors the regex at recordwriter.go:17 ('+'=right-align, '-'=left,
    digits=width, no width=unpadded).
    """
    out = []
    for m in _SPEC_RE.finditer(spec):
        out.append((m.group(1), m.group(2), int(m.group(3)) if m.group(3) else 0))
    return out


def cdx_projection(df: DataFrame, spec: str = DEFAULT_FORMAT, padded: bool = False) -> DataFrame:
    """Project the CDX fields of ``spec``.

    padded=False returns typed/cropped columns (the analytics surface);
    padded=True applies the reference's fixed-width text alignment
    (recordwriter.go:201-224: crop to width incl. ellipsis, then pad —
    '+' right-aligns, '-' left-aligns, and a width WITHOUT an alignment
    flag crops but does NOT pad, per padString's align==0 branch).
    """
    cols = []
    seen_alias: dict[str, int] = {}
    for letter, align, width in parse_format_spec(spec):
        builder, alias = _FIELD_EXPRS[letter]
        if letter == "N":
            from warchaeology_spark.functions.urls import surt_key

            c = surt_key(F.col("url"))
        else:
            c = builder()
        if width:
            c = crop_string(c, width)
            if padded and align == "+":
                c = F.lpad(c, width, " ")
            elif padded and align == "-":
                c = F.rpad(c, width, " ")
        # repeated letters (e.g. 'MNr' defaults sharing '-') get unique aliases
        n = seen_alias.get(alias, 0)
        seen_alias[alias] = n + 1
        cols.append(c.alias(alias if n == 0 else f"{alias}_{n}"))
    return df.select(*cols)


def ls_text_lines(df: DataFrame, spec: str = DEFAULT_FORMAT) -> DataFrame:
    """S7 text writer: one space-joined line per record (recordwriter.go:161-199)."""
    proj = cdx_projection(df, spec, padded=True)
    return proj.select(F.concat_ws(" ", *[F.col(c) for c in proj.columns]).alias("line"))


def ls_json_lines(df: DataFrame, spec: str = DEFAULT_FORMAT) -> DataFrame:
    """S7 JSON writer (recordwriter.go:42-110): to_json of the projection."""
    proj = cdx_projection(df, spec, padded=False)
    return proj.select(F.to_json(F.struct(*[F.col(c) for c in proj.columns])).alias("json"))
