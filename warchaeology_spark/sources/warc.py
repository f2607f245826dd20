"""WARC byte-level scan + byte-exact re-serialization (SURVEY §2 S1/S8).

The reference's `warc cat` re-emits a parsed record as: version line +
CRLF, the WARC header lines, CRLF, the block bytes, CRLF CRLF
(/root/reference/cmd/cat/cat.go:285-344); `cat_test.go:43-174` asserts
the output is byte-identical to the input record. This module implements
the same grammar over DataFrames:

- ``scan_warc_bytes``: (file, content binary) rows -> one row per record
  with byte offsets, the version line, the ORDERED header list and the
  raw block bytes. Per-record-gzip files (concatenated gzip members, the
  WARC-on-disk convention) are detected by magic and decompressed member
  by member; offsets then index the COMPRESSED stream, like the
  reference's offset addressing. Malformed trailing data does not kill
  the scan: records parse up to the last good offset and one error row
  marks the tail (the reference's force/continue-on-error semantics,
  internal/warc/recorditerator.go).
- ``serialize_warc``: the exact inverse — rebuilds each record's bytes.
  For a plain-format file, ``serialize(scan(bytes)) == bytes`` holds to
  the last good offset; for a gzip file the serialization equals the
  UNCOMPRESSED member bytes (what `cat` prints).

Scale shape: the unit of parallelism is the FILE (one row in, n records
out through Arrow-batched ``mapInPandas``) — the same per-file worker
model as the reference's filewalker, so a 100 TB archive set fans out
across executors with no shuffle at all; downstream operators see plain
record rows. WARC files are individually bounded (~1 GB by the writer's
rotation), so a file's bytes fit comfortably in one task.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = b"\r\n"

#: one row per parsed record (or one error row for a malformed tail)
WARC_RECORD_SCHEMA = (
    "file string, offset long, raw_length long, member_seq int,"
    " version string,"
    " headers array<struct<name:string,value:string>>, content binary,"
    " error string"
)


def parse_warc_member(data: bytes, base: int) -> tuple[dict | None, int, str | None]:
    """Parse ONE record starting at ``base`` in ``data``.

    Returns (record, next_offset, error). The record grammar
    (cat.go:285-344; gowarc unmarshaler): ``WARC/x.y`` CRLF, header
    lines ``Name: value`` CRLF each, blank CRLF, ``Content-Length``
    block bytes, CRLF CRLF.
    """
    if not data[base:]:
        return None, base, None
    hdr_end = data.find(CRLF + CRLF, base)
    if hdr_end < 0:
        return None, base, "unterminated header block"
    lines = data[base:hdr_end].split(CRLF)
    version = lines[0].decode("utf-8", "replace")
    if not version.startswith("WARC/"):
        return None, base, f"bad version line: {version[:40]!r}"
    headers: list[tuple[str, str]] = []
    length = None
    for ln in lines[1:]:
        name, sep, value = ln.decode("utf-8", "replace").partition(":")
        if not sep:
            return None, base, f"malformed header line: {ln[:40]!r}"
        value = value[1:] if value.startswith(" ") else value
        headers.append((name, value))
        if name.lower() == "content-length":
            # gowarc flags a repeated Content-Length as a validation error
            # (the reference refuses to guess which one sizes the block);
            # other headers MAY legally repeat (e.g. WARC-Concurrent-To).
            if length is not None:
                return None, base, "duplicate Content-Length header"
            try:
                length = int(value)
            except ValueError:
                return None, base, f"bad Content-Length: {value[:40]!r}"
    if length is None:
        return None, base, "missing Content-Length"
    if length < 0:
        # without this guard a crafted negative length points body_end
        # BEFORE the record — the separator check can then match the
        # PREVIOUS record's trailing CRLFCRLF and next_offset <= base,
        # which would loop parse_warc_file forever (fuzz-found)
        return None, base, f"negative Content-Length: {length}"
    body_start = hdr_end + 4
    body_end = body_start + length
    if data[body_end:body_end + 4] != CRLF + CRLF:
        return None, base, "missing record separator after block"
    rec = {
        "offset": base,
        "raw_length": body_end + 4 - base,
        "version": version,
        "headers": headers,
        "content": data[body_start:body_end],
    }
    return rec, body_end + 4, None


def _gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(compressed_offset, compressed_length, plain_bytes) per gzip member."""
    pos = 0
    while pos < len(data):
        d = zlib_decompressobj()
        plain = d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, consumed, plain
        if consumed <= 0:  # cannot advance -> stop (caller flags the tail)
            return
        pos += consumed


def zlib_decompressobj():
    import zlib

    return zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip wrapper


def parse_warc_file(name: str, data: bytes) -> list[dict]:
    """All records of one WARC file (plain or per-record gzip), plus at
    most one trailing error row. Pure function — unit-testable off-Spark,
    executed inside mapInPandas on-Spark."""
    out: list[dict] = []

    def emit(
        rec: dict | None, offset: int, err: str | None, seq: int = 0
    ) -> None:
        # member_seq: ordinal of the record WITHIN its parse unit — always
        # 0 for plain records (unique offsets), 0..k inside a multi-record
        # gzip member, whose records all share the member's compressed
        # offset. (offset, member_seq) is the unique record address.
        row = {
            "file": name, "offset": offset, "raw_length": 0,
            "member_seq": seq, "version": None,
            "headers": None, "content": None, "error": err,
        }
        if rec is not None:
            row.update(rec)
        out.append(row)

    if data[:2] == b"\x1f\x8b":  # per-record gzip members
        try:
            for c_off, c_len, plain in _gzip_members(data):
                # the on-disk convention is one record per member, but the
                # grammar allows several — the reference reads the stream
                # continuously and yields them all, so loop to exhaustion
                # instead of silently dropping trailing records. Offsets
                # address the COMPRESSED stream (reference semantics): every
                # record of a member shares the member offset; only the
                # first carries its compressed length.
                pos, seq = 0, 0
                while pos < len(plain):
                    rec, nxt, err = parse_warc_member(plain, pos)
                    if err or rec is None:
                        emit(None, c_off, err or "empty gzip member", seq)
                        return out
                    rec["offset"] = c_off
                    rec["raw_length"] = c_len if seq == 0 else 0
                    emit(rec, c_off, None, seq)
                    pos, seq = nxt, seq + 1
                if seq == 0:  # zero-byte member decoded to nothing
                    emit(None, c_off, "empty gzip member")
                    return out
        except Exception as e:  # truncated/corrupt member: keep prior records
            emit(None, len(data), f"gzip: {e}")
        return out

    pos = 0
    while pos < len(data):
        rec, nxt, err = parse_warc_member(data, pos)
        if err:
            emit(None, pos, err)
            break
        if rec is None:
            break
        emit(rec, pos, None)
        pos = nxt
    return out


def serialize_record(version: str, headers: list[tuple[str, str]], content: bytes) -> bytes:
    """Inverse of parse_warc_member (cat.go:285-344 emission).

    Byte-exact for canonical header blocks (every line ``Name: value``
    with the single optional SP, the form every writer in this repo
    emits). A parseable-but-non-canonical input line (``Name:value`` —
    the grammar's SP is optional) re-emits canonicalized with the SP
    restored: same record on reparse, normalized formatting — the same
    normalize-on-write behavior as the reference's repair path
    (warcfixer; gowarc strict mode flags the missing SP as a validation
    error). Fuzz-pinned in tests/test_warc_fuzz.py."""
    head = CRLF.join(
        [version.encode()] + [f"{n}: {v}".encode() for n, v in headers]
    )
    return head + CRLF + CRLF + (content or b"") + CRLF + CRLF


def gzip_member(record_bytes: bytes) -> bytes:
    """One deterministic gzip member (mtime pinned) for a record."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record_bytes)
    return buf.getvalue()


# -- Spark surface ----------------------------------------------------------


def scan_warc_bytes(files: DataFrame) -> DataFrame:
    """(file string, content binary) rows -> WARC_RECORD_SCHEMA rows.

    One input row = one file = one parse unit; Arrow batches carry whole
    files, records fan out inside the task — zero shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for name, blob in zip(pdf["file"], pdf["content"]):
                rows.extend(parse_warc_file(name, bytes(blob)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "offset", "raw_length", "member_seq", "version",
                    "headers", "content", "error",
                ],
            )

    return files.mapInPandas(run, WARC_RECORD_SCHEMA)


def read_warc(spark, path: str) -> DataFrame:
    """Scan a directory/glob of .warc / .warc.gz files distributed: the
    built-in binaryFile source lists + reads bytes (one row per file,
    pushdown-pruned by pathGlobFilter), then scan_warc_bytes parses."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select(F.col("path").alias("file"), F.col("content"))
    )
    return scan_warc_bytes(files)


def records_table(scanned: DataFrame) -> DataFrame:
    """Typed record table from scan_warc_bytes rows — the bridge from the
    byte scan to the operator surface (ls/validate/dedup consume these
    column names; FIXTURES.md fetch_records schema). Pure column
    expressions: one map_from_entries over the ordered header list, then
    typed lifts. Header names are case-insensitive per the WARC spec, and
    headers MAY legally repeat (e.g. WARC-Concurrent-To on a revisit,
    gowarc WarcFields) — entries are first-wins-deduped per lowercased
    name BEFORE building the map, so one legal record can't abort the
    scan with DUPLICATED_MAP_KEY under the default mapKeyDedupPolicy.
    Error rows are dropped (the scan already surfaced them)."""
    ok = scanned.filter(F.col("error").isNull())
    lowered = F.transform(
        "headers",
        lambda h: F.struct(
            F.lower(h["name"]).alias("name"), h["value"].alias("value")
        ),
    )
    first_wins = F.aggregate(
        lowered,
        F.array().cast("array<struct<name:string,value:string>>"),
        lambda acc, e: F.when(
            F.exists(acc, lambda p: p["name"] == e["name"]), acc
        ).otherwise(F.array_append(acc, e)),
    )
    with_map = ok.withColumn("_h", F.map_from_entries(first_wins))
    get = lambda k: F.col("_h").getItem(k)  # noqa: E731
    # decoded head of the block: the status line for status_code and, for
    # http request/response blocks, the HTTP header section for mime_type.
    # The reference's MIMEType reads the HTTP block's Content-Type, NOT
    # the WARC envelope header (internal/warc/metadata_helpers.go:70-82):
    # a response record's WARC Content-Type is `application/http;
    # msgtype=response` while the payload's is e.g. `text/html`.
    # ISO-8859-1, not UTF-8: the 8192-byte window reaches into the payload
    # body, which is arbitrary binary for real archives (images, gzip).
    # Spark 4's UTF-8 decode throws MALFORMED_CHARACTER_CODING on invalid
    # bytes; Latin-1 maps every byte to a codepoint, and the status-line /
    # Content-Type scans only ever match ASCII, so the lift is identical.
    head = F.decode(F.substring("content", 1, 8192), "ISO-8859-1")
    status = F.regexp_extract(head, r"^HTTP/[0-9.]+ (\d{3})", 1)
    http_head = F.substring_index(head, "\r\n\r\n", 1)
    payload_mime = F.regexp_extract(
        http_head, r"(?im)^Content-Type:[ \t]*([^\r\n]+)", 1
    )
    is_http = F.lower(F.coalesce(get("content-type"), F.lit(""))).contains(
        "application/http"
    )
    mime = F.when(
        is_http,
        F.when(payload_mime != "", F.trim(payload_mime)),
    ).otherwise(get("content-type"))
    return with_map.select(
        "file",
        "offset",
        "member_seq",
        F.col("raw_length").alias("size"),
        F.regexp_replace(get("warc-record-id"), r"^<|>$", "").alias("record_id"),
        F.coalesce(get("warc-type"), F.lit("unknown")).alias("record_type"),
        get("warc-target-uri").alias("url"),
        F.to_timestamp(get("warc-date"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        get("warc-ip-address").alias("ip_address"),
        mime.alias("mime_type"),
        F.when(status != "", status.cast("int")).alias("status_code"),
        get("warc-block-digest").alias("checksum"),
        get("warc-payload-digest").alias("payload_digest"),
        F.col("content").alias("payload"),
    )


def serialize_warc(records: DataFrame) -> DataFrame:
    """Record rows -> (file, offset, member_seq, record_bytes binary): the
    byte-exact `cat` emission per record, computed executor-side.
    Concatenating a file's record_bytes in (offset, member_seq) order
    reproduces the plain-format file to the last good offset
    (pytest-pinned). member_seq matters only for multi-record gzip
    members, whose records all share the member's compressed offset (and
    where every record after the first has raw_length=0 by convention —
    the member's compressed length is carried once, on its first record)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "file": pdf["file"],
                "offset": pdf["offset"],
                "member_seq": pdf["member_seq"],
                "record_bytes": [
                    serialize_record(
                        r["version"],
                        [(h["name"], h["value"]) for h in r["headers"]],
                        bytes(r["content"]) if r["content"] is not None else b"",
                    )
                    if r["error"] is None and r["version"] is not None
                    else b""
                    for r in pdf.to_dict("records")
                ],
            }
            yield pd.DataFrame(out)

    return records.mapInPandas(
        run, "file string, offset long, member_seq int, record_bytes binary"
    )
