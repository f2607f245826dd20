"""Byte-exact WARC cat parity on self-synthesized bytes (SURVEY §2 S8;
reference cmd/cat/cat.go:285-344, cat_test.go:43-174).

The reference's cat test asserts the re-serialized record equals the
input bytes. Its fixture corpus is git-lfs-pointered in this image, so
the tests synthesize their OWN multi-record WARC (plain and
per-record-gzip) from fixture-row data and assert
``serialize(scan(bytes)) == bytes`` to the last good offset — the same
contract, no external fixture needed.
"""

from __future__ import annotations

import pandas as pd

from warchaeology_spark.sources.warc import (
    gzip_member,
    parse_warc_file,
    parse_warc_member,
    scan_warc_bytes,
    serialize_record,
    serialize_warc,
)


def _mk_record(i: int, payload: bytes) -> bytes:
    headers = [
        ("WARC-Record-ID", f"<urn:uuid:0000-{i:04d}>"),
        ("WARC-Type", "response" if i % 2 == 0 else "request"),
        ("WARC-Date", f"2020-01-0{(i % 9) + 1}T00:00:00Z"),
        ("WARC-Target-URI", f"https://example.com/p/{i}"),
        ("Content-Type", "application/http;msgtype=response"),
        ("Content-Length", str(len(payload))),
    ]
    return serialize_record("WARC/1.1", headers, payload)


def _corpus(n: int = 5) -> list[bytes]:
    # payloads include CRLF CRLF *inside* a body (must not split records)
    # and binary bytes (must survive untouched)
    return [
        _mk_record(i, b"HTTP/1.1 200 OK\r\n\r\nbody-%d " % i + bytes(range(i + 3)))
        for i in range(n)
    ]


def test_plain_roundtrip_bytes_exact():
    recs = _corpus()
    blob = b"".join(recs)
    rows = parse_warc_file("f.warc", blob)
    assert [r["error"] for r in rows] == [None] * len(recs)
    assert [r["offset"] for r in rows] == [
        sum(len(x) for x in recs[:i]) for i in range(len(recs))
    ]
    rebuilt = b"".join(
        serialize_record(r["version"], r["headers"], r["content"]) for r in rows
    )
    assert rebuilt == blob  # byte-exact, not just structural


def test_gzip_members_serialize_to_plain_bytes():
    recs = _corpus()
    gz_blob = b"".join(gzip_member(r) for r in recs)
    rows = parse_warc_file("f.warc.gz", gz_blob)
    assert [r["error"] for r in rows] == [None] * len(recs)
    # offsets address the COMPRESSED stream (reference offset semantics)
    assert rows[0]["offset"] == 0
    assert rows[-1]["offset"] + rows[-1]["raw_length"] == len(gz_blob)
    rebuilt = b"".join(
        serialize_record(r["version"], r["headers"], r["content"]) for r in rows
    )
    assert rebuilt == b"".join(recs)  # cat prints the uncompressed form


def test_parse_stops_at_last_good_offset():
    recs = _corpus(3)
    blob = b"".join(recs) + b"GARBAGE NOT A RECORD"
    rows = parse_warc_file("f.warc", blob)
    good = [r for r in rows if r["error"] is None]
    bad = [r for r in rows if r["error"] is not None]
    assert len(good) == 3 and len(bad) == 1
    assert bad[0]["offset"] == sum(len(x) for x in recs)  # last good offset
    rebuilt = b"".join(
        serialize_record(r["version"], r["headers"], r["content"]) for r in good
    )
    assert rebuilt == b"".join(recs)


def test_member_grammar_errors():
    ok = _mk_record(0, b"x")
    assert parse_warc_member(b"HTTP/1.1 not warc\r\n\r\nzz\r\n\r\n", 0)[2]
    assert parse_warc_member(ok[: len(ok) - 6], 0)[2]  # truncated separator
    assert parse_warc_member(b"WARC/1.1\r\nNoColonHere\r\n\r\n", 0)[2]
    no_len = serialize_record("WARC/1.1", [("WARC-Type", "response")], b"x")
    assert "Content-Length" in parse_warc_member(no_len, 0)[2]


def test_warc_file_to_cdx_end_to_end(spark, tmp_path):
    """S1<->S8 integration: WARC files ON DISK -> distributed binaryFile
    scan -> typed record table -> the existing CDX projection operator.
    The byte codec feeds the whole ls surface, not just round-trips."""
    from warchaeology_spark.operators.ls import cdx_projection
    from warchaeology_spark.sources.warc import read_warc, records_table

    recs = _corpus(4)
    (tmp_path / "a.warc").write_bytes(b"".join(recs[:2]))
    (tmp_path / "b.warc.gz").write_bytes(b"".join(gzip_member(r) for r in recs[2:]))
    table = records_table(read_warc(spark, str(tmp_path)))
    rows = {
        (r["file"].rsplit("/", 1)[1], r["offset"]): r for r in table.collect()
    }
    assert len(rows) == 4
    r0 = rows[("a.warc", 0)]
    assert r0["record_id"] == "urn:uuid:0000-0000"
    assert r0["record_type"] == "response"
    assert r0["url"] == "https://example.com/p/0"
    assert r0["status_code"] == 200
    assert r0["size"] == len(recs[0])
    assert bytes(r0["payload"]).startswith(b"HTTP/1.1 200 OK")
    assert str(r0["ts"]).startswith("2020-01-01")
    # the ls operator runs directly on the scanned table
    cdx = cdx_projection(table, "V+11iT-8a100").collect()
    assert len(cdx) == 4
    by_url = {c["url"]: c for c in cdx}
    assert by_url["https://example.com/p/3"]["type"].strip() == "request"


def test_spark_scan_and_serialize_roundtrip(spark):
    recs = _corpus()
    plain = b"".join(recs)
    gz = b"".join(gzip_member(r) for r in recs)
    files = spark.createDataFrame(
        pd.DataFrame({"file": ["a.warc", "b.warc.gz"], "content": [plain, gz]})
    )
    scanned = scan_warc_bytes(files)
    out = serialize_warc(scanned).collect()
    by_file: dict[str, list] = {}
    for r in out:
        by_file.setdefault(r["file"], []).append(r)
    for f in by_file:
        by_file[f].sort(key=lambda r: (r["offset"], r["member_seq"]))
    assert b"".join(bytes(r["record_bytes"]) for r in by_file["a.warc"]) == plain
    # the gzip file serializes to the same uncompressed byte stream
    assert b"".join(bytes(r["record_bytes"]) for r in by_file["b.warc.gz"]) == plain
    # header order survived the Arrow round trip
    hdr = scanned.filter("file = 'a.warc' and offset = 0").collect()[0]["headers"]
    assert [h["name"] for h in hdr][:2] == ["WARC-Record-ID", "WARC-Type"]


def test_duplicate_content_length_is_error():
    """gowarc flags a repeated Content-Length as a validation error; a
    last-win would silently mis-size the block (VERDICT r4 #7)."""
    headers = [
        ("WARC-Record-ID", "<urn:uuid:dup-cl>"),
        ("WARC-Type", "response"),
        ("Content-Length", "1"),
        ("Content-Length", "3"),
    ]
    blob = serialize_record("WARC/1.1", headers, b"x")
    _, _, err = parse_warc_member(blob, 0)
    assert err == "duplicate Content-Length header"
    # the file-level scan surfaces it as an error row, keeping priors
    rows = parse_warc_file("f.warc", _mk_record(0, b"ok") + blob)
    assert [r["error"] for r in rows] == [None, "duplicate Content-Length header"]


def test_gzip_member_with_multiple_records_yields_all():
    """A gzip member holding >1 record must yield every record, not just
    the first (ADVICE r4: the reference reads the stream continuously).
    All records of a member share its compressed offset; only the first
    carries the compressed length."""
    recs = _corpus(3)
    blob = gzip_member(recs[0] + recs[1]) + gzip_member(recs[2])
    rows = parse_warc_file("f.warc.gz", blob)
    assert [r["error"] for r in rows] == [None] * 3
    assert [r["offset"] for r in rows] == [0, 0, rows[2]["offset"]]
    assert rows[0]["raw_length"] > 0 and rows[1]["raw_length"] == 0
    # (offset, member_seq) is the unique record address within a file
    assert [r["member_seq"] for r in rows] == [0, 1, 0]
    rebuilt = b"".join(
        serialize_record(r["version"], r["headers"], r["content"]) for r in rows
    )
    assert rebuilt == b"".join(recs)
    # a malformed tail INSIDE a member still errors at that member
    bad = gzip_member(recs[0] + b"GARBAGE")
    rows = parse_warc_file("g.warc.gz", bad)
    assert rows[0]["error"] is None and rows[1]["error"] is not None


def test_records_table_repeated_header_and_payload_mime(spark):
    """Two semantics pinned against the reference (ADVICE r4 + VERDICT r4
    missing #1): (a) a legally repeated header (WARC-Concurrent-To,
    gowarc WarcFields) must not abort the scan with DUPLICATED_MAP_KEY —
    first value wins in the typed map; (b) mime_type comes from the HTTP
    payload block's Content-Type, not the WARC envelope header
    (internal/warc/metadata_helpers.go:70-82)."""
    from warchaeology_spark.sources.warc import records_table

    payload = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Server: x\r\n\r\n<html></html>"
    )
    headers = [
        ("WARC-Record-ID", "<urn:uuid:rev-1>"),
        ("WARC-Type", "revisit"),
        ("WARC-Target-URI", "https://example.com/a"),
        ("WARC-Concurrent-To", "<urn:uuid:first>"),
        ("WARC-Concurrent-To", "<urn:uuid:second>"),
        ("Content-Type", "application/http; msgtype=response"),
        ("Content-Length", str(len(payload))),
    ]
    rec = serialize_record("WARC/1.1", headers, payload)
    meta_payload = b"hopsFromSeed: P\r\n"
    meta = serialize_record(
        "WARC/1.1",
        [
            ("WARC-Record-ID", "<urn:uuid:meta-1>"),
            ("WARC-Type", "metadata"),
            ("Content-Type", "application/warc-fields"),
            ("Content-Length", str(len(meta_payload))),
        ],
        meta_payload,
    )
    files = spark.createDataFrame(
        pd.DataFrame({"file": ["f.warc"], "content": [rec + meta]})
    )
    rows = {r["record_id"]: r for r in records_table(scan_warc_bytes(files)).collect()}
    assert len(rows) == 2  # repeated header did not kill the job
    assert rows["urn:uuid:rev-1"]["mime_type"] == "text/html; charset=utf-8"
    assert rows["urn:uuid:rev-1"]["status_code"] == 200
    # non-HTTP records keep the WARC envelope Content-Type
    assert rows["urn:uuid:meta-1"]["mime_type"] == "application/warc-fields"
    # a response whose HTTP head lacks Content-Type -> null, not envelope
    bare = serialize_record(
        "WARC/1.1",
        [
            ("WARC-Record-ID", "<urn:uuid:bare>"),
            ("WARC-Type", "response"),
            ("Content-Type", "application/http; msgtype=response"),
            ("Content-Length", "19"),
        ],
        b"HTTP/1.1 204 No\r\n\r\n",
    )
    files2 = spark.createDataFrame(
        pd.DataFrame({"file": ["g.warc"], "content": [bare]})
    )
    (row,) = records_table(scan_warc_bytes(files2)).collect()
    assert row["mime_type"] is None


def test_records_table_binary_payload_survives(spark):
    """Binary payloads (images, gzip bodies) are ubiquitous in real WARCs
    and must not abort the typed lift (ADVICE r5 high: Spark 4's UTF-8
    decode raises MALFORMED_CHARACTER_CODING on invalid bytes; the head
    window is decoded as ISO-8859-1, which maps every byte). Covers: an
    HTTP response whose body is invalid-UTF-8 binary inside the 8192-byte
    window, AND a multi-byte UTF-8 character split exactly at the cut."""
    from warchaeology_spark.sources.warc import records_table

    http_head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n"
    )
    # \x89PNG magic then bytes that are NOT valid UTF-8 (lone continuation
    # bytes, overlong-ish sequences) well inside the decode window
    binary_body = b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8
    rec_bin = serialize_record(
        "WARC/1.1",
        [
            ("WARC-Record-ID", "<urn:uuid:bin-1>"),
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "https://example.com/img.png"),
            ("Content-Type", "application/http; msgtype=response"),
            ("Content-Length", str(len(http_head) + len(binary_body))),
        ],
        http_head + binary_body,
    )
    # a 3-byte UTF-8 char (\xe2\x82\xac, EURO SIGN) straddling offset 8192
    pad = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    body = b"a" * (8191 - len(pad)) + "€".encode("utf-8") + b" tail"
    rec_split = serialize_record(
        "WARC/1.1",
        [
            ("WARC-Record-ID", "<urn:uuid:split-1>"),
            ("WARC-Type", "response"),
            ("WARC-Target-URI", "https://example.com/page"),
            ("Content-Type", "application/http; msgtype=response"),
            ("Content-Length", str(len(pad) + len(body))),
        ],
        pad + body,
    )
    files = spark.createDataFrame(
        pd.DataFrame({"file": ["bin.warc"], "content": [rec_bin + rec_split]})
    )
    rows = {r["record_id"]: r for r in records_table(scan_warc_bytes(files)).collect()}
    assert len(rows) == 2  # neither record aborted the scan job
    assert rows["urn:uuid:bin-1"]["mime_type"] == "image/png"
    assert rows["urn:uuid:bin-1"]["status_code"] == 200
    assert bytes(rows["urn:uuid:bin-1"]["payload"]).endswith(bytes(range(256)))
    assert rows["urn:uuid:split-1"]["mime_type"] == "text/html"
    assert rows["urn:uuid:split-1"]["status_code"] == 200
