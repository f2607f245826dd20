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
        by_file[f].sort(key=lambda r: r["offset"])
    assert b"".join(bytes(r["record_bytes"]) for r in by_file["a.warc"]) == plain
    # the gzip file serializes to the same uncompressed byte stream
    assert b"".join(bytes(r["record_bytes"]) for r in by_file["b.warc.gz"]) == plain
    # header order survived the Arrow round trip
    hdr = scanned.filter("file = 'a.warc' and offset = 0").collect()[0]["headers"]
    assert [h["name"] for h in hdr][:2] == ["WARC-Record-ID", "WARC-Type"]
