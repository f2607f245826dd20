"""WARC->WARC convert with repair — mirrors the reference's repair test
semantics (cmd/convert/warc/warc_test.go): converting the broken fixture
reports the expected number of repaired errors, and re-reading the
converted output with repair OFF finds zero remaining defects."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from warchaeology_spark.operators.convert import (
    convert_warc_repair,
    repair_result,
)

SCHEMA = (
    "file string, offset long, record_id string, checksum string,"
    " content_length long, payload string"
)


def sha1(s: str) -> str:
    return "sha1:" + hashlib.sha1(s.encode()).hexdigest()


def _broken_rows():
    # convert.warc analogue with exactly 5 repairable defects
    # (warc_test.go:84 wantNrErrors: 5)
    return [
        ("convert.warc", 0, "<urn:uuid:aaaa>", sha1("p0"), 2, "p0"),   # clean
        ("convert.warc", 1, None, sha1("p1"), 2, "p1"),               # missing id
        ("convert.warc", 2, "<urn:uuid:cccc>", None, 2, "p2"),        # missing digest
        ("convert.warc", 3, "<urn:uuid:dddd>", "sha1:bad", 2, "p3"),  # wrong digest
        ("convert.warc", 4, "<urn:uuid:eeee>", sha1("p4"), None, "p4"),  # missing CL
        ("convert.warc", 5, "<urn:uuid:ffff>", sha1("p5"), 99, "p5"),    # wrong CL
    ]


def test_repair_counts_match_reference_semantics(spark):
    df = spark.createDataFrame(_broken_rows(), SCHEMA)
    out = convert_warc_repair(df)
    res = repair_result(out).collect()[0]
    assert res["records"] == 6
    assert res["repair_count"] == 5

    rows = {r["offset"]: r for r in out.collect()}
    # clean record round-trips with only header normalization
    assert rows[0]["record_id"] == "urn:uuid:aaaa"
    assert rows[0]["repairs"] == []
    # added record id is deterministic and uuid-shaped
    rid = rows[1]["record_id"]
    assert rid.startswith("urn:uuid:") and len(rid) == len("urn:uuid:") + 36
    assert rows[1]["repairs"] == ["added missing record id"]
    assert rows[2]["repairs"] == ["added missing digest"]
    assert rows[3]["repairs"] == ["fixed digest"]
    assert rows[4]["repairs"] == ["added missing content length"]
    assert rows[5]["repairs"] == ["fixed content length"]
    # every output record carries a correct digest and content length
    for r in rows.values():
        assert r["checksum"] == sha1(r["payload"])
        assert r["content_length"] == len(r["payload"])


def test_repaired_output_revalidates_clean(spark):
    # reference: the repaired file re-read with repair off has no
    # validation errors (warc_test.go:142-168)
    df = spark.createDataFrame(_broken_rows(), SCHEMA)
    once = convert_warc_repair(df).drop("repairs")
    twice = convert_warc_repair(once)
    assert twice.filter(F.size("repairs") > 0).count() == 0
    # and the rebuild is idempotent: second pass changes nothing
    a = {tuple(r) for r in once.collect()}
    b = {tuple(r) for r in twice.drop("repairs").collect()}
    assert a == b


def test_foreign_digest_encodings_are_not_repairs(spark):
    # a genuinely-correct checksum stored in gowarc's sha1:BASE32 form or
    # as uppercase hex must not inflate repair_count (reference ErrorCount
    # counts real defects, not encoding differences)
    import base64

    def b32(s: str) -> str:
        return "sha1:" + base64.b32encode(hashlib.sha1(s.encode()).digest()).decode()

    rows = [
        ("f.warc", 0, "<urn:uuid:aaaa>", b32("p0"), 2, "p0"),                  # base32, correct
        ("f.warc", 1, "<urn:uuid:bbbb>", sha1("p1").upper(), 2, "p1"),         # SHA1:HEX uppercase
        ("f.warc", 2, "<urn:uuid:cccc>",
         "sha1:" + base64.b32encode(hashlib.sha1(b"other").digest()).decode(),
         2, "p2"),                                                             # base32, WRONG
    ]
    out = convert_warc_repair(spark.createDataFrame(rows, SCHEMA))
    got = {r["offset"]: r["repairs"] for r in out.collect()}
    assert got[0] == []
    assert got[1] == []
    assert got[2] == ["fixed digest"]
    # output is always re-rendered in the engine's canonical form
    for r in out.collect():
        assert r["checksum"] == sha1(r["payload"])


def test_repair_determinism_same_input_same_id(spark):
    df = spark.createDataFrame(_broken_rows(), SCHEMA)
    id1 = convert_warc_repair(df).filter("offset = 1").collect()[0]["record_id"]
    id2 = convert_warc_repair(df).filter("offset = 1").collect()[0]["record_id"]
    assert id1 == id2
