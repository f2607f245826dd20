"""Operator-algebra parity (reference tests: internal/warc/combinators_test.go,
compose_integration_test.go; fixture semantics from FIXTURES.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from warchaeology_spark.operators.ls import (
    RecordFilter,
    cdx_projection,
    compose,
    ls_json_lines,
    ls_text_lines,
    parse_format_spec,
    parse_status_range,
    per_file_limit,
    per_file_nth,
    per_file_skip,
)


def test_fixture_counts(fetch_records):
    # compose_integration_test.go:22-54: empty->0, single->1, samsung->53
    by_file = dict(
        fetch_records.groupBy("file").count().collect()
    )
    counts = {r["file"]: r["count"] for r in fetch_records.groupBy("file").count().collect()}
    assert counts.get("empty.warc", 0) == 0
    assert counts["single-record.warc"] == 1
    assert counts["samsung-with-error.warc.gz"] == 53
    assert counts["dedup.warc"] == 20
    assert counts["convert.warc"] == 10


def test_nth_is_deterministic(fetch_records):
    # nth=7 has a fixed record id (compose_integration_test.go nth contract)
    got1 = per_file_nth(
        fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz"), 7
    ).select("record_id").collect()
    got2 = per_file_nth(
        fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz"), 7
    ).select("record_id").collect()
    assert len(got1) == 1
    assert got1 == got2
    # 1-based: nth=7 is the record at offset 6*4096
    row = per_file_nth(
        fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz"), 7
    ).collect()[0]
    assert row["offset"] == 6 * 4096


def test_limit_skip_laws(fetch_records):
    f = fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz")
    assert per_file_limit(f, 10).count() == 10
    assert per_file_skip(f, 50).count() == 3
    assert per_file_limit(f, 100).count() == 53
    # limit + skip partition the stream
    lim = {r["offset"] for r in per_file_limit(f, 10).select("offset").collect()}
    skp = {r["offset"] for r in per_file_skip(f, 10).select("offset").collect()}
    assert lim.isdisjoint(skp)
    assert len(lim | skp) == 53


def test_nth_wins_over_limit(fetch_records):
    # combinators_test.go:56 — Compose applies nth XOR limit, nth wins
    f = fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz")
    out = compose(f, nth=3, limit=10)
    assert out.count() == 1
    assert out.collect()[0]["offset"] == 2 * 4096


def test_record_filter(fetch_records):
    # filter.go:69-118 conjunctive semantics
    rf = RecordFilter(record_types=["response"], status="200-300")
    out = rf.apply(fetch_records)
    assert out.count() > 0
    assert all(r["record_type"] == "response" for r in out.select("record_type").distinct().collect())

    rf2 = RecordFilter(mimes=["TEXT/HTML"])  # case-insensitive substring
    assert rf2.apply(fetch_records).count() > 0

    ids = [r["record_id"] for r in fetch_records.limit(3).select("record_id").collect()]
    rf3 = RecordFilter(ids=ids)
    assert rf3.apply(fetch_records).count() == 3


def test_status_range_parse():
    assert parse_status_range("200-300") == (200, 300)
    assert parse_status_range("500-") == (500, 2**31 - 1)
    assert parse_status_range("-400") == (0, 400)
    assert parse_status_range("404") == (404, 405)


def test_format_spec_parse():
    assert parse_format_spec("V+11iT-8a100") == [
        ("V", "+", 11), ("i", "", 0), ("T", "-", 8), ("a", "", 100)
    ]


def test_cdx_projection_and_writers(fetch_records):
    one = fetch_records.filter(F.col("file") == "single-record.warc")
    proj = cdx_projection(one, "V+11iT-8a100")
    assert proj.columns == ["offset", "record_id", "type", "url"]
    row = proj.collect()[0]
    assert row["type"] == "response"
    assert row["url"] == "http://example.com/"
    # record id is bare uuid (36 chars)
    assert len(row["record_id"]) == 36

    line = ls_text_lines(one).collect()[0]["line"]
    # right-aligned offset field of width 11, left-aligned type of width 8
    assert line.split()[0] == "0"
    assert "response" in line

    js = ls_json_lines(one).collect()[0]["json"]
    assert '"url":"http://example.com/"' in js


def test_offset_seek(fetch_records):
    f = fetch_records.filter(F.col("file") == "samsung-with-error.warc.gz")
    out = compose(f, offset=10 * 4096)
    assert out.count() == 43


def test_every_spec_letter_projects(fetch_records):
    # every letter _SPEC_RE accepts must project without KeyError
    # (VERDICT r1 finding #1: M/r parsed but unimplemented)
    one = fetch_records.limit(1)
    all_letters = "abBeghikmMNrsSTV"
    proj = cdx_projection(one, all_letters)
    row = proj.collect()[0]
    assert len(row) == len(all_letters)
    # reference renders M and r as the literal '-' (recordwriter.go:299-311)
    assert row["meta"] == "-"
    assert row["redirect"] == "-"


def test_width_without_alignment_crops_but_never_pads(fetch_records):
    # padString (recordwriter.go:201-213): align==0 -> crop only, no pad.
    one = fetch_records.limit(1)
    padded = cdx_projection(one, "V+11T-8a100", padded=True).collect()[0]
    assert len(padded["offset"]) == 11          # '+' right-aligned pad
    assert len(padded["type"]) == 8             # '-' left-aligned pad
    assert len(padded["url"]) <= 100            # width-only: cropped, unpadded
    assert padded["url"] == padded["url"].strip()
