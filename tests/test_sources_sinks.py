"""Sources, sinks, streaming, hooks (SURVEY §2 S/J/K tiers)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from warchaeology_spark.operators.hooks import ERROR, OK, SKIP, Hooks
from warchaeology_spark.operators.sinks import cat_parse, cat_serialize, warc_sink
from warchaeology_spark.sources.arc import parse_arc_v1_lines
from warchaeology_spark.sources.nedlib import parse_nedlib_pairs
from warchaeology_spark.sources.walker import (
    read_source_file_list,
    resume_filter,
    walk_files,
)


def test_walker_suffix_and_dedup(spark, tmp_path):
    for sub in ("a", "a/b"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for p in ("a/x.warc", "a/y.txt", "a/b/z.warc", "a/b/w.warc.gz"):
        (tmp_path / p).write_text("data")
    got = walk_files(spark, str(tmp_path), suffixes=(".warc", ".warc.gz"))
    names = sorted(r["path"].rsplit("/", 1)[1] for r in got.collect())
    assert names == ["w.warc.gz", "x.warc", "z.warc"]


def test_source_file_list_and_resume(spark, tmp_path):
    lst = tmp_path / "sources.txt"
    lst.write_text("/data/one.warc\n\n  /data/two.warc  \n")
    assert read_source_file_list(spark, str(lst)) == [
        "/data/one.warc", "/data/two.warc",
    ]
    files = spark.createDataFrame([("a",), ("b",), ("c",)], "path string")
    done = spark.createDataFrame([("b",)], "path string")
    left = {r["path"] for r in resume_filter(files, done).collect()}
    assert left == {"a", "c"}


def test_arc_v1_parse(spark):
    lines = spark.createDataFrame(
        [
            ("http://example.com/ 10.0.0.1 20030719044541 text/html 1234",),
            ("garbage line",),
            ("http://broken",),  # resyncable prefix but malformed
        ],
        "value string",
    )
    rows = parse_arc_v1_lines(lines).collect()
    ok = rows[0]
    assert ok["url"] == "http://example.com/"
    assert ok["ip_address"] == "10.0.0.1"
    assert str(ok["ts"]) == "2003-07-19 04:45:41"
    assert ok["size"] == 1234
    assert ok["validation_errors"] == []
    assert rows[1]["validation_errors"] == ["unparseable ARC data"]
    assert rows[2]["validation_errors"] == ["malformed ARC header line (resynchronized)"]


def test_nedlib_parse(spark):
    meta = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: image/gif\r\n"
        b"Date: Sat, 19 Jul 2003 04:45:41 GMT\r\n"
        b"Arc-Url: http://example.no/img.gif\r\n"
        b"Arc-Length: 512\r\n"
    )
    df = spark.createDataFrame(
        [("f1.meta", bytearray(meta)), ("f2.meta", bytearray(b"junk"))],
        "path string, content binary",
    )
    rows = {r["file"]: r for r in parse_nedlib_pairs(df).collect()}
    r = rows["f1.meta"]
    assert r["url"] == "http://example.no/img.gif"
    assert r["size"] == 512
    assert r["mime_type"] == "image/gif"
    assert r["status_code"] == 200
    assert str(r["ts"]) == "2003-07-19 04:45:41"
    assert rows["f2.meta"]["validation_errors"] == ["missing Arc-Url header"]


def test_warc_sink_subdirs_and_rotation(spark, fetch_records, tmp_path):
    out = str(tmp_path / "sink")
    warc_sink(fetch_records, out, max_records_per_file=10)
    # date-derived subdir layout {YYYY}/{MM}/{DD} (namer.go:47-53)
    assert os.path.isdir(f"{out}/year=2021/month=03/day=01")
    back = spark.read.parquet(out)
    assert back.count() == fetch_records.count()
    # rotation: no data file holds more than 10 records
    per_file = back.groupBy(F.input_file_name()).count().agg(F.max("count")).collect()[0][0]
    assert per_file <= 10


def test_cat_roundtrip(spark, fetch_records):
    one = fetch_records.filter(F.col("file") == "dedup.warc")
    ser = cat_serialize(one)
    text = ser.filter(F.col("offset") == 4096).collect()[0]["warc_text"]
    assert text.startswith("WARC/1.1\r\n")
    assert "WARC-Target-URI: http://a.example.com/1" in text
    back = cat_parse(ser)
    orig = {r["offset"]: r for r in one.collect()}
    for r in back.collect():
        o = orig[r["offset"]]
        assert r["record_id"] == o["record_id"].replace("urn:uuid:", "urn:uuid:")
        assert f"urn:uuid:" in r["record_id"] or r["record_id"]
        assert r["record_type"] == o["record_type"]
        assert bytes(r["payload"]) == bytes(o["payload"])


def test_streaming_incremental_validate(spark, fetch_records, tmp_path):
    from warchaeology_spark.streaming.incremental import incremental_validate

    src = str(tmp_path / "in")
    fetch_records.write.mode("overwrite").parquet(src)
    q = incremental_validate(
        spark, src, fetch_records.schema,
        str(tmp_path / "ckpt"), str(tmp_path / "results"),
        max_files_per_trigger=2,
    )
    q.awaitTermination(120)
    res = spark.read.parquet(str(tmp_path / "results"))
    agg = res.groupBy("file").agg(F.sum("records").alias("records"))
    got = {r["file"]: r["records"] for r in agg.collect()}
    assert got["samsung-with-error.warc.gz"] == 53
    assert got["dedup.warc"] == 20


def test_hooks_skip_and_error():
    h = Hooks(open_input=[lambda ctx: SKIP if "skipme" in ctx["file_name"] else OK])
    kept, skipped = h.filter_files(["a.warc", "skipme.warc", "b.warc"], "validate")
    assert kept == ["a.warc", "b.warc"]
    assert skipped == ["skipme.warc"]

    h2 = Hooks(open_input=[lambda ctx: ERROR])
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        h2.filter_files(["x.warc"], "validate")


def test_streaming_seen_filter(spark, tmp_path):
    """Stateful streaming dedup: first occurrence wins across micro-batches."""
    from pyspark.sql import functions as F

    from warchaeology_spark.streaming.seen_stream import streaming_seen_filter

    src = str(tmp_path / "urls_in")
    # two files -> two-ish micro-batches; hash 2 duplicated within a file,
    # hash 5 duplicated across files
    spark.createDataFrame(
        [(2, "s2", "u2"), (2, "s2", "u2"), (5, "s5", "u5"), (7, "s7", "u7")],
        "url_hash long, surt string, url_canon string",
    ).coalesce(1).write.mode("overwrite").parquet(src + "/a")
    spark.createDataFrame(
        [(5, "s5", "u5"), (9, "s9", "u9")],
        "url_hash long, surt string, url_canon string",
    ).coalesce(1).write.mode("overwrite").parquet(src + "/b")

    stream = (
        spark.readStream.schema("url_hash long, surt string, url_canon string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out_dir = str(tmp_path / "urls_out")
    q = (
        streaming_seen_filter(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["url_hash"] for r in spark.read.parquet(out_dir).collect())
    assert got == [2, 5, 7, 9]  # each hash exactly once, dups dropped


def test_batch_replay_is_idempotent(spark, fetch_records, tmp_path):
    # a foreachBatch retry re-runs with the SAME batch_id: the dynamic
    # partition overwrite must not duplicate that batch's rows
    from warchaeology_spark.operators.validate import per_file_stats
    from warchaeology_spark.streaming.incremental import write_batch_stats

    results = str(tmp_path / "res")
    stats = per_file_stats(fetch_records)
    write_batch_stats(stats, 0, results)
    write_batch_stats(stats, 1, results)
    write_batch_stats(stats, 1, results)  # replay of batch 1
    res = spark.read.parquet(results)
    assert res.filter("batch_id = 1").count() == stats.count()
    assert res.count() == 2 * stats.count()
