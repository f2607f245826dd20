"""FTP virtual-FS input (reference internal/fs/fs.go:100-134): recursive
listing + distributed fetch-to-staging against a local stub server, then
the standard walk/validate flow over the staged files."""

from __future__ import annotations

import hashlib
import os

from tests.ftpstub import FtpStub
from warchaeology_spark.operators.validate import file_hash_raw
from warchaeology_spark.sources.ftp import ftp_list, ftp_stage
from warchaeology_spark.sources.walker import walk_files

FILES = {
    "crawls/a/rec-0001.warc": b"WARC/1.1\r\nWARC-Type: warcinfo\r\n\r\npayload-a",
    "crawls/rec-0002.warc": b"WARC/1.1\r\nWARC-Type: response\r\n\r\npayload-b",
    "crawls/notes.txt": b"not a warc",
    "other/rec-0003.warc": b"WARC/1.1\r\n\r\npayload-c",
}


def test_ftp_list_recursive():
    with FtpStub(FILES) as srv:
        rows = ftp_list(f"ftp://user:pw@127.0.0.1:{srv.port}/crawls")
        got = {r["path"]: r["size"] for r in rows}
        assert got == {
            "/crawls/a/rec-0001.warc": len(FILES["crawls/a/rec-0001.warc"]),
            "/crawls/rec-0002.warc": len(FILES["crawls/rec-0002.warc"]),
            "/crawls/notes.txt": len(FILES["crawls/notes.txt"]),
        }


def test_ftp_stage_walk_validate_flow(spark, tmp_path):
    staging = str(tmp_path / "ftp_staged")
    with FtpStub(FILES) as srv:
        url = f"ftp://user:pw@127.0.0.1:{srv.port}/crawls"
        staged = ftp_stage(spark, url, staging, suffixes=(".warc",))
        rows = staged.collect()
    by_rel = {r["path"]: r for r in rows}
    assert set(by_rel) == {"/crawls/a/rec-0001.warc", "/crawls/rec-0002.warc"}
    for r in rows:
        assert os.path.isfile(r["out_path"])
        assert os.path.getsize(r["out_path"]) == r["n_bytes"]

    # staged files are ordinary walker inputs (S4/ftp parity)
    walked = walk_files(spark, staging, suffixes=(".warc",))
    assert walked.count() == 2
    # bit-exact transfer: raw hash matches hashlib over the source bytes
    hashed = {
        os.path.basename(r["file"]): r["file_hash"]
        for r in file_hash_raw(spark, staging, algo="sha1", glob="*.warc").collect()
    }
    assert hashed["rec-0001.warc"] == hashlib.sha1(FILES["crawls/a/rec-0001.warc"]).hexdigest()
    assert hashed["rec-0002.warc"] == hashlib.sha1(FILES["crawls/rec-0002.warc"]).hexdigest()
