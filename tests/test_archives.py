"""Archive mounting (fs.go:36-134 analogue): zip/wacz/tgz members flow
through mount_archives -> walk_files -> validate/file-hash like plain
files, including the zip-slip guard."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
import zipfile

from warchaeology_spark.operators.validate import file_hash_raw
from warchaeology_spark.sources.archives import mount_archives
from warchaeology_spark.sources.walker import walk_files


def _make_archives(root: str) -> dict[str, bytes]:
    os.makedirs(root, exist_ok=True)
    members = {
        "a/rec-0001.warc": b"WARC/1.1\r\nWARC-Type: warcinfo\r\n\r\npayload-a",
        "rec-0002.warc": b"WARC/1.1\r\nWARC-Type: response\r\n\r\npayload-b",
    }
    with zipfile.ZipFile(os.path.join(root, "crawl1.zip"), "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
        zf.writestr("../evil.warc", b"escape attempt")  # zip-slip: must be skipped
    with zipfile.ZipFile(os.path.join(root, "crawl2.wacz"), "w") as zf:
        zf.writestr("archive/rec-0003.warc", b"WARC/1.1\r\n\r\npayload-c")
        zf.writestr("indexes/index.cdx", b"cdx line")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = b"WARC/1.1\r\n\r\npayload-d"
        info = tarfile.TarInfo("rec-0004.warc")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    with open(os.path.join(root, "crawl3.tar.gz"), "wb") as f:
        f.write(buf.getvalue())
    return members


def test_mount_walk_validate_flow(spark, tmp_path):
    arch_root = str(tmp_path / "archives")
    staging = str(tmp_path / "staging")
    members = _make_archives(arch_root)

    manifest = mount_archives(spark, arch_root, staging)
    rows = manifest.collect()
    by_member = {r["member"]: r for r in rows}
    assert "a/rec-0001.warc" in by_member
    assert "archive/rec-0003.warc" in by_member
    assert "rec-0004.warc" in by_member
    assert "indexes/index.cdx" in by_member
    assert not any("evil" in m for m in by_member)  # zip-slip rejected
    assert all(r["n_bytes"] > 0 for r in rows)

    # the staged members are ordinary inputs for the walker (S4)
    walked = walk_files(spark, staging, suffixes=(".warc",))
    assert walked.count() == 4

    # and the raw whole-file hash matches hashlib bit-for-bit (readers.go)
    hashed = {
        os.path.basename(r["file"]): r["file_hash"]
        for r in file_hash_raw(spark, staging, algo="sha256", glob="*.warc").collect()
    }
    assert hashed["rec-0001.warc"] == hashlib.sha256(members["a/rec-0001.warc"]).hexdigest()
    assert hashed["rec-0002.warc"] == hashlib.sha256(members["rec-0002.warc"]).hexdigest()


def test_mount_with_file_uri_staging_root(spark, tmp_path):
    # a scheme-carrying staging root must go through the pyarrow FS API
    # path (the cluster shape: staging on shared storage, not the
    # executor's local disk) and produce walkable out_paths
    arch_root = str(tmp_path / "archives2")
    _make_archives(arch_root)
    staging_uri = f"file://{tmp_path}/staging_uri"

    manifest = mount_archives(spark, arch_root, staging_uri)
    rows = manifest.collect()
    assert len(rows) == 5  # 4 warcs + the wacz index
    assert all(r["out_path"].startswith(staging_uri + "/") for r in rows)
    # files physically exist where the URI points
    for r in rows:
        local = r["out_path"][len("file://"):]
        assert os.path.isfile(local) and os.path.getsize(local) == r["n_bytes"]
    # and Spark readers resolve the manifest paths as-is
    walked = walk_files(spark, staging_uri, suffixes=(".warc",))
    assert walked.count() == 4


def test_file_hash_raw_algos(spark, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "x.bin").write_bytes(b"hello warc world")
    for algo, ref in [
        ("md5", hashlib.md5), ("sha1", hashlib.sha1),
        ("sha256", hashlib.sha256), ("sha512", hashlib.sha512),
    ]:
        got = file_hash_raw(spark, str(d), algo=algo).collect()[0]["file_hash"]
        assert got == ref(b"hello warc world").hexdigest(), algo
