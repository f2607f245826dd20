"""Archive ingest job: mount zip/wacz/tar inputs as plain files.

The reference walks into archives through an in-process virtual FS
(/root/reference/internal/fs/fs.go:36-134, suffix dispatch at
internal/filewalker/filewalker.go:135-138). Spark's unit of input is
files, so the cluster rendering is this batch pre-extraction step:

    python jobs/ingest_archives_job.py --root /data/drops --staging /data/staged

after which the normal pipeline (walk_files -> validate/convert/dedup)
consumes ``--staging`` exactly as it would a directory of plain WARCs.
Each archive is one task; re-runs are idempotent (same member -> same
output path, overwritten in place).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from warchaeology_spark.session import get_spark  # noqa: E402
from warchaeology_spark.sources.archives import ARCHIVE_SUFFIXES, mount_archives  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="directory containing archives")
    ap.add_argument("--staging", required=True, help="extraction target (shared storage)")
    ap.add_argument("--suffixes", default=",".join(ARCHIVE_SUFFIXES))
    args = ap.parse_args()

    spark = get_spark("ingest-archives")
    manifest = mount_archives(
        spark, args.root, args.staging, tuple(args.suffixes.split(","))
    )
    rows = manifest.count()
    archives = manifest.select("archive").distinct().count()
    print(json.dumps({"archives": archives, "members": rows, "staging": args.staging}))
    spark.stop()


if __name__ == "__main__":
    main()
