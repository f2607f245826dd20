"""Digest functions (SURVEY §2.I F10, §2.D G3).

The reference computes/validates a payload digest when the header lacks one
(/root/reference/cmd/dedup/dedup.go:527-551) and hashes whole files during
validate (/root/reference/cmd/validate/readers.go:15-62). Here digests are
builtin JVM column expressions over a ``binary`` payload column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def digest_of(payload: Column | str, algo: str = "sha1") -> Column:
    """``'sha1:<hex>'``-prefixed digest of a binary column."""
    c = F.col(payload) if isinstance(payload, str) else payload
    algo = algo.lower()
    if algo == "md5":
        h = F.md5(c)
    elif algo == "sha1":
        h = F.sha1(c)
    elif algo in ("sha256", "sha512"):
        h = F.sha2(c, int(algo[3:]))
    else:
        raise ValueError(f"unsupported digest algo: {algo}")
    return F.concat(F.lit(algo + ":"), h)


def payload_digest_or_computed(
    payload_digest: Column | str, payload: Column | str, algo: str = "sha1"
) -> Column:
    """Header digest when present, else computed from the payload block.

    Mirrors dedup.go:449-452 + getDigest (dedup.go:527-551): the header
    ``WARC-Payload-Digest`` wins; a missing/empty header falls back to
    hashing the cached block.
    """
    pd = F.col(payload_digest) if isinstance(payload_digest, str) else payload_digest
    pd = F.when(F.length(F.trim(pd)) > 0, pd)
    return F.coalesce(pd, digest_of(payload, algo))
