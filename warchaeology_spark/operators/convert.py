"""WARC->WARC convert with repair (reference cmd/convert/warc/warc.go:338-376;
repair options at cmd/convert/warc/warc_test.go:110-123).

The reference rebuilds every record through a gowarc RecordBuilder with
repair options and counts each repaired defect as an error in the per-file
Result (warc_test.go:137-139 asserts the count). The Spark rendering is a
column-level rebuild over record rows: every repairable defect is detected
and fixed scan-side (pure JVM expressions, zero shuffle), and the list of
repairs rides along per record so the per-file aggregate reproduces the
reference's ErrorCount semantics.

gowarc option -> column rule:
- WithAddMissingRecordId     : NULL/empty record_id -> a *deterministic*
  ``urn:uuid`` derived from (file, offset). The reference draws a random
  uuid; determinism makes re-runs idempotent (same input -> same output),
  which the distributed retry model requires.
- WithAddMissingDigest       : NULL checksum -> digest(payload)
- WithFixDigest              : checksum != digest(payload) -> recompute
- WithAddMissingContentLength: NULL content_length -> octet_length(payload)
- WithFixContentLength       : wrong content_length -> octet_length(payload)
Header normalization (handleRecord copies every header through the
builder): record ids are normalized to the canonical ``urn:uuid:...``
form (angle brackets stripped), mirroring normalizeRecordID (F11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPAIR_ADDED_RECORD_ID = "added missing record id"
REPAIR_ADDED_DIGEST = "added missing digest"
REPAIR_FIXED_DIGEST = "fixed digest"
REPAIR_ADDED_CONTENT_LENGTH = "added missing content length"
REPAIR_FIXED_CONTENT_LENGTH = "fixed content length"


def digest_of(payload: Column, algo: str = "sha1") -> Column:
    """``algo:hex`` digest column; md5 is the DuckDB-portable choice."""
    if algo == "sha1":
        return F.concat(F.lit("sha1:"), F.sha1(payload))
    if algo == "md5":
        return F.concat(F.lit("md5:"), F.md5(payload))
    raise ValueError(f"unsupported digest algo: {algo}")


# RFC 4648 base32 alphabet -> the 0-9A-V digit set F.conv expects
_B32_SRC = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
_B32_DST = "0123456789ABCDEFGHIJKLMNOPQRSTUV"


def _b32_group_hex(val: Column, i: int) -> Column:
    """Hex of 8 base32 chars (40 bits — inside conv's 64-bit range)."""
    g = F.substring(val, i * 8 + 1, 8)
    return F.lpad(F.lower(F.conv(F.translate(g, _B32_SRC, _B32_DST), 32, 16)), 10, "0")


def normalize_checksum(ck: Column) -> Column:
    """Canonical ``algo:lowercase-hex`` form of a stored WARC digest.

    The WARC/gowarc convention writes sha1 digests as ``sha1:`` + 32 chars
    of uppercase base32 (gowarc digest rendering); other producers write
    upper- or lower-case hex. Validity must be judged on the decoded value,
    not this engine's own rendering, or a correct foreign-encoded checksum
    is miscounted as a 'fixed digest' repair. Handles: case-insensitive
    algo label, uppercase hex, and sha1 base32 (32 chars [A-Z2-7] -> 40 hex
    chars, decoded JVM-side: alphabet translate + four 40-bit conv groups).
    A value with no ``algo:`` label is lowercased as-is (ambiguous — it can
    never equal the labeled canonical form, so it still counts as a repair).
    """
    has_label = ck.contains(":")
    algo = F.lower(F.substring_index(ck, ":", 1))
    val = F.substring_index(ck, ":", -1)
    # decode base32 case-insensitively: a correct digest stored as
    # LOWERCASE base32 must decode too, or it is miscounted as a 'fixed
    # digest' repair — the exact miscount class this normalization exists
    # to eliminate (ADVICE r3 #5)
    val_u = F.upper(val)
    is_b32_sha1 = (algo == "sha1") & val_u.rlike("^[A-Z2-7]{32}$")
    hex_val = F.when(
        is_b32_sha1, F.concat(*[_b32_group_hex(val_u, i) for i in range(4)])
    ).otherwise(F.lower(val))
    return F.when(~has_label, F.lower(ck)).otherwise(
        F.concat(algo, F.lit(":"), hex_val)
    )


def deterministic_record_id(*key_cols: Column) -> Column:
    """uuid-shaped id from an md5 of the record's stable identity —
    the AddMissingRecordId repair, made deterministic."""
    h = F.md5(F.concat_ws("#", *[c.cast("string") for c in key_cols]))
    return F.concat(
        F.lit("urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
    )


def convert_warc_repair(
    records: DataFrame,
    payload_col: str = "payload",
    record_id_col: str = "record_id",
    checksum_col: str = "checksum",
    content_length_col: str = "content_length",
    digest_algo: str = "sha1",
    id_key_cols: tuple[str, ...] = ("file", "offset"),
) -> DataFrame:
    """Rebuild records with repairs; adds a ``repairs`` array<string>.

    Records with no defects pass through unchanged with an empty repairs
    array (the convert-without-repair path, warc.go:338-356: every record
    is rebuilt, valid ones round-trip identically).
    """
    p = F.col(payload_col)
    rid = F.col(record_id_col)
    ck = F.col(checksum_col)
    cl = F.col(content_length_col)

    norm_id = F.regexp_replace(rid, r"^<|>$", "")
    id_missing = rid.isNull() | (F.trim(rid) == "")
    fixed_id = F.when(
        id_missing, deterministic_record_id(*[F.col(c) for c in id_key_cols])
    ).otherwise(norm_id)

    expected_digest = digest_of(p, digest_algo)
    digest_missing = ck.isNull() | (F.trim(ck) == "")
    # compare on the normalized form: a correct checksum stored as base32
    # or uppercase hex is NOT a repair (ADVICE r2; reference ErrorCount
    # counts real defects, not encoding differences)
    digest_wrong = ~digest_missing & (normalize_checksum(ck) != expected_digest)

    expected_cl = F.octet_length(p).cast("long")
    cl_missing = cl.isNull()
    cl_wrong = ~cl_missing & (cl != expected_cl)

    repairs = F.array_compact(
        F.array(
            F.when(id_missing, F.lit(REPAIR_ADDED_RECORD_ID)),
            F.when(digest_missing, F.lit(REPAIR_ADDED_DIGEST)),
            F.when(digest_wrong, F.lit(REPAIR_FIXED_DIGEST)),
            F.when(cl_missing, F.lit(REPAIR_ADDED_CONTENT_LENGTH)),
            F.when(cl_wrong, F.lit(REPAIR_FIXED_CONTENT_LENGTH)),
        )
    )
    # repairs FIRST: it reads the pre-repair columns the later withColumns replace
    return (
        records.withColumn("repairs", repairs)
        .withColumn(record_id_col, fixed_id)
        .withColumn(checksum_col, expected_digest)  # always rebuilt (builder)
        .withColumn(content_length_col, expected_cl)
    )


def repair_result(repaired: DataFrame, file_col: str = "file") -> DataFrame:
    """Per-file Result over a repaired frame: records + error(repair) count
    (the reference's result.ErrorCount asserted at warc_test.go:137-139)."""
    return repaired.groupBy(file_col).agg(
        F.count(F.lit(1)).alias("records"),
        F.sum(F.size("repairs")).cast("long").alias("repair_count"),
    )
