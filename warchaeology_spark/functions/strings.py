"""String scalar functions (SURVEY §2.I F6-F8, F11).

Semantics mirror the reference:
- crop_string: /root/reference/internal/util/utils.go:16-21
  (truncate to n-1 chars and append an ellipsis when longer than n)
- pad_field:   /root/reference/cmd/ls/recordwriter.go:201-224
- normalize_record_id: /root/reference/internal/index/codec.go:89-99
- parse_size_in_bytes: /root/reference/internal/util/utils.go:39-74
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

ELLIPSIS = "…"


def crop_string(col: Column | str, n: int) -> Column:
    """Truncate to ``n-1`` chars + ellipsis when longer than ``n``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > n, F.concat(F.substring(c, 1, n - 1), F.lit(ELLIPSIS))
    ).otherwise(c)


def pad_field(col: Column | str, width: int, align: str = "left") -> Column:
    """Pad to fixed ``width`` after cropping; align 'left' => rpad.

    The reference crops first then pads (recordwriter.go:201-224), so a
    value longer than the field width is always exactly ``width`` chars
    ending in the ellipsis.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = crop_string(c, width)
    return F.rpad(c, width, " ") if align == "left" else F.lpad(c, width, " ")


def normalize_record_id(col: Column | str) -> Column:
    """Strip ``<urn:uuid:...>`` wrapping -> bare 36-char uuid, else NULL.

    Mirrors codec.go:89-99 which errors on a non-36-char result; here the
    error channel is a NULL (callers count NULLs as validation errors).
    """
    c = F.col(col) if isinstance(col, str) else col
    bare = F.regexp_replace(c, r"^<?(urn:uuid:)?|>$", "")
    return F.when(F.length(bare) == 36, bare).otherwise(F.lit(None))


_SIZE_RE = re.compile(r"^\s*([0-9.]+)\s*([kmgtp]?)b?\s*$", re.IGNORECASE)
_MULT = {"": 1, "k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4, "p": 1024**5}


def parse_size_in_bytes(s: str) -> int:
    """Driver/config-side '2KB' -> 2048 (1024-based), utils.go:39-74."""
    m = _SIZE_RE.match(s)
    if not m:
        raise ValueError(f"unparseable size: {s!r}")
    return int(float(m.group(1)) * _MULT[m.group(2).lower()])
