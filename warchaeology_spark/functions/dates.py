"""Date/time scalar functions (SURVEY §2.I F1-F4, F15).

- to14 / from14:  ARC 14-digit UTC timestamps
  (/root/reference/internal/time/timestamp.go:10-19)
- to_w3cdtf:      RFC3339 (timestamp.go:24-26)
- parse_http_date: the reference's 15-format lenient fallback chain
  (/root/reference/nedlibreader/time.go:14-76) with its fixups:
  ':60' leap-second clamp-and-add (time.go:82-87), broken 3-digit year
  '103' -> 2003 (time.go:101-113), Norwegian locale month/day names with
  Europe/Oslo CET/CEST (time.go:116-213).

Strategy: Spark's parser cannot consume day-of-week text ('E' is
format-only), so the weekday prefix is stripped with one regexp and the
remaining body is pushed through a coalesce of ``to_timestamp`` formats —
all JVM-side. The Norwegian locale is the one genuinely UDF-shaped case:
an Arrow-batched pandas UDF that translates name tokens then reuses the
same format chain in pandas, applied only to rows the JVM chain left NULL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def to14(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMddHHmmss")


def from14(s: Column | str) -> Column:
    c = F.col(s) if isinstance(s, str) else s
    return F.to_timestamp(c, "yyyyMMddHHmmss")


def to_w3cdtf(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ssXXX")


# The try-order matters and mirrors time.go:14-76 (after weekday strip the
# distinct bodies below cover RFC1123(Z)/RFC850/ANSIC/UnixDate/RFC822(Z)/
# no-leading-zero-day/RFC2822 variants).
_BODY_FORMATS = [
    "dd MMM yyyy HH:mm:ss zzz",   # RFC1123 / no-leading-zero collapses here too
    "dd MMM yyyy HH:mm:ss Z",     # RFC1123Z / RFC2822 numeric zone
    "d MMM yyyy HH:mm:ss zzz",
    "d MMM yyyy HH:mm:ss Z",
    "dd-MMM-yy HH:mm:ss zzz",     # RFC850
    "MMM d HH:mm:ss yyyy",        # ANSIC
    "MMM d HH:mm:ss zzz yyyy",    # UnixDate
    "dd MMM yy HH:mm zzz",        # RFC822
    "dd MMM yy HH:mm Z",          # RFC822Z
    "dd MMM yyyy HH:mm:ss",       # zone-less RFC2822 tail
    "d MMM yyyy HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ssXXX",   # RFC3339 stragglers
    "yyyy-MM-dd HH:mm:ss",
]

# Norwegian token -> English (time.go:116-213); lowercase keys, longest first.
_NO_MONTHS = {
    "januar": "Jan", "februar": "Feb", "mars": "Mar", "april": "Apr",
    "mai": "May", "juni": "Jun", "juli": "Jul", "august": "Aug",
    "september": "Sep", "oktober": "Oct", "november": "Nov",
    "desember": "Dec", "jan": "Jan", "feb": "Feb", "mar": "Mar",
    "apr": "Apr", "jun": "Jun", "jul": "Jul", "aug": "Aug", "sep": "Sep",
    "okt": "Oct", "nov": "Nov", "des": "Dec",
}
_NO_DAYS = ["mandag", "tirsdag", "onsdag", "torsdag", "fredag", "lørdag",
            "søndag", "man", "tir", "ons", "tor", "fre", "lør", "søn",
            "ma", "ti", "on", "to", "fr", "lø", "sø"]


def _strip_weekday(c: Column) -> Column:
    # leading alpha (incl. Norwegian æøå) weekday + optional comma
    return F.trim(F.regexp_replace(c, r"^[A-Za-zæøåÆØÅ]{2,9},?\s+", ""))


def _fixups(c: Column) -> tuple[Column, Column]:
    """Returns (fixed_string, had_leap_second)."""
    leap = c.rlike(r":60(\s|$)")
    fixed = F.regexp_replace(c, r":60(\s|$)", r":59$1")  # time.go:82-87
    # broken-year '103' = 2003 (Go year-since-1900 artifact, time.go:101-113)
    fixed = F.regexp_replace(fixed, r"\b1(\d\d) (\d\d:\d\d:\d\d)", r"20$1 $2")
    return fixed, leap


def parse_http_date(raw: Column | str) -> Column:
    """JVM-side lenient parse chain; NULL when no format matches.

    Use :func:`parse_http_date_full` to also catch the Norwegian-locale
    rows via the pandas-UDF fallback.
    """
    c = F.col(raw) if isinstance(raw, str) else raw
    body, leap = _fixups(_strip_weekday(F.trim(c)))
    parsed = F.coalesce(*[F.try_to_timestamp(body, F.lit(f)) for f in _BODY_FORMATS])
    return F.when(leap & parsed.isNotNull(), parsed + F.expr("INTERVAL 1 SECOND")).otherwise(parsed)


@F.pandas_udf(T.TimestampType())
def _parse_norwegian(raw: pd.Series) -> pd.Series:
    """Arrow-batched fallback for the Norwegian-locale formats.

    Vectorized pandas string ops only: token translation via regex
    replace, then a small number of whole-column ``pd.to_datetime``
    attempts (each attempt is a single C-level pass).
    """
    s = raw.fillna("").str.strip().str.lower()
    for d in sorted(_NO_DAYS, key=len, reverse=True):
        s = s.str.replace(rf"^{d},?\s+", "", regex=True)
    for no, en in sorted(_NO_MONTHS.items(), key=lambda kv: -len(kv[0])):
        s = s.str.replace(rf"\b{no}\.?\b", en, regex=True, case=False)
    # CET/CEST resolve through Europe/Oslo wall-clock rules (time.go:116-213
    # parses in the Oslo location, so July "CET" is actually CEST +0200) —
    # strip the token, parse naive, then tz-localize Oslo below.
    oslo = s.str.contains(r"\bce?st?\b|\bcet\b", regex=True)
    s = s.str.replace(r"\s*\bcest\b|\s*\bcet\b", "", regex=True)
    leap = s.str.contains(r":60(?:\s|$)", regex=True)
    s = s.str.replace(r":60(\s|$)", r":59\1", regex=True)
    out = pd.Series(pd.NaT, index=s.index, dtype="datetime64[ns]")
    for fmt in ["%d %b %Y %H:%M:%S %z", "%d %b %Y %H:%M:%S",
                "%d %b %y %H:%M:%S %z", "%d %b %y %H:%M %z"]:
        mask = out.isna() & (s != "")
        if not mask.any():
            break
        parsed = pd.to_datetime(s[mask], format=fmt, errors="coerce", utc=True)
        out.loc[mask] = parsed.dt.tz_localize(None) if parsed.dt.tz is not None else parsed
    # Oslo-localize the rows whose zone token we stripped (DST-aware)
    om = oslo & out.notna()
    if om.any():
        out.loc[om] = (
            out.loc[om]
            .dt.tz_localize("Europe/Oslo", ambiguous=True, nonexistent="shift_forward")
            .dt.tz_convert("UTC")
            .dt.tz_localize(None)
        )
    out.loc[leap & out.notna()] = out.loc[leap & out.notna()] + pd.Timedelta(seconds=1)
    return out


def parse_http_date_full(raw: Column | str) -> Column:
    """JVM chain first; pandas-UDF Norwegian fallback for remaining NULLs."""
    c = F.col(raw) if isinstance(raw, str) else raw
    fast = parse_http_date(c)
    return F.coalesce(fast, _parse_norwegian(c))
