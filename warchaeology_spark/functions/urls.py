"""URL canonicalization, SURT keys, and 64-bit hashing (SURVEY §2.I F5 + §7 M4).

The reference extracts hostnames with a WHATWG parser
(/root/reference/internal/warc/metadata_helpers.go:49-56, with
``--lax-host-parsing`` at cmd/internal/flag/warcrecordoptions_flags.go:22-24).
The frontier (north rule) additionally needs a *canonical* URL and a
SURT-style sort/partition key.

Canonicalization spec (applied identically by every implementation here —
the JVM column builder, the pandas UDF, and the pure-Python oracle):

1. trim; only ``http``/``https`` schemes are crawlable -> others yield NULL;
   scheme-relative ``//host/..`` and bare ``host/path`` get ``http://``.
2. scheme and host lowercased; userinfo stripped; trailing ``.`` in host
   stripped; default ports (http:80 / https:443) removed.
3. fragment removed; empty path -> ``/``.
4. query params split on ``&``, empties dropped, sorted lexicographically,
   rejoined; an empty query drops its ``?``.
5. ``url_canon = scheme://host[:port]path[?query]``
6. ``surt = rev(host labels, ',') + ')' + path [+ '?' + query]`` — scheme
   dropped so http/https collapse, matching SURT practice.

The default implementation is builtin column expressions (JVM,
whole-stage-codegen, usable in predicate pushdown); the pandas UDF exists
for WHATWG-lenient parsing parity and is tested to agree with the JVM path
on well-formed URLs.

``url_hash64`` is Spark's builtin ``xxhash64`` (seed 42); ``xxhash64_py``
is a pure-Python XXH64 used by the sequential parity oracle and tested to
match Spark bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*):"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _with_scheme(c: Column) -> Column:
    """Ensure an explicit scheme so the component regexes apply.

    startswith('//') not rlike('^//'): byte-scan intrinsic, no
    Pattern.matcher allocation (r4 A/B, BENCH/ab_parse.json)."""
    t = F.trim(c)
    return (
        F.when(t.startswith("//"), F.concat(F.lit("http:"), t))
        .when(t.rlike(_SCHEME_RE), t)
        .otherwise(F.concat(F.lit("http://"), t))
    )


def url_parts(url: Column | str) -> Column:
    """Struct<scheme,host,port,path,query> parsed with JVM expressions.

    Mixed regex/intrinsic chain (r4 A/B `jvm_intrinsics`, +34%/4-core and
    +21%/16-core over the all-regex chain, fuzz-verified bit-identical):
    the three cheapest regex steps are byte-scan ``substring_index`` —
    - scheme: after ``_with_scheme`` the FIRST ':' always terminates the
      scheme (scheme chars exclude ':'), so no anchor regex is needed;
    - userinfo strip: segment after the LAST '@' == greedy ``^.*@`` strip;
    - host: prefix before the first ':' == ``^([^:]*)``.
    The auth/path/query extractions stay compiled regexes — the r2
    shootout showed chains of many allocating intrinsics LOSE to few
    compiled regex passes; only 1:1 regex->intrinsic swaps win."""
    u = _with_scheme(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.substring_index(u, ":", 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    hostport = F.substring_index(auth, "@", -1)  # strip userinfo (last @)
    host = F.lower(F.regexp_replace(F.substring_index(hostport, ":", 1), r"\.$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    # sort_array/array_remove, NOT array_sort/filter-with-lambda: lambda
    # higher-order functions are CodegenFallback, and a fallback expression
    # drags its whole subtree into interpreted eval at every reference —
    # this line is embedded in canon+surt+filter copies on the hot path.
    query = F.array_join(F.sort_array(F.array_remove(F.split(query, "&"), "")), "&")
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path.alias("path"),
        query.alias("query"),
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL per the module spec; NULL for non-http(s)/hostless."""
    p = url_parts(url)
    canon = F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        F.when(p["port"] != "", F.concat(F.lit(":"), p["port"])).otherwise(F.lit("")),
        p["path"],
        F.when(p["query"] != "", F.concat(F.lit("?"), p["query"])).otherwise(F.lit("")),
    )
    ok = p["scheme"].isin("http", "https") & (p["host"] != "") & p["host"].rlike(
        r"^[a-z0-9.\-]+$"
    )
    return F.when(ok, canon)


def surt_key(url: Column | str) -> Column:
    """SURT-style key: ``com,example)/path?query`` (scheme dropped)."""
    p = url_parts(url)
    rev_host = F.array_join(F.reverse(F.split(p["host"], r"\.")), ",")
    key = F.concat(
        rev_host,
        F.when(p["port"] != "", F.concat(F.lit(":"), p["port"])).otherwise(F.lit("")),
        F.lit(")"),
        p["path"],
        F.when(p["query"] != "", F.concat(F.lit("?"), p["query"])).otherwise(F.lit("")),
    )
    ok = p["scheme"].isin("http", "https") & (p["host"] != "") & p["host"].rlike(
        r"^[a-z0-9.\-]+$"
    )
    return F.when(ok, key)


def canonical_parts(url: Column | str) -> Column:
    """Fused struct<url_canon, surt, host> from ONE url_parts evaluation.

    canonicalize_url + surt_key as separate expression trees duplicate the
    component regexes; this builder shares them explicitly (the frontier's
    hot path — halves the string work per URL).
    """
    p = url_parts(url)
    ok = p["scheme"].isin("http", "https") & (p["host"] != "") & p["host"].rlike(
        r"^[a-z0-9.\-]+$"
    )
    portpart = F.when(p["port"] != "", F.concat(F.lit(":"), p["port"])).otherwise(F.lit(""))
    qpart = F.when(p["query"] != "", F.concat(F.lit("?"), p["query"])).otherwise(F.lit(""))
    tail = F.concat(portpart, F.lit(")"), p["path"], qpart)  # surt tail
    canon = F.concat(p["scheme"], F.lit("://"), p["host"], portpart, p["path"], qpart)
    rev_host = F.array_join(F.reverse(F.split(p["host"], r"\.")), ",")
    surt = F.concat(rev_host, tail)
    return F.struct(
        F.when(ok, canon).alias("url_canon"),
        F.when(ok, surt).alias("surt"),
        F.when(ok, p["host"]).alias("host"),
    )


def host_of(url: Column | str) -> Column:
    """WHATWG-ish hostname extraction (metadata_helpers.go:49-56 analogue)."""
    return url_parts(url)["host"]


def url_hash64(url_canon: Column | str) -> Column:
    """64-bit key for the seen-set / bloom layer: builtin xxhash64 (seed 42)."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.xxhash64(c)


# ---------------------------------------------------------------------------
# pandas-UDF lenient path (WHATWG-ish; Arrow-batched, vectorized str ops)
# ---------------------------------------------------------------------------

_PD_SPLIT = (
    r"^(?:([a-zA-Z][a-zA-Z0-9+.\-]*):)?(?:\/\/)?"
    r"(?:[^/?#@]*@)?([^/?#:]*)(?::(\d+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)


def _canonicalize_pd_strict(s: pd.Series) -> pd.Series:
    """Spec-exact vectorized canonicalization: reproduces the JVM column
    chain (and canonicalize_py) bit-for-bit on EVERY input, including the
    component-regex quirks — userinfo strips greedily to the LAST ``@``,
    the query is the first ``?`` ANYWHERE (even after a ``#``), a port is
    only digits running to the end of the authority. One multi-group
    extract for scheme/auth/path + short vectorized passes over the
    authority — the Arrow-side step-1 candidate (A/B: BENCH/ab_parse.json).
    """
    t = s.fillna("").str.strip(" ")  # ASCII space only = Spark trim()
    has_scheme = t.str.match(_SCHEME_RE)
    protocol_rel = t.str.match(r"^//")
    t = t.mask(protocol_rel, "http:" + t)
    t = t.mask(~has_scheme & ~protocol_rel, "http://" + t)
    m = t.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)")
    scheme = m[0].str.lower().fillna("")
    auth = m[1].fillna("")
    hostport = auth.str.replace(r"^.*@", "", regex=True)  # greedy: last @
    host = (
        hostport.str.split(":", n=1).str[0].str.lower()
        .str.replace(r"\.$", "", regex=True)
    )
    port = hostport.str.extract(r":(\d+)$")[0].fillna("")
    port = port.mask(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        "",
    )
    path = m[2].fillna("")
    path = path.mask(path == "", "/")
    query = t.str.extract(_QUERY_RE)[0].fillna("")  # re.search semantics
    qsorted = query.str.split("&").map(
        lambda xs: "&".join(sorted(x for x in xs if x)) if isinstance(xs, list) else ""
    )
    canon = (
        scheme + "://" + host
        + (":" + port).where(port != "", "")
        + path
        + ("?" + qsorted).where(qsorted != "", "")
    )
    ok = scheme.isin(["http", "https"]) & (host != "") & host.str.match(r"^[a-z0-9.\-]+$")
    return canon.where(ok, None)


def _canonicalize_pd(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series (lenient UDF body)."""
    # strip ASCII space ONLY — Spark's trim() semantics; Python's default
    # strip() also eats \x1c-\x1f etc. and would diverge from the JVM path
    t = s.fillna("").str.strip(" ")
    # WHATWG leniency: backslashes in the authority/path act as slashes
    t = t.str.replace("\\", "/", regex=False)
    has_scheme = t.str.match(_SCHEME_RE)
    protocol_rel = t.str.match(r"^//")
    t = t.mask(protocol_rel, "http:" + t)
    t = t.mask(~has_scheme & ~protocol_rel, "http://" + t)
    parts = t.str.extract(_PD_SPLIT)
    scheme = parts[0].str.lower().fillna("")
    host = parts[1].str.lower().str.replace(r"\.$", "", regex=True).fillna("")
    port = parts[2].fillna("")
    port = port.mask(((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")), "")
    path = parts[3].fillna("")
    path = path.mask(path == "", "/")
    query = parts[4].fillna("")
    qsorted = query.str.split("&").map(
        lambda xs: "&".join(sorted(x for x in xs if x)) if isinstance(xs, list) else ""
    )
    canon = (
        scheme + "://" + host
        + (":" + port).where(port != "", "")
        + path
        + ("?" + qsorted).where(qsorted != "", "")
    )
    ok = scheme.isin(["http", "https"]) & (host != "") & host.str.match(r"^[a-z0-9.\-]+$")
    return canon.where(ok, None)


@F.pandas_udf(T.StringType())
def canonicalize_url_lenient(s: pd.Series) -> pd.Series:
    """WHATWG-lenient canonicalization (handles ``\\`` separators etc.)."""
    return _canonicalize_pd(s)


@F.pandas_udf(T.StringType())
def canonicalize_url_arrow(s: pd.Series) -> pd.Series:
    """Spec-exact Arrow-batched canonicalization (_canonicalize_pd_strict):
    bit-identical to the JVM ``canonicalize_url`` on every input
    (property-fuzzed incl. backslashes), but one multi-group extract +
    short authority passes instead of the ~10 per-component JVM regex
    evaluations — BENCH/ab_parse.json decides which one step-1 uses."""
    return _canonicalize_pd_strict(s)


# ---------------------------------------------------------------------------
# Pure-Python XXH64 (seed 42) — the oracle's hash; matches Spark's xxhash64.
# Implemented from the public xxHash spec (github.com/Cyan4973/xxHash).
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, val: int) -> int:
    acc = (acc + val * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxhash64_py(data: bytes | str, seed: int = 42) -> int:
    """XXH64 as a *signed* int64, matching Spark's ``xxhash64`` on strings."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(_merge(_merge(_merge(h, v1), v2), v3), v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# Pure-Python canonicalization — the sequential oracle's twin of
# canonicalize_url/surt_key. Must match the JVM implementation exactly.
# ---------------------------------------------------------------------------


def canonicalize_py(url: str | None) -> tuple[str, str, str] | None:
    """Returns (url_canon, surt, host) or None for non-crawlable URLs."""
    if not url:
        return None
    import re as _re

    t = url.strip(" ")  # ASCII space only = Spark trim() semantics
    if t.startswith("//"):
        t = "http:" + t
    elif not _re.match(_SCHEME_RE, t):
        t = "http://" + t
    m = _re.match(_SCHEME_RE, t)
    scheme = m.group(1).lower() if m else ""
    m = _re.match(_AUTH_RE, t)
    auth = m.group(1) if m else ""
    hostport = _re.sub(r"^.*@", "", auth)
    hm = _re.match(r"^([^:]*)", hostport)
    host = _re.sub(r"\.$", "", (hm.group(1) if hm else "").lower())
    pm = _re.search(r":(\d+)$", hostport)
    port = pm.group(1) if pm else ""
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    m = _re.match(_PATH_RE, t)
    path = m.group(1) if m else ""
    if path == "":
        path = "/"
    m = _re.search(_QUERY_RE, t)
    query = m.group(1) if m else ""
    query = "&".join(sorted(x for x in query.split("&") if x))
    if scheme not in ("http", "https") or not host or not _re.match(r"^[a-z0-9.\-]+$", host):
        return None
    portpart = f":{port}" if port else ""
    qpart = f"?{query}" if query else ""
    canon = f"{scheme}://{host}{portpart}{path}{qpart}"
    surt = ",".join(reversed(host.split("."))) + portpart + ")" + path + qpart
    return canon, surt, host


def parts_from_canon(canon: Column | str) -> Column:
    """Struct<surt, host> derived from an ALREADY-CANONICAL url.

    ``url_canon`` is clean by construction — ``scheme://host[:port]path
    [?query]`` with a lowercase dot-trimmed host, path always starting
    with ``/`` — so SURT and host fall out of byte-scan intrinsics
    (substring_index/instr), no regexes. This is the second stage of the
    two-step frontier parse: stage 1 materializes ``url_canon`` once
    (checkpoint/shuffle boundary), stage 2 derives the rest cheaply, so
    the expensive raw-URL parse runs ONCE per row instead of once per
    consumer expression (Catalyst inlines column expressions into every
    consumer; see BENCH/BASELINE.md round-2 notes).

    Parity contract (tested): for any raw URL,
    ``parts_from_canon(canonicalize_url(u))`` equals ``canonical_parts(u)``
    on the surt and host fields.
    """
    c = F.col(canon) if isinstance(canon, str) else canon
    after = F.substring(c, F.instr(c, "://") + 3, 1 << 30)
    hostport = F.substring_index(after, "/", 1)  # path always starts with '/'
    host = F.substring_index(hostport, ":", 1)
    portpart = F.substring(hostport, F.length(host) + 1, 1 << 30)  # ':port' or ''
    pathq = F.substring(after, F.length(hostport) + 1, 1 << 30)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), portpart, F.lit(")"), pathq
    )
    return F.struct(surt.alias("surt"), host.alias("host"))
