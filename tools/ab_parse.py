"""A/B the canonicalize (step-1) implementations on the kernel's URL mix.

VERDICT r2 #2 asks for measurements of the two remaining untried parse
levers: (a) a one-pass regexp-split (one compiled multi-group pattern,
fragment pre-stripped with substring_index), (b) the Arrow-side pandas
canonicalizer at the checkpoint boundary. Off-heap variants added because
the ladder is allocation/GC-bound. Each child times the step-1
materialization (canonicalize -> filter -> localCheckpoint) over
SPARK_GRAFT_AB_URLS synthetic URLs in a FRESH JVM (subprocess), trials
interleaved across variants so co-tenant drift hits all of them equally.
``busy_before`` is a 1-second /proc/stat sample of the box's current
non-idle CPU fraction (loadavg trails our own finished children and is
misleading).

Usage:
  python tools/ab_parse.py                   # all variants at 4 and 16
  python tools/ab_parse.py --child <variant> <cpus> <n_urls>   # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ("jvm", "jvm_offheap", "pd_arrow", "pd_arrow_offheap", "regex_onepass",
            "parse_url", "parse_url_offheap", "jvm_intrinsics")

_ONEPASS_PAT = (
    r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://(?:[^/?#@]*@)?([^/?#:]*)"
    r"(?::(\d+))?([^?#]*)(?:\?(.*))?$"
)


def busy_fraction(interval: float = 1.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            parts = [int(x) for x in f.readline().split()[1:]]
        idle = parts[3] + parts[4]  # idle + iowait
        return idle, sum(parts)

    i0, t0 = snap()
    time.sleep(interval)
    i1, t1 = snap()
    dt = t1 - t0
    return round(1.0 - (i1 - i0) / dt, 3) if dt else 0.0


def _urls_df(spark, n_urls: int, cpus: int):
    from pyspark.sql import functions as F

    i = F.col("id")
    raw = F.format_string(
        "HTTPS://Host%d.Example.COM:443/p/%d?b=%d&a=1#f",
        F.pmod(i, F.lit(10_000)), i, F.pmod(i, F.lit(7)),
    )
    return spark.range(n_urls, numPartitions=cpus * 2).select(raw.alias("raw_url"))


def _canonicalize_onepass(col):
    """One compiled multi-group regex (fragment pre-stripped via
    substring_index). Spark has no multi-group single-call extract, so the
    pattern still EVALUATES once per component — the A/B measures whether
    one big compiled pattern beats the per-component regex chain."""
    from pyspark.sql import functions as F

    from warchaeology_spark.functions.urls import _with_scheme

    u = F.substring_index(_with_scheme(col), "#", 1)
    scheme = F.lower(F.regexp_extract(u, _ONEPASS_PAT, 1))
    host = F.lower(F.regexp_extract(u, _ONEPASS_PAT, 2))
    host = F.when(
        host.endswith("."), F.substring(host, 1, F.length(host) - 1)
    ).otherwise(host)
    port = F.regexp_extract(u, _ONEPASS_PAT, 3)
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_extract(u, _ONEPASS_PAT, 4)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, _ONEPASS_PAT, 5)
    query = F.array_join(F.sort_array(F.array_remove(F.split(query, "&"), "")), "&")
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & (host != "") & host.rlike(r"^[a-z0-9.\-]+$")
    return F.when(ok, canon)


def _canonicalize_parse_url(col):
    """Spark's built-in parse_url (java.net.URI-based ParseUrl expression,
    one recursive-descent parse per call — no regex backtracking). Never
    A/B'd before; semantics differ from the regex chain on messy inputs,
    so this measures the THROUGHPUT CEILING of the approach — parity work
    only happens if it wins decisively."""
    from pyspark.sql import functions as F

    from warchaeology_spark.functions.urls import _with_scheme

    u = _with_scheme(col)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"\.$", "")
    auth = F.parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.parse_url(u, F.lit("PATH"))
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    query = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    query = F.array_join(F.sort_array(F.array_remove(F.split(query, "&"), "")), "&")
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & (host != "") & host.rlike(r"^[a-z0-9.\-]+$")
    return F.when(ok, canon)


def _canonicalize_intrinsics(col):
    """The r3 residual lever (VERDICT r3 next #2): keep the winning
    per-component regex chain but replace its CHEAPEST regex steps with
    single byte-scan intrinsics — each swap removes one Pattern.matcher
    allocation + match per row per reference, the allocation class the
    stage split blames for the canonicalize scaling knee. Swaps (each
    provably semantics-identical after _with_scheme):
    - scheme: regexp_extract(^scheme:) -> substring_index(u, ':', 1)
      (after _with_scheme the first ':' always terminates the scheme);
    - userinfo strip: regexp_replace(^.*@) -> substring_index(auth,'@',-1)
      (both take the segment after the LAST '@'; none -> whole string);
    - host-before-colon: regexp_extract(^[^:]*) -> substring_index(
      hostport, ':', 1);
    - protocol-relative test: rlike(^//) -> startswith('//').
    Everything else (auth/path/query extraction, trailing-dot strip, port)
    stays the measured-fastest compiled-regex form."""
    from pyspark.sql import functions as F

    from warchaeology_spark.functions.urls import (
        _AUTH_RE,
        _PATH_RE,
        _QUERY_RE,
        _SCHEME_RE,
    )

    t = F.trim(col)
    u = (
        F.when(t.startswith("//"), F.concat(F.lit("http:"), t))
        .when(t.rlike(_SCHEME_RE), t)
        .otherwise(F.concat(F.lit("http://"), t))
    )
    scheme = F.lower(F.substring_index(u, ":", 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    hostport = F.substring_index(auth, "@", -1)
    host = F.lower(
        F.regexp_replace(F.substring_index(hostport, ":", 1), r"\.$", "")
    )
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(
        ((scheme == "http") & (port == "80")) | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(port)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    query = F.array_join(F.sort_array(F.array_remove(F.split(query, "&"), "")), "&")
    canon = F.concat(
        scheme, F.lit("://"), host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    ok = scheme.isin("http", "https") & (host != "") & host.rlike(r"^[a-z0-9.\-]+$")
    return F.when(ok, canon)


def child(variant: str, cpus: int, n_urls: int) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import functions as F

    from warchaeology_spark.functions.urls import (
        canonicalize_url,
        canonicalize_url_lenient,
    )
    from warchaeology_spark.session import get_spark

    extra = {}
    if variant.endswith("_offheap"):
        extra = {
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": "16g",
        }
    spark = get_spark(f"ab-{variant}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, extra_conf=extra)
    urls = _urls_df(spark, n_urls, cpus).localCheckpoint(eager=True)
    urls.count()  # input fully materialized before the clock starts

    if variant == "jvm_intrinsics":
        expr = _canonicalize_intrinsics(F.col("raw_url"))
    elif variant.startswith("jvm"):
        expr = canonicalize_url(F.col("raw_url"))
    elif variant.startswith("pd_arrow"):
        expr = canonicalize_url_lenient(F.col("raw_url"))
    elif variant == "regex_onepass":
        expr = _canonicalize_onepass(F.col("raw_url"))
    elif variant.startswith("parse_url"):
        expr = _canonicalize_parse_url(F.col("raw_url"))
    else:
        raise SystemExit(f"unknown variant {variant}")

    t0 = time.monotonic()
    step1 = (
        urls.select(expr.alias("url_canon"))
        .filter(F.col("url_canon").isNotNull())
        .localCheckpoint(eager=True)
    )
    n = step1.count()
    elapsed = time.monotonic() - t0
    print(json.dumps({
        "variant": variant, "cpus": cpus, "n_urls": n_urls, "n_out": n,
        "elapsed_sec": round(elapsed, 2),
        "urls_per_sec": round(n_urls / elapsed, 1),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
        return
    n_urls = int(os.environ.get("SPARK_GRAFT_AB_URLS", "16000000"))
    cpu_list = [int(c) for c in os.environ.get("SPARK_GRAFT_AB_CPUS", "4,16").split(",")]
    trials = int(os.environ.get("SPARK_GRAFT_AB_TRIALS", "2"))
    sel = os.environ.get("SPARK_GRAFT_AB_VARIANTS")
    variants = tuple(sel.split(",")) if sel else VARIANTS
    results = []
    for _ in range(trials):
        for cpus in cpu_list:
            for variant in variants:
                busy = busy_fraction()
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     variant, str(cpus), str(n_urls)],
                    capture_output=True, text=True, timeout=1800,
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                )
                try:
                    rec = json.loads(out.stdout.strip().splitlines()[-1])
                except Exception:
                    rec = {"variant": variant, "cpus": cpus,
                           "error": out.stderr.strip()[-500:]}
                rec["busy_before"] = busy
                results.append(rec)
                print(json.dumps(rec), flush=True)
    out_path = "BENCH/ab_parse.json"
    try:
        with open(out_path) as f:
            prior = json.load(f)
    except Exception:
        prior = []
    with open(out_path, "w") as f:
        json.dump(prior + results, f, indent=2)


if __name__ == "__main__":
    main()
