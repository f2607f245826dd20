"""Deterministic synthetic fixtures (FIXTURES.md §1-5, seed-free pure arithmetic).

Everything derives from integer/hash arithmetic over ``spark.range`` — no RNG
state, no driver-side loops — so generation is reproducible at any scale and
parallelises like any other DataFrame job. The sequential parity oracle
re-reads the *written parquet* (never re-derives), so engine and oracle see
byte-identical inputs.

Link-graph shape (drives the frontier tests):
- hosts ``h{k}.example.org`` for k>=1 plus one heavy host
  ``heavy.example.org`` (k=0); doc ``i`` lives at
  ``https://{host(i % n_hosts)}/p{i // n_hosts}``.
- outlink targets are ``xxhash64``-derived; ~30% of targets land on the
  heavy host (FIXTURES.md §5 skew knob), the rest uniformly on all docs.
- ~1/5 of embedded URLs are written in a non-canonical variant (uppercase
  scheme/host, explicit default port, fragment, unsorted query) to exercise
  canonicalization end-to-end.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Tier:
    n_docs: int
    n_hosts: int
    links_per_doc: int  # approximate
    n_seeds: int


TIERS = {
    "t1": Tier(n_docs=500, n_hosts=20, links_per_doc=4, n_seeds=8),
    "t2": Tier(n_docs=5_000, n_hosts=100, links_per_doc=6, n_seeds=25),
    "bench": Tier(n_docs=50_000, n_hosts=1_000, links_per_doc=10, n_seeds=100),
    "bench4x": Tier(n_docs=200_000, n_hosts=2_000, links_per_doc=10, n_seeds=200),
    # mid-scale frontier bench (VERDICT r4 next #5): big enough that a
    # round schedules ~10^5 URLs, so frontier URLs/sec measures the
    # pipeline instead of fixed per-round job cost (the old "bench" tier
    # scheduled 938 URLs across 3 rounds — fixed cost was ~100% of it)
    "mid": Tier(n_docs=2_000_000, n_hosts=5_000, links_per_doc=8, n_seeds=50_000),
    # 10x mid (VERDICT r5 next #6): one run at this tier makes the
    # frontier F+W/cores fixed-cost fit falsifiable — the fit projects
    # its efficiency at 10x the round size; measuring it checks the model
    "mid10x": Tier(n_docs=20_000_000, n_hosts=50_000, links_per_doc=8,
                   n_seeds=500_000),
    # 30x mid (VERDICT r6 next #6, "if time permits"): a second decade
    # point for the amortization extrapolation the charter cares about
    "mid30x": Tier(n_docs=60_000_000, n_hosts=150_000, links_per_doc=8,
                   n_seeds=1_500_000),
}

HEAVY_HOST = "heavy.example.org"


def _host_name(host_idx):
    return F.when(host_idx == 0, F.lit(HEAVY_HOST)).otherwise(
        F.format_string("h%d.example.org", host_idx)
    )


def _doc_url(i, n_hosts: int):
    """Canonical URL of doc index i."""
    return F.format_string(
        "https://%s/p%d",
        _host_name(F.pmod(i, F.lit(n_hosts))),
        (i / n_hosts).cast("long"),
    )


def _link_url(i, j, k, tier: Tier):
    """Deterministic outlink target URL for (doc i, span j, link k).

    ~30% heavy-host targets; 1-in-5 written in a non-canonical variant.
    """
    n_hosts = tier.n_hosts
    heavy_pages = max(1, tier.n_docs // n_hosts)
    h = F.xxhash64(F.format_string("link-%d-%d-%d", i, j, k))
    hu = F.abs(h)  # non-negative for pmod-style arithmetic
    is_heavy = F.pmod(hu, F.lit(10)) < 3
    target_doc = F.pmod(hu, F.lit(tier.n_docs))
    base = F.when(
        is_heavy,
        F.format_string("https://%s/p%d", F.lit(HEAVY_HOST), F.pmod(hu, F.lit(heavy_pages))),
    ).otherwise(_doc_url(target_doc, n_hosts))
    variant = F.pmod(hu, F.lit(5))
    return (
        F.when(variant == 1, F.concat(F.upper(F.substring(base, 1, 12)), F.substring(base, 13, 2048)))
        .when(variant == 2, F.concat(base, F.lit("#frag")))
        .when(variant == 3, F.regexp_replace(base, r"^https://([^/]+)/", r"https://$1:443/"))
        .when(variant == 4, F.concat(base, F.lit("?b=2&a=1")))
        .otherwise(base)
    )


def gen_documents_spans(spark: SparkSession, tier_name: str = "t1") -> DataFrame:
    """documents_spans(doc_id, url, spans) — FIXTURES.md §1.

    ``url`` (the doc's own address) is kept as a column: the frontier join
    "fetch URL -> document" needs it, and it mirrors the reference's
    WARC-Target-URI. ``spans`` interleave text/media; media spans carry a
    ``media_ref`` URL; text spans embed 1-2 outlinks (href= and bare).
    Span-sequence invariant: offset == ordinal, strictly increasing.
    """
    tier = TIERS[tier_name]
    i = F.col("id")
    df = spark.range(tier.n_docs)
    n_spans = (F.pmod(i, F.lit(4)) + 2).cast("int")

    def mk_span(j):
        is_media = F.pmod(i + j, F.lit(3)) == 0
        link0 = _link_url(i, j, F.lit(0), tier)
        link1 = _link_url(i, j, F.lit(1), tier)
        two_links = F.pmod(i + j, F.lit(2)) == 0
        text = F.when(
            is_media, F.lit(None).cast("string")
        ).otherwise(
            F.when(
                two_links,
                F.format_string(
                    'span %d of doc-%06d: see <a href="%s">link</a> and %s for more.',
                    j, i, link0, link1,
                ),
            ).otherwise(
                F.format_string('span %d of doc-%06d: see <a href="%s">link</a>.', j, i, link0)
            )
        )
        media_ref = F.when(
            is_media,
            F.format_string(
                "https://%s/img/%d_%d.jpg", _host_name(F.pmod(i * 7 + j, F.lit(tier.n_hosts))), i, j
            ),
        )
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            j.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), lambda j: mk_span(j.cast("long")))
    return df.select(
        F.format_string("doc-%06d", i).alias("doc_id"),
        _doc_url(i, tier.n_hosts).alias("url"),
        spans.alias("spans"),
    )


def gen_seeds(spark: SparkSession, tier_name: str = "t1") -> DataFrame:
    """seeds(url, seed_rank) — raw, un-canonicalized forms (FIXTURES.md §3)."""
    tier = TIERS[tier_name]
    i = F.col("id")
    # seeds point at existing docs spread across hosts, written non-canonically
    target = F.pmod(F.abs(F.xxhash64(F.format_string("seed-%d", i))), F.lit(tier.n_docs))
    base = _doc_url(target, tier.n_hosts)
    raw = (
        F.when(F.pmod(i, F.lit(3)) == 0, F.concat(F.upper(F.substring(base, 1, 8)), F.substring(base, 9, 2048)))
        .when(F.pmod(i, F.lit(3)) == 1, F.concat(base, F.lit("#top")))
        .otherwise(base)
    )
    return spark.range(tier.n_seeds).select(
        raw.alias("url"), i.cast("int").alias("seed_rank")
    )


def gen_robots(spark: SparkSession, tier_name: str = "t1") -> DataFrame:
    """robots(host, path_pref, allow) — ~10% of hosts disallow 1-3 prefixes;
    host n_hosts-1 disallows everything (FIXTURES.md §4)."""
    tier = TIERS[tier_name]
    i = F.col("id")
    hosts = spark.range(tier.n_hosts).select(
        _host_name(i).alias("host"), i.alias("host_idx")
    )
    gated = hosts.filter((F.pmod(F.col("host_idx"), F.lit(10)) == 3) | (F.col("host_idx") == tier.n_hosts - 1))
    rules = gated.select(
        "host",
        F.when(F.col("host_idx") == tier.n_hosts - 1, F.lit("/"))
        .otherwise(F.format_string("/p%d", F.pmod(F.col("host_idx"), F.lit(7)))).alias("path_pref"),
        F.lit(False).alias("allow"),
    )
    return rules


def gen_politeness(spark: SparkSession, tier_name: str = "t1") -> DataFrame:
    """politeness(host, max_per_round, crawl_delay_ms) — FIXTURES.md §5.

    Heavy host gets a higher budget (but far below its URL share, so its
    queue backs up and exercises skew handling); a few hosts get budget 1.
    Hosts absent from the table default to 2/round (engine + oracle agree).
    """
    tier = TIERS[tier_name]
    i = F.col("id")
    listed = spark.range(0, tier.n_hosts, 3)  # every third host listed
    return listed.select(
        _host_name(i).alias("host"),
        F.when(i == 0, F.lit(8))
        .when(F.pmod(i, F.lit(9)) == 6, F.lit(1))
        .otherwise(F.lit(3))
        .cast("int")
        .alias("max_per_round"),
        (F.pmod(i, F.lit(5)) * 100 + 100).cast("int").alias("crawl_delay_ms"),
    )


def gen_fetch_records(spark: SparkSession) -> DataFrame:
    """fetch_records — WARC-record-shaped table mirroring the reference's
    test corpus semantics (FIXTURES.md §2): five logical "files" with the
    row counts / properties of /root/reference/testdata/warc/*.

    Small by design (driver-side build is fine); schema is the §1.2 column
    surface. dedup.warc carries 4 digest groups x 2-4 members with some
    below the 2 KB size-gain threshold; samsung-with-error has 53 records,
    the 53rd carrying a truncation error; nth=7 has a fixed record_id.
    """
    import hashlib
    from datetime import datetime, timedelta

    rows = []
    t0 = datetime(2021, 3, 1, 12, 0, 0)
    type_masks = {
        "warcinfo": 1, "response": 2, "resource": 4, "request": 8,
        "metadata": 16, "revisit": 32, "conversion": 64, "continuation": 128,
    }

    def uuid_like(tag: str) -> str:
        h = hashlib.md5(tag.encode()).hexdigest()
        return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"

    def add(file, idx, rtype, url, payload: bytes, status=200, mime="text/html",
            payload_digest=None, errors=(), offset=None, size=None):
        rid = uuid_like(f"{file}#{idx}")
        sha = "sha1:" + hashlib.sha1(payload).hexdigest()
        rows.append(dict(
            file=file,
            offset=offset if offset is not None else idx * 4096,
            size=size if size is not None else 512 + len(payload),
            record_id=f"urn:uuid:{rid}",
            record_type=rtype,
            type_mask=type_masks[rtype],
            url=url,
            ts=t0 + timedelta(seconds=idx * 13),
            ip_address=f"10.0.{idx % 8}.{idx % 251}",
            mime_type=mime if rtype in ("response", "resource", "conversion") else None,
            status_code=status if rtype == "response" else None,
            checksum=sha,
            payload_digest=payload_digest,
            payload=bytearray(payload),
            validation_errors=list(errors),
        ))

    # single-record.warc
    add("single-record.warc", 0, "response", "http://example.com/", b"hello world" * 20,
        payload_digest="sha1:" + hashlib.sha1(b"hello world" * 20).hexdigest())

    # dedup.warc — digest groups (group digests come from shared payloads)
    big = b"A" * 5000      # above min-size-gain when revisited
    small = b"B" * 100     # below 2 KB gain -> kept original
    mid = b"C" * 3000
    for idx, (rtype, url, payload) in enumerate([
        ("warcinfo", None, b"software: synthetic"),
        ("response", "http://a.example.com/1", big),
        ("response", "http://a.example.com/2", big),          # dup of big
        ("request", "http://a.example.com/2", b"GET /2"),     # non-candidate
        ("response", "http://b.example.com/1", small),
        ("response", "http://b.example.com/2", small),        # dup, below gain
        ("response", "http://c.example.com/1", mid),
        ("response", "http://c.example.com/2", mid),          # dup of mid
        ("response", "http://c.example.com/3", mid),          # dup of mid
        ("resource", "http://d.example.com/r1", big),         # candidate type
        ("resource", "http://d.example.com/r2", big),         # dup of big
        ("metadata", "http://d.example.com/r2", b"meta"),     # non-candidate
        ("response", "http://e.example.com/1", b"D" * 2600),
        ("response", "http://e.example.com/2", b"D" * 2600),  # dup, marginal gain
        ("revisit", "http://f.example.com/1", big),           # excluded type
        ("response", "http://g.example.com/1", b"unique-1"),
        ("response", "http://g.example.com/2", b"unique-2"),
        ("response", "http://g.example.com/3", b"unique-3"),
        ("conversion", "http://g.example.com/4", mid),        # non-candidate by default
        ("response", "http://g.example.com/5", b"unique-5"),
    ]):
        add("dedup.warc", idx, rtype, url, payload)

    # samsung-with-error.warc.gz — 53 records, last one truncated
    for idx in range(53):
        errs = ["unexpected EOF: truncated record"] if idx == 52 else []
        add("samsung-with-error.warc.gz", idx, "response",
            f"http://www.samsung.com/page{idx}", f"payload-{idx}".encode() * 30,
            errors=errs)

    # convert.warc — 10 mixed records for round-trip parity
    for idx in range(10):
        rtype = ["warcinfo", "request", "response", "metadata", "resource"][idx % 5]
        add("convert.warc", idx, rtype, f"http://conv.example.com/{idx}",
            f"conv-{idx}".encode() * 10)

    schema = (
        "file string, offset long, size long, record_id string, record_type string,"
        " type_mask int, url string, ts timestamp, ip_address string, mime_type string,"
        " status_code int, checksum string, payload_digest string, payload binary,"
        " validation_errors array<string>"
    )
    # empty.warc contributes zero rows by construction (tests assert on filter)
    return spark.createDataFrame(rows, schema=schema)


def generate_all(spark: SparkSession, out_dir: str, tier_name: str = "t1") -> dict[str, str]:
    """Write all fixture tables as parquet under ``out_dir``; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in {
        "documents_spans": gen_documents_spans(spark, tier_name),
        "seeds": gen_seeds(spark, tier_name),
        "robots": gen_robots(spark, tier_name),
        "politeness": gen_politeness(spark, tier_name),
        "fetch_records": gen_fetch_records(spark),
    }.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths
