"""Property-based canonicalization parity (hypothesis): for arbitrary
URL-ish strings the three implementations — JVM column builder, pandas-UDF
lenient path, pure-Python oracle — agree. One Spark action per example
batch (lists of strings), deterministic seed via hypothesis defaults."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from warchaeology_spark.functions.urls import (
    canonicalize_py,
    canonicalize_url,
    canonicalize_url_arrow,
    canonicalize_url_lenient,
    surt_key,
)

scheme = st.sampled_from(["http", "https", "HTTP", "HtTpS", "ftp", "mailto", ""])
label = st.text(alphabet="abcXYZ019-", min_size=1, max_size=6)
host = st.lists(label, min_size=1, max_size=3).map(".".join)
port = st.sampled_from(["", ":80", ":443", ":8080", ":0"])
path = st.sampled_from(["", "/", "/a", "/a/b%20c", "//d", "/ space"])
query = st.sampled_from(["", "?", "?a=1", "?b=2&a=1", "?z&&y", "?a=1&a=0"])
frag = st.sampled_from(["", "#", "#frag"])
junk = st.text(max_size=20).filter(lambda s: "\\" not in s)


@st.composite
def urlish(draw):
    if draw(st.integers(0, 9)) == 0:
        return draw(junk)
    s = draw(scheme)
    prefix = f"{s}://" if s else draw(st.sampled_from(["", "//"]))
    return (
        draw(st.sampled_from(["", " ", "  "]))
        + prefix
        + draw(host)
        + draw(port)
        + draw(path)
        + draw(query)
        + draw(frag)
        + draw(st.sampled_from(["", " "]))
    )


@settings(max_examples=4, deadline=None)
@given(st.lists(urlish(), min_size=100, max_size=100))
def test_three_way_canonicalization_agreement(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = df.select(
        "url",
        canonicalize_url("url").alias("canon"),
        surt_key("url").alias("surt"),
        canonicalize_url_lenient(F.col("url")).alias("lenient"),
        canonicalize_url_arrow(F.col("url")).alias("strict_pd"),
    ).collect()
    for r in rows:
        py = canonicalize_py(r["url"])
        assert r["canon"] == (py[0] if py else None), repr(r["url"])
        assert r["surt"] == (py[1] if py else None), repr(r["url"])
        assert r["lenient"] == r["canon"], repr(r["url"])
        assert r["strict_pd"] == r["canon"], repr(r["url"])


backslash_junk = st.text(
    alphabet="ab\\/:?#@&=. %01xyzHTTP", min_size=0, max_size=24
)


@settings(max_examples=4, deadline=None)
@given(st.lists(backslash_junk, min_size=100, max_size=100))
def test_strict_arrow_matches_jvm_even_with_backslashes(spark, batch):
    # the strict Arrow path must track the JVM spec on inputs where the
    # LENIENT path deliberately diverges (backslash handling)
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = df.select(
        "url",
        canonicalize_url("url").alias("canon"),
        canonicalize_url_arrow(F.col("url")).alias("strict_pd"),
    ).collect()
    for r in rows:
        py = canonicalize_py(r["url"])
        assert r["strict_pd"] == r["canon"] == (py[0] if py else None), repr(r["url"])


@settings(max_examples=4, deadline=None)
@given(st.lists(urlish(), min_size=100, max_size=100))
def test_parts_from_canon_matches_canonical_parts(spark, batch):
    # two-step parse parity: deriving surt/host from the canonical string
    # must equal the direct canonical_parts derivation from the raw URL
    from warchaeology_spark.functions.urls import canonical_parts, parts_from_canon

    df = spark.createDataFrame([(u,) for u in batch], "url string")
    rows = (
        df.select(canonical_parts(F.col("url")).alias("cp"))
        .filter(F.col("cp.url_canon").isNotNull())
        .select("cp", parts_from_canon(F.col("cp.url_canon")).alias("d"))
        .collect()
    )
    for r in rows:
        assert r["d"]["surt"] == r["cp"]["surt"], r
        assert r["d"]["host"] == r["cp"]["host"], r
