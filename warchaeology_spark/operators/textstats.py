"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure JVM column expressions, and all expressible in the DuckDB oracle
(portable constructs only: split/filter/transform/regexp, md5-hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warchaeology_spark.operators.textdedup import phash, words_of

# a small, fixed stopword list — the heuristic's signal, shared verbatim
# with the oracle SQL
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that",
)

# BPE-ish token regex: letter runs, digit runs, single non-space symbols
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def stopword_ratio(text: Column) -> Column:
    w = words_of(text)
    stops = F.size(F.filter(w, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(w) > 0, F.round(stops / F.size(w), 4)).otherwise(0.0)


def lang_id_en(docs: DataFrame, text_col: str = "text", threshold: float = 0.08) -> DataFrame:
    """n-gram/stopword heuristic: predict 'en' when the stopword ratio
    clears the threshold, else 'other'."""
    r = stopword_ratio(F.col(text_col))
    return docs.withColumn("stop_ratio", r).withColumn(
        "lang_pred", F.when(r >= threshold, F.lit("en")).otherwise(F.lit("other"))
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    return docs.withColumn(
        "ws_tokens", F.size(words_of(F.col(text_col)))
    ).withColumn(
        "re_tokens",
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)),
    ).withColumn("n_chars_calc", F.length(text_col))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality: length factor x stopword factor x
    alpha-ratio factor — the standard cheap pre-filter for web text."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z ]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(0.0)
    len_factor = F.least(n / F.lit(400.0), F.lit(1.0))
    stop = stopword_ratio(t)
    stop_factor = F.least(stop / F.lit(0.2), F.lit(1.0))
    return docs.withColumn(
        "quality", F.round(len_factor * stop_factor * alpha_ratio, 4)
    )


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 4) -> DataFrame:
    """Winnowing-lite document fingerprint: min portable-hash over word
    k-gram windows of the normalized text — robust to small edits at the
    ends, cheap, and oracle-reproducible.

    Docs with fewer than k words yield NULL: a gram needs k words, and the
    engine's concat_ws would otherwise silently skip the NULLs from
    out-of-range element_at while SQL's ``||`` NULL-propagates — gating on
    size(w) >= k keeps engine and oracle identical on short documents."""
    w = words_of(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9 ]", ""))
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return docs.withColumn(
        "fingerprint",
        F.when(F.size(w) >= k, F.array_min(F.transform(grams, lambda g: phash(7, g))))
        .otherwise(F.lit(None).cast("long")),
    )
