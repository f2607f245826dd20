"""Large-scale training-data deduplication operators over a documents table.

These generalize the reference's digest dedup (cmd/dedup/dedup.go — exact,
first-occurrence-wins) to the near-duplicate family a 100 TB training-data
pipeline needs. All of them are pure DataFrame compositions (JVM, shuffle
on the dedup key); nothing here touches Python on the data path.

Portable-hash convention: every hash that must be reproducible in the
DuckDB oracle is ``phash(seed, s) = bigint(first 15 hex chars of
md5(seed || ':' || s))`` — identical in Spark (conv) and DuckDB (0x cast).
Engine-internal paths (not oracle-checked) use builtin xxhash64, which is
cheaper (no hex round-trip).

Scale notes:
- exact dedup: one shuffle on the digest; identical plan shape to J1.
- MinHash-LSH: signatures are computed scan-side (no shuffle); the only
  shuffle is the band-bucket self-join, whose key (band_idx, band_sig)
  is high-cardinality by construction -> no skew. Candidate pairs then
  verify true Jaccard; at 10^10 docs bands are the only all-pairs step
  and it is linear in documents x bands.
- SimHash: scan-side signature then a groupBy on the signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------


def phash(seed: int | Column, c: Column) -> Column:
    """Portable 60-bit hash (md5-derived) — same value in DuckDB oracle."""
    s = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.conv(
        F.substring(F.md5(F.concat(s, F.lit(":"), c)), 1, 15), 16, 10
    ).cast("long")


def phash_window(c: Column, i: int) -> Column:
    """i-th 60-bit window of ONE md5: substring(md5(x), 1+2i, 15) as bigint.

    The k minhash permutations share a single md5 evaluation per shingle
    (the md5 is the cost; the windows are free) — 32 hex chars give 9
    overlapping 15-char windows, enough for k=8. Same construct in the
    DuckDB oracle.
    """
    return F.conv(F.substring(F.md5(c), 1 + 2 * i, 15), 16, 10).cast("long")


def words_of(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (portable).

    array_remove, not filter-with-lambda: lambda higher-order functions
    are CodegenFallback and drag the whole containing expression into
    interpreted eval (see BENCH/BASELINE.md round-2 notes)."""
    return F.array_remove(F.split(F.lower(text), " "), "")


def word_shingles(words: Column, n: int = 2) -> Column:
    """Word n-gram shingles (1-based element_at, portable with DuckDB)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return F.when(F.size(words) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def shingle_rows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per word-bigram shingle INSTANCE — the exploded, codegen-only
    equivalent of ``explode(word_shingles(words_of(text), 2))``.

    r8 optimization (guide §4.1): word_shingles is a lambda higher-order
    function (transform over sequence), which is CodegenFallback — the
    whole projection evaluates interpreted, and at sf1.0 that alone cost
    ~60 s per consumer. slice + arrays_zip + explode + concat_ws are all
    ordinary codegen expressions producing the same row multiset (measured
    sym-diff 0 on the sf1.0 corpus; pinned by tests). Docs with < 2 words
    produce no rows, exactly like the old ``filter(size(sh) > 0)`` gate.
    """
    w = words_of(F.col(text_col))
    s1 = F.slice(w, 1, F.size(w) - 1).alias("s1")
    s2 = F.slice(w, 2, F.size(w) - 1).alias("s2")
    z = F.when(F.size(w) >= 2, F.arrays_zip(s1, s2))
    return docs.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], F.explode(z).alias("_z")
    ).select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.concat_ws(" ", F.col("_z.s1"), F.col("_z.s2")).alias("shingle"),
    )


# ---------------------------------------------------------------------------
# exact dedup — the J1 plan on documents
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """First-occurrence-wins exact dedup on md5(text); returns every doc
    annotated with its digest, keep flag and the keeper's id."""
    d = docs.withColumn("digest", F.md5(F.col(text_col)))
    w = Window.partitionBy("digest").orderBy(id_col)
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("is_dup", F.col("rn") > 1)
        .withColumn("keeper", F.min(id_col).over(Window.partitionBy("digest")))
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

MINHASH_K = 8  # signature length
LSH_BANDS = 4  # -> rows-per-band r = K / BANDS = 2


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    portable: bool = True,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) — min over hashed 2-gram shingles.

    Docs with fewer than 2 words have no shingles and are excluded (both
    engine and oracle apply the same rule).

    ``portable=True`` (oracle-checkable): one md5 per shingle, k 60-bit hex
    windows of it. ``portable=False`` (engine fast path): k seeded builtin
    ``xxhash64`` evaluations per shingle — no hex round-trip, ~2-3x cheaper;
    different hash family, so signatures are NOT comparable across modes.
    """
    # r8 restructure (guide §4.1/§2.3): the old path built the shingle
    # array and the k hash windows with lambda HOFs (CodegenFallback →
    # the whole projection interpreted; 75 s at sf1.0). Now: explode the
    # shingles to rows (shingle_rows, codegen-only), hash each instance
    # with codegen md5/conv (or xxhash64), and take the per-doc min of
    # each window with a partial-aggregating groupBy — the shuffle moves
    # only ~|docs| pre-aggregated rows (map-side min), and the same min
    # over the same hash multiset gives identical signatures (sym-diff 0
    # at sf1.0; oracle-pinned). 1.6 s at sf1.0. The signature table stays
    # the pipeline's materialization point (localCheckpoint), so the LSH
    # band self-join's two branches share one evaluation.
    assert k <= 9, "k windows of one md5 cap at 9; chain a second md5 beyond"
    rows = shingle_rows(docs, id_col, text_col)
    if portable:
        m = F.md5(F.col("shingle"))
        ws = [
            F.conv(F.substring(m, 1 + 2 * i, 15), 16, 10).cast("long").alias(f"_w{i}")
            for i in range(k)
        ]
    else:
        ws = [F.xxhash64(F.lit(i), F.col("shingle")).alias(f"_w{i}") for i in range(k)]
    out = (
        rows.select(F.col(id_col), *ws)
        .groupBy(id_col)
        .agg(*[F.min(f"_w{i}").alias(f"sig_{i}") for i in range(k)])
    )
    return out.localCheckpoint(eager=True)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    portable: bool = True,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band signature.

    Returns (id_a, id_b) with id_a < id_b, distinct. The band join is the
    only shuffle; key cardinality ~ #distinct band signatures.
    ``portable=False`` uses the xxhash64 signature family (see
    minhash_signatures) — same banding scheme, cheaper hashing.
    ``sigs`` lets callers pass a precomputed/shared signature table
    (r8: the registry shares one checkpointed signature stage).
    """
    if sigs is None:
        sigs = minhash_signatures(docs, id_col, text_col, k, portable=portable)
    exploded = _band_table(sigs, id_col, k, bands)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def band_star_edges(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Spanning star edges of the LSH pair graph: (member, group-min) per
    band group with >= 2 members — r8 input for connected components.

    Every band group is a CLIQUE in minhash_lsh_pairs' output, so for
    clustering purposes the m*(m-1)/2 clique edges can be replaced by the
    m-1 star edges to the group's min id: each star edge (u, min(G)) IS a
    pair edge (u and min(G) share group G), so the star graph is a
    subgraph of the pair graph; and any pair edge (u, v) in group G is
    star-connected via u - min(G) - v. Same vertex set (members of m>=2
    groups = docs with at least one pair), same connectivity closure,
    identical components — with ~26x fewer edges at sf1.0 (166k vs
    4.35M), which is what the per-round CC joins shuffle (guide §2.3:
    shuffle fewer bytes by shuffling a connectivity proxy, not the full
    pair list).
    """
    bt = _band_table(sigs, id_col, k, bands)
    g = (
        bt.groupBy("band_idx", "band_sig")
        .agg(F.count(F.lit(1)).alias("_m"), F.min(id_col).alias("_gmin"))
        .filter(F.col("_m") >= 2)
        .select("band_idx", "band_sig", "_gmin")
    )
    return (
        bt.join(g, ["band_idx", "band_sig"])
        .filter(F.col(id_col) != F.col("_gmin"))
        .select(F.col("_gmin").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Verify candidate pairs with true shingle Jaccard; keep >= threshold."""
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(words_of(F.col(text_col)), 2)).alias("sh"),
    ).localCheckpoint(eager=True)  # HOF shingle tree: evaluate once, not per join side/ref
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        # size-ratio prune: J(a,b) <= min(|a|,|b|)/max(|a|,|b|), so pairs
        # whose sizes differ by more than the threshold can't qualify —
        # dropped BEFORE the expensive intersect/union
        .filter(
            F.least(F.size("sh_a"), F.size("sh_b"))
            >= F.greatest(F.size("sh_a"), F.size("sh_b")) * threshold
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
    )
    return j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16  # kept SQL-portable; engine-internal variant could use 64


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """(id, simhash) — per-bit majority vote over portable token hashes.

    Computed entirely scan-side: one md5 per token (``F.transform``), then
    a per-row ``F.aggregate`` folds the per-bit +/-1 votes into an array —
    zero exchanges, versus the naive explode -> groupBy(doc_id) plan that
    shuffles every token (plan-asserted in test_plans.py). Docs with no
    tokens are excluded (same rule as the oracle's unnest).
    """
    w = words_of(F.col(text_col))
    hs = F.transform(w, lambda t: phash(0, t))
    zero = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    votes = F.aggregate(
        hs,
        zero,
        lambda acc, h: F.array(
            *[
                F.get(acc, b)
                + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for b in range(bits)
            ]
        ),
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.get(F.col("_votes"), b) > 0, F.lit(1 << b)).otherwise(0)
    return (
        docs.select(F.col(id_col), F.size(w).alias("_ntok"), votes.alias("_votes"))
        .filter(F.col("_ntok") > 0)
        .select(F.col(id_col), sim.alias("simhash"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact prefix-filtering set-similarity join)
# ---------------------------------------------------------------------------


def ngram_shingles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """(id, *block_cols, sh_str array<string>) word-bigram shingle table —
    the shareable (and most expensive: interpreted-HOF) stage of
    ngram_jaccard_neardups. Derive it once, localCheckpoint it, and feed
    it to several ``ngram_jaccard_neardups(..., shingled=...)`` calls
    (e.g. the portable and hashed registry entries) instead of re-running
    the tokenize+shingle pipeline per call (VERDICT r4 next #8)."""
    shingle_strs = F.array_distinct(word_shingles(words_of(F.col(text_col)), 2))
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        shingle_strs.alias("sh_str"),
    ).filter(F.size("sh_str") > 0)


def ngram_jaccard_neardups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.6,
    portable: bool = True,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact set-similarity self-join (all pairs with Jaccard >= t within
    ``block_cols``) via DF-ordered PREFIX FILTERING — the AllPairs/PPJoin
    scheme (Bayardo et al., WWW'07; Xiao et al., WWW'08), never a global
    all-pairs.

    Why prefix filtering (r3): the r2 linear 64-char length buckets missed
    ratio-feasible long pairs (VERDICT r2 #3), and the suggested geometric
    size buckets fix recall but collapse most docs into a handful of wide
    buckets — measured 109 s vs 57 s at sf0.1 (quadratic set-math inside
    each coarse bucket; A/B in BENCH/BASELINE.md). Prefix filtering is
    both EXACT (recall 1.0 — strictly better than any +/-1 bucket probe)
    and sub-quadratic:

    1. order shingles by ascending global document frequency (rarest
       first, ties by token value — any consistent total order works);
    2. index only each doc's first ``n - ceil(t*n) + 1`` tokens (its
       "prefix"). If J(A,B) >= t then |A∩B| >= ceil(t*max(|A|,|B|)), and
       by pigeonhole the globally-smallest shared token sits inside BOTH
       prefixes — so every qualifying pair shares a prefix token;
    3. candidate pairs = equi-join of prefix tokens on (block, token),
       deduped, size-ratio pruned;
    4. verify true Jaccard on the full shingle arrays.

    Scale shape: frequent shingles ("of the") sort LAST and never enter a
    prefix, so join keys are rare tokens — candidate counts stay near the
    true pair count and no key is skewed. Every shuffle is on a
    high-cardinality key (token, doc id); nothing is quadratic in a block
    population. ceil(t*n) in double can only round toward a LONGER prefix
    on boundary products, so float rounding never costs recall.

    ``portable=False``: shingles are xxhash64-compressed to int64 before
    the set math — array_intersect/union over longs instead of strings.
    Jaccard values are identical modulo 2^-64 collisions, so the same
    oracle applies; at 100 TB this is the difference between shuffling
    shingle text and shuffling 8-byte keys.
    """
    if shingled is None:
        shingled = ngram_shingles(docs, id_col, text_col, block_cols)
        shingled = shingled.localCheckpoint(eager=True)
        # ^ evaluate the (interpreted HOF) shingle pipeline ONCE: the
        # token explode, the verify joins and the set math would
        # otherwise each re-derive it per row
    if portable:
        sh = shingled.withColumnRenamed("sh_str", "sh")
    else:
        # xxhash64-compress on top of the (checkpointed) string shingles;
        # re-checkpoint so the set math shuffles 8-byte keys, computed once
        sh = shingled.select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            F.array_distinct(
                F.transform("sh_str", lambda s: F.xxhash64(s))
            ).alias("sh"),
        ).localCheckpoint(eager=True)
    n_sh = F.size("sh")
    prefix_len = n_sh - F.ceil(F.lit(threshold) * n_sh).cast("int") + 1
    tok = sh.select(
        F.col(id_col), *[F.col(c) for c in block_cols],
        n_sh.alias("n_sh"), prefix_len.alias("p_len"),
        F.explode("sh").alias("token"),
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy("df", "token")
    pref = (
        tok.join(dfreq, "token")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("p_len"))
        .select(id_col, *block_cols, "n_sh", "token")
    )
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a.token") == F.col("b.token")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # size-ratio feasibility prune before the dedupe shuffle
    cond = cond & (
        F.least("a.n_sh", "b.n_sh") >= F.greatest("a.n_sh", "b.n_sh") * threshold
    )
    cands = (
        pref.alias("a")
        .join(pref.alias("b"), cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_doc_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang",),
) -> tuple[DataFrame, int]:
    """(per-doc token-index table, vocab size) for the dense-vocab exact
    Jaccard kernel (ngram_jaccard_dense).

    Aggregates each doc's distinct shingle STRING set in one
    partial-aggregating shuffle (collect_set) and materializes the
    ~|docs|-row result; the vocabulary size (the caller's dense-kernel
    guard) is counted from that cache. The kernel builds its own LOCAL
    per-task string→index map (intersections are exact on strings, and
    local dimensions are ≤ the global vocabulary), so no global index
    join is needed — r8 slimming: the earlier version checkpointed 2.6M
    shingle-instance rows and broadcast-joined a row_number vocabulary,
    ~5 s of avoidable jobs at sf1.0.
    """
    rows = shingle_rows(docs, id_col, text_col, extra_cols=block_cols)
    grouped = (
        rows.groupBy(F.col(id_col), *[F.col(c) for c in block_cols])
        .agg(F.collect_set("shingle").alias("_shs"))
        .localCheckpoint(eager=True)
    )
    n_vocab = grouped.select(F.explode("_shs").alias("s")).distinct().count()
    return grouped, n_vocab


def ngram_jaccard_dense(
    grouped: DataFrame,
    n_vocab: int,
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.6,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs Jaccard >= threshold within ``block_cols`` for
    DENSE vocabularies — the r8 kernel behind the ngram registry entries.

    Why: on corpora whose shingle vocabulary is small (the bench corpus:
    931 distinct bigrams, mean document frequency ~2800), prefix
    filtering degenerates — at sf1.0 it emitted 112M candidate pairs and
    the per-pair JVM set math cost 147 s. Here each doc's distinct
    shingle set becomes a 0/1 float32 vector of dimension |vocab|, and a
    BLAS matmul of doc-block tiles yields EXACT integer intersection
    counts (counts <= |vocab| << 2^24, so float32 arithmetic is exact);
    union = |A| + |B| - I. The engine emits integer (i, u) per surviving
    pair (margin 1e-3 below threshold) and the CALLER does the
    ``round(i/u, 4) >= t`` cut in the JVM — same integers, same double
    division, same BigDecimal HALF_UP as the array-math path, so the
    output is bit-identical (no hashing, no float accumulation anywhere).

    Parallelism: docs are hashed into ``n_blocks`` blocks per
    block-cols group; every unordered block pair (t1 <= t2) is one
    applyInPandas task, so the quadratic work spreads over
    n_blocks*(n_blocks+1)/2 tasks per group and no task holds more than
    two blocks' vectors (guide §2.5/§4.2). Each task builds its own
    local string→index map (``n_vocab`` is only the caller's dispatch
    guard; the per-task dimension is ≤ it). The general (large-vocab)
    path remains ngram_jaccard_neardups' AllPairs/PPJoin prefix join.
    """
    import pandas as pd

    margin = threshold - 1e-3
    b = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    tasks = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(F.col("_b"), F.lit(j)).alias("t1"),
                    F.greatest(F.col("_b"), F.lit(j)).alias("t2"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    exploded = (
        grouped.withColumn("_b", b)
        .withColumn("_t", F.explode(tasks))
        .select(
            F.col(id_col), *[F.col(c) for c in block_cols], "_shs", "_b",
            F.col("_t.t1").alias("_t1"), F.col("_t.t2").alias("_t2"),
        )
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "i": pd.Series(dtype="int64"), "u": pd.Series(dtype="int64")}
        )
        if len(pdf) < 2:
            return empty
        t1 = int(pdf["_t1"].iloc[0])
        t2 = int(pdf["_t2"].iloc[0])

        # one LOCAL string->index map shared by both sides of this task:
        # intersections are exact on the strings, and the local dimension
        # never exceeds the task's own distinct-shingle count
        vocab: dict = {}
        idx_lists = []
        for shs in pdf["_shs"]:
            ix = np.empty(len(shs), dtype=np.int64)
            for t, s in enumerate(shs):
                ix[t] = vocab.setdefault(s, len(vocab))
            idx_lists.append(ix)
        dim = len(vocab)

        def build(mask):
            sub_ids = pdf[id_col].to_numpy()[mask]
            sub_ix = [ix for ix, m in zip(idx_lists, mask) if m]
            n = len(sub_ids)
            V = np.zeros((n, dim), dtype=np.float32)
            sizes = np.empty(n, dtype=np.int64)
            for r, ix in enumerate(sub_ix):
                V[r, ix] = 1.0
                sizes[r] = len(ix)
            return sub_ids, V, sizes

        if t1 == t2:
            all_mask = np.ones(len(pdf), dtype=bool)
            ids, V, sz = build(all_mask)
            ids_b, VB, sz_b = ids, V, sz
        else:
            bcol = pdf["_b"].to_numpy()
            a_mask, b_mask = bcol == t1, bcol == t2
            if not a_mask.any() or not b_mask.any():
                return empty
            ids, V, sz = build(a_mask)
            ids_b, VB, sz_b = build(b_mask)
        out_a, out_b, out_i, out_u = [], [], [], []
        nB = len(ids_b)
        tile = max(1, 16_000_000 // max(nB, 1))
        for r0 in range(0, len(ids), tile):
            r1 = min(r0 + tile, len(ids))
            inter = V[r0:r1] @ VB.T  # exact integer counts in float32
            uni = (sz[r0:r1, None] + sz_b[None, :]).astype(np.float64) - inter
            keep = (inter.astype(np.float64) / uni) >= margin
            if t1 == t2:
                keep &= ids[r0:r1, None] < ids_b[None, :]
            ii, jj = np.nonzero(keep)
            ia, ib = ids[ii + r0], ids_b[jj]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_i.append(inter[ii, jj].astype(np.int64))
            out_u.append(uni[ii, jj].astype(np.int64))
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "i": np.concatenate(out_i),
                "u": np.concatenate(out_u),
            }
        )

    pairs = exploded.groupBy(*block_cols, "_t1", "_t2").applyInPandas(
        kernel, "id_a long, id_b long, i long, u long"
    )
    return (
        pairs.withColumn("jaccard", F.round(F.col("i") / F.col("u"), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair list.

    The step after pair generation in a dedup pipeline: group transitively
    connected near-duplicates into clusters so one canonical doc per cluster
    can be kept (generalizes cmd/dedup/dedup.go's digest groups, which are
    cliques by construction, to the non-transitive similarity graph LSH
    emits). Returns one row per vertex: (doc_id, cluster_id, cluster_size)
    with cluster_id = min doc_id in the component (deterministic).

    Algorithm: min-label propagation with pointer jumping (r8). label(v)
    starts at v; each round every vertex takes the min label over itself
    and its neighbours, then composes the label mapping with itself
    (lbl <- min(lbl, lbl(lbl))), halving remaining chain lengths —
    convergence in O(log diameter) rounds; converged when no label
    changed. max_iter bounds adversarial graphs. Scale shape per round: one shuffle
    join of edges->labels on the vertex id + one groupBy-min — both keyed on
    doc_id, no skew beyond component size, no driver-side row data (the only
    action is the convergence count). localCheckpoint truncates lineage so
    the plan stays O(1) across rounds instead of growing by two joins per
    round. For graphs with genuinely large diameter, switch to the
    alternating large-star/small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — same building blocks, O(log^2 n)
    rounds; not needed for dedup graphs.
    """
    # symmetrize: (s, d) both directions; vertices = all endpoint ids
    fwd = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    rev = pairs.select(F.col(id_b).alias("s"), F.col(id_a).alias("d"))
    edges = fwd.unionAll(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("s").alias("v"))
        .distinct()
        .withColumn("lbl", F.col("v"))
        .localCheckpoint(eager=True)
    )
    def _propagate(lbls: DataFrame) -> DataFrame:
        """One min-label step + one pointer jump; (v, lbl), lazily built.

        Pointer jump (r8): lbl <- min(lbl, lbl(lbl)). Label values are
        vertex ids, so composing the mapping with itself halves the
        remaining label-chain length every step — convergence becomes
        O(log diameter) instead of O(diameter), which is what makes
        sparse spanning inputs (band_star_edges, long chains) as cheap
        to cluster as dense ones. The fixpoint is unchanged (min label
        per component), so results are identical."""
        nbr_min = (
            edges.join(lbls.withColumnRenamed("v", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("s", "v")
        )
        cand = lbls.join(nbr_min, "v", "left").select(
            "v",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                "lbl"
            ),
        )
        jump = cand.select(F.col("v").alias("lbl"), F.col("lbl").alias("_l2"))
        return cand.join(jump, "lbl", "left").select(
            "v",
            F.least(F.col("lbl"), F.coalesce(F.col("_l2"), F.col("lbl"))).alias("lbl"),
        )

    for _ in range(max_iter):
        # two propagate+jump steps per materialized round (r8): the
        # checkpoint + convergence count are the per-round fixed cost, so
        # batching two (cheap, label-table-sized) steps between them
        # halves the number of driver round trips. Labels only ever
        # decrease, so "changed this round" == final < initial, and an
        # extra no-op step after convergence is harmless.
        stepped = _propagate(_propagate(labels))
        new_labels = (
            labels.withColumnRenamed("lbl", "_lbl0")
            .join(stepped, "v")
            .withColumn("changed", F.col("lbl") < F.col("_lbl0"))
            .drop("_lbl0")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("v").alias("doc_id"),
            F.col("lbl").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )


def dedup_keep_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus compaction: drop every non-canonical member of each near-dup
    cluster, keeping the cluster head (min doc_id) plus all unclustered docs.

    The final step of the dedup pipeline (pairs -> dedup_clusters -> compact);
    mirrors cmd/dedup/dedup.go's keep-first-occurrence semantics at cluster
    granularity. Scale shape: one broadcast-or-shuffle LEFT ANTI join on the
    doc id — the drop list is |clusters| - |components| rows (small relative
    to the corpus), so Spark broadcasts it when it fits and AQE handles the
    rest; the documents scan itself is never shuffled.
    """
    drop = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return docs.join(drop, on=id_col, how="left_anti")


def _band_table(
    sigs: DataFrame, id_col: str, k: int, bands: int
) -> DataFrame:
    """(id, band_idx, band_sig) — one row per LSH band per doc."""
    r = k // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ":", *[F.col(f"sig_{b * r + j}") for j in range(r)]
            ).alias("band_sig"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_sig")


def build_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    portable: bool = False,
) -> None:
    """Persist the corpus's LSH band table for incremental dedup probes.

    The production shape for continuous ingestion: hash the 100 TB corpus
    ONCE, then each new batch probes the stored band table instead of
    re-signing the world (same build-once/serve-many split as
    similarity.build_ivf_index). Partitioned by band_idx; join key
    (band_idx, band_sig) is high-cardinality -> skew-free. Default is the
    engine's xxhash64 family (cheapest); pass portable=True only if the
    index must be oracle-reproducible.
    """
    import json

    sigs = minhash_signatures(docs, id_col, text_col, k, portable=portable)
    bt = _band_table(sigs, id_col, k, bands).withColumnRenamed(id_col, "corpus_id")
    bt.write.mode("overwrite").partitionBy("band_idx").parquet(f"{path}/bands")
    meta = {"k": k, "bands": bands, "portable": portable,
            "id_col": id_col, "text_col": text_col}
    spark = docs.sparkSession
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/meta")


def minhash_lookup_from_index(
    spark,
    path: str,
    new_docs: DataFrame,
) -> DataFrame:
    """(new_id, corpus_id) candidate near-dup pairs: new batch vs the
    persisted corpus index. Only the (small) new batch is signed; the
    stored band table is scanned, never re-hashed. Distinct pairs; feed
    jaccard_pairs / dedup_clusters downstream exactly like
    minhash_lsh_pairs output.
    """
    import json

    meta = json.loads(spark.read.json(f"{path}/meta").collect()[0]["meta"])
    sigs = minhash_signatures(
        new_docs, meta["id_col"], meta["text_col"], meta["k"],
        portable=meta["portable"],
    )
    bt = _band_table(sigs, meta["id_col"], meta["k"], meta["bands"])
    idx = spark.read.parquet(f"{path}/bands")
    return (
        bt.join(idx, ["band_idx", "band_sig"])
        .filter(F.col(meta["id_col"]) != F.col("corpus_id"))
        .select(F.col(meta["id_col"]).alias("new_id"), "corpus_id")
        .distinct()
    )
