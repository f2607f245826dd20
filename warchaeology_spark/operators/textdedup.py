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
    w = words_of(F.col(text_col))
    sh = word_shingles(w, 2)
    out = docs.select(F.col(id_col), sh.alias("sh")).filter(F.size("sh") > 0)
    # portable: one md5 per shingle, k windows of it (phash_window) —
    # computed once into an array column, then k array_min's over element i
    assert k <= 9, "k windows of one md5 cap at 9; chain a second md5 beyond"

    def windows_of(s: Column) -> Column:
        if not portable:
            return F.array(*[F.xxhash64(F.lit(i), s) for i in range(k)])
        m = F.md5(s)
        return F.array(
            *[F.conv(F.substring(m, 1 + 2 * i, 15), 16, 10).cast("long") for i in range(k)]
        )

    # materialize (id, _hw) ONCE: the transform/shingle pipeline is a
    # higher-order-function tree (interpreted), and every sig_i column
    # would otherwise re-evaluate it per row (Catalyst inlines column
    # expressions into each consumer). The signatures table is a real
    # materialization point in production pipelines anyway.
    out = out.withColumn("_hw", F.transform(F.col("sh"), windows_of)).select(
        F.col(id_col), F.col("_hw")
    ).localCheckpoint(eager=True)

    def min_at(i: int):
        # factory, not default-arg lambda (pyspark infers arity by signature)
        return lambda w: F.element_at(w, i + 1)

    for i in range(k):
        out = out.withColumn(
            f"sig_{i}", F.array_min(F.transform(F.col("_hw"), min_at(i)))
        )
    return out.drop("_hw")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    portable: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band signature.

    Returns (id_a, id_b) with id_a < id_b, distinct. The band join is the
    only shuffle; key cardinality ~ #distinct band signatures.
    ``portable=False`` uses the xxhash64 signature family (see
    minhash_signatures) — same banding scheme, cheaper hashing.
    """
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

    Algorithm: min-label propagation. label(v) starts at v; each round every
    vertex takes the min label over itself and its neighbours; converged when
    no label changed. Rounds needed = graph diameter, which for near-dup
    clusters is tiny (duplicates of a common source form near-cliques);
    max_iter bounds adversarial chains. Scale shape per round: one shuffle
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
    for _ in range(max_iter):
        # neighbour min: edges (s,d) x labels(d) -> candidate label for s
        nbr_min = (
            edges.join(labels.withColumnRenamed("v", "d"), "d")
            .groupBy("s")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .withColumnRenamed("s", "v")
        )
        new_labels = (
            labels.join(nbr_min, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
                (F.col("nbr_lbl") < F.col("lbl")).alias("changed"),
            )
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
