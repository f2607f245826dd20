"""Similarity search over an embedding column (array<float>).

Two paths, per the build charter:
- brute-force cosine top-k — the exact baseline; fully JVM
  (zip_with + aggregate), one broadcast of the (small) query set.
- LSH-bucketed ANN — the scale path: random-hyperplane sign buckets
  derived from deterministic per-dimension hash weights; candidates only
  form inside a bucket, then exact cosine re-ranks. At 10^10 vectors the
  bucket join replaces the all-pairs cross join; recall/latency trades via
  n_planes.

Embedding-cosine near-dup (training-data dedup by semantic similarity) is
the same machinery with query == corpus and a threshold instead of top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    ``queries`` (query_id, embedding) is broadcast; corpus scan is one
    pass; the per-query top-k window shuffles on query_id only.
    Self-matches (same id) are not excluded here — callers filter.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = vectors.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def hyperplane_buckets(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH bucket per vector.

    Plane p's weight for dimension d is a deterministic pseudo-random
    value in [-1, 1): (xxhash64(p:d) % 10^6)/5*10^5 - 1 — no RNG state, so
    the bucketing is reproducible across runs/executors (required for
    checkpoint resume).
    """
    def plane_weight(p: int, d: Column) -> Column:
        h = F.xxhash64(F.concat(F.lit(f"plane{p}:"), d.cast("string")))
        return (F.pmod(h, F.lit(1_000_000)) / 500_000.0) - 1.0

    def weigh_with(p: int):
        # factory, not default-arg lambda (pyspark infers arity by signature)
        return lambda x, d: x.cast("double") * plane_weight(p, d)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                weigh_with(p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return vectors.withColumn("bucket", bucket)


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
    probe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k: candidates share one of the query's probe
    buckets, exact cosine re-ranks. Returns (query_id, vec_id, cos_sim, rank).

    ``multiprobe=True`` probes the query's own bucket PLUS every bucket
    within Hamming distance ``probe_radius`` (flip up to that many sign
    bits) — standard multi-probe LSH: a near neighbor that lands just
    across one or two hyperplanes is still found. Probe count is
    sum(C(n_planes, r) for r <= radius) per query — distinct bucket
    values, so no candidate dedup is needed, and only the (small,
    broadcast) query side fans out; the corpus still partitions by a
    single bucket key, so the scale shape is unchanged. At production
    plane counts (16-24) radius-2 probing is a few hundred probes against
    2^n buckets — the classic recall/latency dial.
    """
    from itertools import combinations

    vb = hyperplane_buckets(vectors, n_planes, id_col, vec_col)
    qb = hyperplane_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)), n_planes, query_id_col, vec_col
    ).select(query_id_col, F.col(vec_col).alias("_qvec"), "bucket")
    if multiprobe:
        masks = [0]
        for r in range(1, probe_radius + 1):
            masks += [
                sum(1 << p for p in bits) for bits in combinations(range(n_planes), r)
            ]
        probe_set = F.array(
            *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
        )
        qb = qb.select(
            query_id_col, "_qvec", F.explode(probe_set).alias("bucket")
        )
    scored = vb.join(F.broadcast(qb), "bucket").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans-partition the corpus into n_lists
    cells; each query probes its n_probe nearest centroids and exact-ranks
    only those cells' vectors.

    The index build (KMeans fit + cell assignment) is the amortized step —
    at scale the assignments are a written column (Iceberg ``bucket`` on
    cell_id) and only the probe join runs per query batch. Deterministic
    via fixed seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    va = vectors.withColumn("_v", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(va)
    assigned = model.transform(va).drop("_v")

    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cdf = vectors.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    )

    # each query scores all centroids (tiny cross join), keeps n_probe cells
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    qc = q.join(F.broadcast(cdf)).select(
        query_id_col,
        "_qvec",
        "cell",
        cosine(F.col("_qvec"), F.col("centroid")).alias("_csim"),
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(
        F.col("_csim").desc(), F.col("cell")
    )
    probes = (
        qc.withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qvec", "cell")
    )

    scored = assigned.join(F.broadcast(probes), "cell").select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def build_ivf_index(
    vectors: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist an IVF index: KMeans centroids + per-vector cell
    assignments, parquet at ``path`` (``{path}/centroids``,
    ``{path}/assignments`` partitioned by cell).

    This is the amortized step of ivf_topk made explicit: build once,
    serve many query batches. At scale the assignments table is Iceberg-
    bucketed on cell_id so a probe touches only its cells' files; here
    parquet ``partitionBy('cell')`` gives the same pruning (the probe
    join's cell filter prunes partitions at scan time).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    va = vectors.withColumn("_v", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_lists, seed=seed, featuresCol="_v", predictionCol="cell").fit(va)
    assigned = model.transform(va).drop("_v")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/assignments")
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    vectors.sparkSession.createDataFrame(
        centroids, "cell int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (build_ivf_index): no
    KMeans fit per query batch — probe-cell selection against the (tiny,
    broadcast) centroid table, then exact cosine over only the probed
    cells' partitions (partition-pruned scan)."""
    cdf = spark.read.parquet(f"{path}/centroids")
    assigned = spark.read.parquet(f"{path}/assignments")

    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    qc = q.join(F.broadcast(cdf)).select(
        query_id_col, "_qvec", "cell",
        cosine(F.col("_qvec"), F.col("centroid")).alias("_csim"),
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(F.col("_csim").desc(), F.col("cell"))
    probes = (
        qc.withColumn("_pr", F.row_number().over(w_probe))
        .filter(F.col("_pr") <= n_probe)
        .select(query_id_col, "_qvec", "cell")
    )
    scored = assigned.join(F.broadcast(probes), "cell").select(
        query_id_col, id_col,
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def embedding_neardups(
    vectors: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, LSH-blocked (id_a < id_b)."""
    vb = hyperplane_buckets(vectors, n_planes, id_col, vec_col)
    a = vb.alias("a")
    b = vb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "cos_sim", F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4)
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cos_sim",
        )
    )
