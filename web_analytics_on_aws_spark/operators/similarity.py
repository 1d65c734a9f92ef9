"""Similarity search over embedding columns (array<float>).

Extension surface (BASELINE.json north star): approximate-nearest-neighbor
search designed for 100 TB corpora.

- ``brute_force_topk`` — the exactness baseline: broadcast the (small) query
  set against the corpus scan, score with JVM HOF arithmetic, rank per
  query. One corpus pass regardless of query count; no corpus shuffle.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane (sign) LSH.
  Hyperplane j's coefficient for dimension d is a deterministic pseudo-random
  ±1 derived from murmur3(d, j) — reproducible across runs/executors with no
  stored model. Corpus is bucketed once (cost O(n × planes)); each query
  probes only its bucket (and optionally multi-probe neighbors), turning
  top-k from O(n) per query into O(n / 2^planes) expected.
- ``cosine_pairs`` — embedding near-duplicate detection: all pairs with
  cosine ≥ threshold (exact, for oracle parity; the LSH variant prunes the
  same computation at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from web_analytics_on_aws_spark.functions import as_double_vec, cosine_similarity


def _with_prep(df, vec_col: str, dv: str, nrm: str):
    """Precompute the double-cast vector and its sqrt-norm once per row —
    pair/probe scoring then does only the dot per candidate. The arithmetic
    (dot / (sqrt(na)*sqrt(nb))) is unchanged, so scores stay bit-identical
    to the unprepped form and the DuckDB oracle."""
    v = as_double_vec(vec_col)
    return df.withColumn(dv, v).withColumn(
        nrm, F.sqrt(F.aggregate(F.col(dv), F.lit(0.0), lambda a, x: a + x * x))
    )


def _pair_sim(dv_a: str, nrm_a: str, dv_b: str, nrm_b: str) -> F.Column:
    from web_analytics_on_aws_spark.functions import vec_dot

    return F.round(
        vec_dot(F.col(dv_a), F.col(dv_b)) / (F.col(nrm_a) * F.col(nrm_b)), 6
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` must be small (broadcast): (query_id, qv: array<float|double>).
    Output: (query_id, vec_id, sim, rank), rank 1..k, ties broken by vec_id.
    """
    prepped = _with_prep(corpus, vec_col, "__dv", "__nrm")
    q = _with_prep(queries, "qv", "__qdv", "__qnrm")
    scored = (
        prepped.join(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            _pair_sim("__dv", "__nrm", "__qdv", "__qnrm").alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _bucket_expr(vec_col: str, planes: int, band: int = 0) -> F.Column:
    """Sign-LSH bucket id for one band: bit j = sign of the projection onto
    pseudo-random hyperplane (band, j).

    sign(hash(d, band*1024 + j)) is a deterministic ±1 per (dimension,
    plane) — a materialization-free random hyperplane shared by every
    executor; distinct bands use disjoint plane seeds.
    """
    return F.expr(
        f"""aggregate(
              transform(sequence(0, {planes - 1}),
                j -> IF(aggregate(
                         zip_with({vec_col},
                                  sequence(0, size({vec_col}) - 1),
                                  (v, d) -> v * IF((hash(d, {band} * 1024 + j) & 1) = 1,
                                                   1.0D, -1.0D)),
                         0.0D, (acc, x) -> acc + x) > 0D,
                       shiftleft(1L, j), 0L)),
              0L, (acc, v) -> acc + v)"""
    )


def with_lsh_bands(
    df: DataFrame,
    vec_col: str = "embedding",
    bands: int = 8,
    planes: int = 4,
    out: str = "band_key",
) -> DataFrame:
    """OR-amplified sign-LSH: one bucket key per band (AND over ``planes``
    bits within a band, OR across ``bands`` tables). A pair/probe is a
    candidate if it collides in ANY band — recall for similarity s is
    1-(1-p^planes)^bands with p = 1 - θ(s)/π, the same S-curve construction
    as MinHash banding. Output: one row per (input row × band) with a
    struct ``(band, key)`` column ``out``."""
    banded = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    _bucket_expr(vec_col, planes, band=b).alias("key"),
                )
                for b in range(bands)
            ]
        )
    )
    return df.withColumn(out, banded)


def with_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", planes: int = 8, out: str = "bucket"
) -> DataFrame:
    return df.withColumn(out, _bucket_expr(vec_col, planes))


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 4,
    bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors colliding with the query
    in ≥1 LSH band (OR-amplified — the recall dial is ``bands``, the cost
    dial is ``planes``). At 100 TB, band the corpus once and store it
    bucketed (partitionBy(band, key)) so each query probes ``bands``
    partitions instead of scanning the corpus.
    """
    c = with_lsh_bands(
        _with_prep(corpus, vec_col, "__dv", "__nrm"), vec_col, bands, planes, "band_key"
    )
    q = with_lsh_bands(
        _with_prep(queries, "qv", "__qdv", "__qnrm"), "qv", bands, planes, "band_key"
    )
    scored = (
        c.join(F.broadcast(q), "band_key")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
        .select(
            query_id_col,
            id_col,
            _pair_sim("__dv", "__nrm", "__qdv", "__qnrm").alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float,
    bands: int = 8,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-pruned embedding near-dup pairs: candidates collide in ≥1 band,
    then the exact cosine filter runs on the pruned set — same scores as
    ``cosine_pairs`` on every surviving pair, at O(Σ bucket²) candidate
    cost instead of O(n²)."""
    b = with_lsh_bands(
        _with_prep(df, vec_col, "__dv", "__nrm"), vec_col, bands, planes, "band_key"
    )
    left = b.select(
        "band_key", F.col(id_col).alias("id_a"),
        F.col("__dv").alias("va"), F.col("__nrm").alias("na"),
    )
    right = b.select(
        "band_key", F.col(id_col).alias("id_b"),
        F.col("__dv").alias("vb"), F.col("__nrm").alias("nb"),
    )
    return (
        left.join(right, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", _pair_sim("va", "na", "vb", "nb").alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (embedding near-dup detection).

    O(n²) scoring — correct-by-construction oracle twin. For production
    scale, pre-bucket with ``with_lsh_bucket`` and join on bucket first: the
    LSH variant computes the *same* pair scores on a pruned candidate set.
    """
    prepped = _with_prep(df, vec_col, "__dv", "__nrm")
    a = prepped.select(
        F.col(id_col).alias("id_a"), F.col("__dv").alias("va"), F.col("__nrm").alias("na")
    )
    b = prepped.select(
        F.col(id_col).alias("id_b"), F.col("__dv").alias("vb"), F.col("__nrm").alias("nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _pair_sim("va", "na", "vb", "nb").alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def deterministic_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse IVF centroids: the ``num_centroids`` lowest-id corpus vectors.

    Deterministic and training-free (the point here is the *index structure*;
    a production deployment would refine these with k-means|| from MLlib and
    persist them — the assignment/probe machinery below is unchanged)."""
    return (
        corpus.orderBy(F.col(id_col))
        .limit(num_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            as_double_vec(vec_col).alias("cv"),
        )
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine, ties
    to the higher centroid_id via lexicographic struct max).

    Plan shape: broadcast the centroid table, expand each row × |centroids|
    inside the stage, reduce with a partial-aggregatable max_by — the only
    shuffle is the final |corpus| aggregation on the vector id. At 100 TB
    the result is written ``partitionBy(centroid_id)`` once, so probes read
    ``nprobe`` partitions instead of the corpus."""
    scored = corpus.join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.struct(
            cosine_similarity(as_double_vec(vec_col), F.col("cv")).alias("sim"),
            F.col("centroid_id"),
        ).alias("sc"),
    )
    return (
        scored.groupBy(id_col, vec_col)
        .agg(F.max("sc").alias("best"))
        .select(id_col, vec_col, F.col("best.centroid_id").alias("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` clusters whose
    centroids are nearest each query, brute-force within. With
    ``nprobe == num_centroids`` this is exactly ``brute_force_topk``;
    smaller nprobe trades recall for a ~num_centroids/nprobe scan reduction.
    Output: (query_id, vec_id, sim, rank) like the other top-k operators."""
    cents = deterministic_centroids(corpus, num_centroids, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    qscored = queries.join(F.broadcast(cents)).select(
        query_id_col,
        "qv",
        F.col("centroid_id"),
        cosine_similarity(as_double_vec("qv"), F.col("cv")).alias("csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id_col, "qv", "centroid_id")
    )

    scored = (
        _with_prep(assigned, vec_col, "__dv", "__nrm")
        .join(F.broadcast(_with_prep(probes, "qv", "__qdv", "__qnrm")), "centroid_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            _pair_sim("__dv", "__nrm", "__qdv", "__qnrm").alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
