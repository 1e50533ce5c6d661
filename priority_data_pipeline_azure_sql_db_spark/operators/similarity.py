"""Similarity search over embedding columns (north star).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the full corpus; dot products are JVM ``zip_with`` +
  ``aggregate`` folds in double precision (no UDF, order of operations
  fixed → deterministic across engines). At 100 TB the corpus side stays
  partitioned; only the query side broadcasts, so the scan is
  embarrassingly parallel with zero shuffle before the per-query top-k.
- ``cosine_topk_lsh`` — scale path: random-hyperplane LSH buckets both
  sides; candidates only join within a bucket, turning the n×m product
  into per-bucket products. Recall < 1 by construction (probe multiple
  tables to trade compute for recall).
- ``embedding_near_dup`` — near-duplicate pairs above a cosine threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .scale import spread


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    Similarity is rounded before ranking and ties break on neighbor id, so
    the ordering is fully deterministic. Returns
    (query_id, neighbor_id, sim, rank).
    """
    # norms computed once per ROW, not once per pair: |c|+|q| norm folds
    # instead of |c|·|q| (the cast-to-double is also done once per side).
    # The corpus is the STREAMED side of the broadcast cross join — if it
    # arrives as one scan partition (small single-file parquet) the whole
    # |c|·|q| score loop runs in one task; spread it first (scale.py).
    corpus = spread(corpus)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", l2_norm(F.col("qv")).alias("qn"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (hash-derived, no RNG
    state — reproducible across runs and engines)."""
    import hashlib

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        vals.append(int.from_bytes(h[:8], "big", signed=True) / 2**63)
    return vals


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (bit i = sign(v·p_i)).
    ``vec`` must already be array<double> — cast once at the caller, not
    once per plane."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0,
               F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The bucket equi-join replaces the cross join — at corpus scale this is
    the difference between n·m and n·m/2^planes comparisons.
    """
    planes = [_hyperplane(dim, seed * 1000 + p) for p in range(n_planes)]
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
        .select(
            "query_id", "qv",
            l2_norm(F.col("qv")).alias("qn"),
            lsh_bucket(F.col("qv"), planes).alias("bucket"),
        )
    )
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
        .select(
            "neighbor_id", "cv",
            l2_norm(F.col("cv")).alias("cn"),
            lsh_bucket(F.col("cv"), planes).alias("bucket"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(F.col("rank") <= k)


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Train IVF cell centroids: deterministic hash-order seed sample +
    one Lloyd refinement step (assign-all → per-cell mean), entirely as
    DataFrame ops — the assign step is a broadcast cross join against the
    n_cells seeds and the mean is one hash aggregate, so training scales
    with the corpus scan, not with collect().

    Returns (cell, centroid: array<double>).
    """
    vecs = corpus.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v"))
    # deterministic pseudo-random sample: first n_cells ids in hash order
    # orderBy().limit() compiles to TakeOrderedAndProject (distributed
    # top-k, no global sort); the window then numbers only n_cells rows.
    seeds = (
        vecs.withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy("_h", "_id")) - 1).cast("int").alias("cell"),
            F.col("v").alias("seed_v"),
        )
    )
    # one Lloyd step: assign every vector to its nearest seed, re-average
    d2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("seed_v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    assigned = (
        vecs.crossJoin(F.broadcast(seeds))
        .withColumn("d2", d2)
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("_id").orderBy("d2", "cell")),
        )
        .filter(F.col("rk") == 1)
    )
    dim_idx = list(range(dim))
    return (
        assigned.select("cell", *[F.col("v")[i].alias(f"x{i}") for i in dim_idx])
        .groupBy("cell")
        .agg(*[F.avg(f"x{i}").alias(f"x{i}") for i in dim_idx])
        .select("cell", F.array(*[f"x{i}" for i in dim_idx]).alias("centroid"))
    )


def _assign_cells(df: DataFrame, centroids: DataFrame, out_id: str,
                  vec_col: str, n_probe: int) -> DataFrame:
    """Rank IVF cells by distance per vector; keep the n_probe nearest."""
    d2 = F.aggregate(
        F.zip_with(F.col("_vd"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        df.withColumn("_vd", _as_double(F.col(vec_col)))
        .crossJoin(F.broadcast(centroids))
        .withColumn("d2", d2)
        .withColumn(
            "crk", F.row_number().over(Window.partitionBy(out_id).orderBy("d2", "cell"))
        )
        .filter(F.col("crk") <= n_probe)
        .drop("_vd", "centroid", "d2", "crk")
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest cell;
    each query probes its n_probe nearest cells; candidates join on the
    cell id. At 100 TB this is the classic inverted-file layout — the
    corpus side is partitioned (and in practice clustered/bucketed) by
    cell, the probe side broadcasts, and scored candidates are
    |corpus|·n_probe/n_cells instead of |corpus|·|queries|.

    Recall < 1 by construction; raise n_probe to trade compute for recall
    (n_probe = n_cells degenerates to exact brute force).
    """
    cents = ivf_centroids(corpus, id_col, vec_col, n_cells, dim).cache()
    c = _assign_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
        ).select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("cn")),
        cents, "neighbor_id", "cv", 1,
    )
    q = _assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ).select("query_id", "qv", l2_norm(F.col("qv")).alias("qn")),
        cents, "query_id", "qv", n_probe,
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(F.col("rank") <= k)


def embedding_near_dup_allpairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All-pairs near-dup twin — O(n²), the small-n oracle for
    ``embedding_near_dup`` in tests. Never use at corpus scale."""
    a = df.select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    ).select("id_a", "va", l2_norm(F.col("va")).alias("na"))
    b = df.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    ).select("id_b", "vb", l2_norm(F.col("vb")).alias("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via EXACT IVF ball-cover pruning — recall is 1.0 at any threshold, unlike
    hyperplane LSH, so the result is bit-identical to the all-pairs twin.

    On unit vectors cosine(a,b) >= t  <=>  |â−b̂| <= r = sqrt(2−2t). Each
    vector goes to exactly ONE cell (nearest IVF centroid); a cell pair
    (i, j) can contain a qualifying pair only if
    ``dist(c_i, c_j) <= rad_i + rad_j + r`` (triangle inequality, rad =
    max member distance to its centroid). Pairs are generated only through
    surviving cell pairs, as equi-joins on the cell ids: the executed plan
    shows SortMergeJoin[cell_b] over BroadcastHashJoin[cell_a] — no
    CartesianProduct over the corpus. (The only nested-loop joins left are
    the deliberate n_cells-row centroid-assignment broadcasts, which never
    scale with the corpus².)

    Scale shape: one broadcast join against n_cells centroids, one window
    per vector, then a shuffle equi-join keyed on cell. At the real
    near-dup regime (t >= 0.95, r <= 0.32) almost every cell pair is
    pruned and the work is sum-of-cell-pair products, not n². At loose
    thresholds (r -> 2, the sphere diameter) nothing can be pruned by ANY
    exact method — the plan then degrades to per-cell-pair products of
    all-pairs total size, still shuffle-partitioned rather than a single
    cartesian."""
    r = float(max(2.0 - 2.0 * threshold, 0.0)) ** 0.5
    base = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    ).select("_id", "v", l2_norm(F.col("v")).alias("n"))
    # zero-norm guard mirrors normalize_embeddings: dividing by 0 would
    # make u all-NaN, the vector's cell radius NaN, and (NaN-is-largest)
    # every triangle test involving that cell vacuously true — silently
    # disabling pruning for the whole cell
    unit = base.select(
        "_id", "v", "n",
        F.when(F.col("n") > 0, F.transform("v", lambda x: x / F.col("n")))
        .otherwise(F.col("v")).alias("u"),
    )

    # centroids: hash-order seed sample + one Lloyd step. The mean is a
    # posexplode element-wise aggregate, so any embedding dimension works
    # (ivf_centroids' pivoted x0..x{dim} form needs dim declared up front).
    d2_seed = F.aggregate(
        F.zip_with(F.col("u"), F.col("seed_v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    seeds = (
        unit.select("_id", "u")
        .withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy("_h", "_id")) - 1).cast("int").alias("cell"),
            F.col("u").alias("seed_v"),
        )
    )
    seed_assigned = (
        unit.select("_id", "u")
        .crossJoin(F.broadcast(seeds))
        .withColumn("sd2", d2_seed)
        .withColumn(
            "srk", F.row_number().over(Window.partitionBy("_id").orderBy("sd2", "cell"))
        )
        .filter(F.col("srk") == 1)
    )
    cents = (
        seed_assigned.select("cell", F.posexplode("u").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        .cache()
    )

    # nearest-cell assignment (n_cells-row broadcast against the corpus)
    d2 = F.aggregate(
        F.zip_with(F.col("u"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    assigned = (
        unit.crossJoin(F.broadcast(cents))
        .withColumn("d", F.sqrt(d2))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("_id").orderBy("d", "cell"))
        )
        .filter(F.col("rk") == 1)
        .select("_id", "v", "n", "cell", "d")
        .cache()
    )

    # surviving cell pairs under the triangle bound. Both sides are
    # n_cells rows; coalesce(1) so the tiny crossJoin doesn't inherit the
    # session's shuffle-partition count as a task-count product
    # (200 × 200 = 40k empty tasks under default confs).
    radii = assigned.groupBy("cell").agg(F.max("d").alias("rad")).coalesce(1)
    side = cents.coalesce(1).join(F.broadcast(radii), "cell").coalesce(1)
    ca = side.select(
        F.col("cell").alias("cell_a"), F.col("centroid").alias("ca"),
        F.col("rad").alias("rad_a"),
    )
    cb = side.select(
        F.col("cell").alias("cell_b"), F.col("centroid").alias("cb"),
        F.col("rad").alias("rad_b"),
    )
    cdist = F.sqrt(F.aggregate(
        F.zip_with(F.col("ca"), F.col("cb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    cell_pairs = (
        ca.crossJoin(cb)  # n_cells² rows — metadata-sized, never corpus-sized
        .filter(cdist <= F.col("rad_a") + F.col("rad_b") + F.lit(r))
        .select("cell_a", "cell_b")
    )

    # pair generation through the cell-pair relation (equi-joins on cell ids)
    a = assigned.select(
        F.col("_id").alias("id_a"), F.col("v").alias("va"),
        F.col("n").alias("na"), F.col("cell").alias("cell_a"),
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), F.col("cell").alias("cell_b"),
    )
    return (
        a.join(F.broadcast(cell_pairs), "cell_a")
        .join(b, "cell_b")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def normalize_embeddings(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Unit-normalize vectors (cosine → dot-product form): returns
    (id, unit: array<double>, norm). Zero vectors pass through unchanged
    with norm 0 rather than dividing to NaN."""
    base = df.select(
        F.col(id_col).alias(id_col), _as_double(F.col(vec_col)).alias("v")
    ).select(id_col, "v", l2_norm(F.col("v")).alias("norm"))
    unit = F.when(
        F.col("norm") > 0, F.transform("v", lambda x: x / F.col("norm"))
    ).otherwise(F.col("v"))
    return base.select(id_col, unit.alias("unit"), "norm")


def quantize_int8(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector: scale = 127 / max|x|,
    q_i = floor(x_i * scale + 0.5) ∈ [-127, 127], stored with the scale
    for dequantization — 4× smaller ANN storage with the standard
    round-to-nearest scheme (floor(x+0.5), not banker's rounding, so any
    engine reproduces it bit-for-bit). Zero vectors quantize to zeros
    with scale 0."""
    base = df.select(
        F.col(id_col).alias(id_col), _as_double(F.col(vec_col)).alias("v")
    ).select(
        id_col, "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("_m"),
    )
    scale = F.when(F.col("_m") > 0, F.lit(127.0) / F.col("_m")).otherwise(F.lit(0.0))
    base = base.withColumn("_scale", scale)
    q = F.transform("v", lambda x: F.floor(x * F.col("_scale") + F.lit(0.5)).cast("int"))
    return base.select(id_col, q.alias("q"), F.col("_scale").alias("scale"))
