"""Similarity search over embedding columns (north star).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  set against the full corpus. At 100 TB the corpus side stays
  partitioned; only the query side broadcasts, so the scan is
  embarrassingly parallel with zero shuffle before the per-query top-k.
- ``cosine_topk_lsh`` — scale path: random-hyperplane LSH buckets both
  sides; candidates only join within a bucket, turning the n×m product
  into per-bucket products. Recall < 1 by construction (probe multiple
  tables to trade compute for recall).
- ``embedding_near_dup`` — near-duplicate pairs above a cosine threshold,
  scored by BLOCKED MATMUL over IVF cells (see the function docstring).

Kernel note (measured, round 5): the original `aggregate(zip_with(...))`
higher-order-function dot product evaluates INTERPRETED — Catalyst HOF
lambdas never enter whole-stage codegen — at ~5-100µs per 64-dim dot,
which made every pairwise query 10-100× slower than the same math in
DuckDB. Two replacement kernels:

1. :func:`dot` / :func:`l2_norm` with ``dim`` given unroll into a flat
   ``a[0]*b[0] + ... + a[d-1]*b[d-1]`` expression — codegen'd, ~10×.
   ``dim`` is probed once per query from the data (:func:`infer_dim`).
2. Pair scoring in :func:`embedding_near_dup` packs each IVF cell into a
   matrix and scores surviving cell PAIRS with one numpy/BLAS matmul per
   pair inside ``mapInPandas`` — no per-pair UnsafeRow with two 512-byte
   vector payloads is ever materialized, which (not the FLOPs) was the
   dominant cost of the join-based form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .scale import spread


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Probe the embedding dimensionality from one row (metadata-scale
    driver action at plan-build time). None on an empty input — callers
    then fall back to the dim-agnostic interpreted kernel."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else None


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product in double precision. With ``dim``: a flat unrolled
    left-to-right sum — whole-stage-codegen'd, same operation order as
    the HOF fold so results are bit-identical. Without: the interpreted
    dim-agnostic ``aggregate(zip_with())`` fold (slow path — see module
    docstring)."""
    if dim is not None:
        e = a[0] * b[0]
        for i in range(1, dim):
            e = e + a[i] * b[i]
        return e
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        e = a[0] * a[0]
        for i in range(1, dim):
            e = e + a[i] * a[i]
        return F.sqrt(e)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd, dim) / (l2_norm(ad, dim) * l2_norm(bd, dim))


def _d2(a: Column, b: Column, dim: int | None = None) -> Column:
    """Squared euclidean distance; unrolled codegen form when dim known."""
    if dim is not None:
        e = (a[0] - b[0]) * (a[0] - b[0])
        for i in range(1, dim):
            e = e + (a[i] - b[i]) * (a[i] - b[i])
        return e
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _safe_sim(dot_expr: Column, qn: Column, cn: Column, round_to: int = 6) -> Column:
    """Rounded cosine with the ZERO-NORM guard: cosine is undefined for
    a zero vector — dividing gives NULL in Spark but +-inf in DuckDB, a
    cross-engine divergence AND a nonsense ranking (a zero query
    otherwise still 'ranks' k arbitrary neighbors with NULL sims).
    Defining sim = 0 for zero vectors keeps row counts stable, sorts
    such pairs below every positive match, and is identical in both
    engines (oracles carry the matching CASE WHEN)."""
    return F.when(
        (qn > 0) & (cn > 0), F.round(dot_expr / (qn * cn), round_to)
    ).otherwise(F.lit(0.0))


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
    dim = infer_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).select("query_id", "qv", l2_norm(F.col("qv"), dim).alias("qn"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).select("neighbor_id", "cv", l2_norm(F.col("cv"), dim).alias("cn"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _safe_sim(
                dot(F.col("qv"), F.col("cv"), dim),
                F.col("qn"), F.col("cn"), round_to,
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
    state — reproducible across runs and engines).

    DELIBERATE deviation from the published random-hyperplane LSH
    (Charikar 2002 draws GAUSSIAN directions, for which P(bit match) =
    1 - theta/pi exactly): components here are uniform in [-1, 1).
    Uniform-cube directions bias slightly toward the diagonals, so
    per-region collision rates deviate from the closed form — accepted
    because a Gaussian draw needs transcendentals (Box-Muller ln/cos)
    whose libm results are NOT bit-portable across the JVM, numpy, and
    DuckDB, and bit-identical cross-engine replay of the planes is what
    makes the LSH query hash-checkable. Recall adequacy is pinned by
    pytest instead of the closed form."""
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
        F.when(dot(vec, F.array(*[F.lit(x) for x in p]), len(p)) >= 0,
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
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The bucket equi-join replaces the cross join — at corpus scale this is
    the difference between n·m and n·m/2^planes comparisons.

    ``dim`` defaults to a one-row probe of the corpus (like the
    bruteforce/IVF siblings) — the plane weights MUST cover every vector
    component: a too-small dim silently truncates the dot products
    (wrong sims, wrong top-k), a too-large one reads past the array and
    NULLs the whole score, collapsing every vector into bucket 0 and the
    bucket join into a cross join.
    """
    if dim is None:
        dim = infer_dim(corpus, vec_col)
        if dim is None:
            raise ValueError(
                "cosine_topk_lsh: empty corpus — cannot infer the "
                "embedding dimensionality the LSH planes must cover; "
                "pass dim explicitly"
            )
    planes = [_hyperplane(dim, seed * 1000 + p) for p in range(n_planes)]
    corpus = spread(corpus)
    q = (
        queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
        .select(
            "query_id", "qv",
            l2_norm(F.col("qv"), dim).alias("qn"),
            lsh_bucket(F.col("qv"), planes).alias("bucket"),
        )
    )
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
        .select(
            "neighbor_id", "cv",
            l2_norm(F.col("cv"), dim).alias("cn"),
            lsh_bucket(F.col("cv"), planes).alias("bucket"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            _safe_sim(dot(F.col("qv"), F.col("cv"), dim),
                      F.col("qn"), F.col("cn")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(F.col("rank") <= k)


def _train_centroids(
    vecs: DataFrame, n_cells: int, dim: int | None = None, iters: int = 1
) -> DataFrame:
    """IVF centroid training, shared by :func:`ivf_centroids` (raw
    vectors) and :func:`embedding_near_dup` (unit vectors): deterministic
    hash-order seed sample + ``iters`` Lloyd refinement steps (assign-all
    → per-cell element-wise mean), entirely as DataFrame ops — the assign
    step is a broadcast cross join against the n_cells seeds and the mean
    is a posexplode hash aggregate, so training scales with the corpus
    scan, not with collect(), and works for ANY embedding dimension (the
    earlier pivoted x0..x{dim} form needed dim declared up front and was
    a duplicate implementation — unified round 5).

    ``iters=0`` returns the raw seed sample: every consumer of these
    centroids (ball-cover near-dup, IVF probe) is correct for ARBITRARY
    centroids — refinement only tightens cells/pruning — so callers that
    retrain per run may legitimately trade pruning quality for one fewer
    full corpus pass per iteration.

    ``vecs`` must have columns (_id, v: array<double>). Returns
    (cell, centroid: array<double>).
    """
    # deterministic pseudo-random sample: first n_cells ids in hash order.
    # orderBy().limit() compiles to TakeOrderedAndProject (distributed
    # top-k, no global sort); the un-partitioned window then numbers only
    # the n_cells post-limit rows — benign at any scale.
    cents = (
        vecs.withColumn("_h", F.xxhash64(F.col("_id")))
        .orderBy("_h", "_id")
        .limit(n_cells)
        .select(
            (F.row_number().over(Window.orderBy("_h", "_id")) - 1).cast("int").alias("cell"),
            F.col("v").alias("centroid"),
        )
    )
    for _ in range(iters):
        # one Lloyd step: assign every vector to its nearest centroid,
        # re-average per cell
        assigned = (
            vecs.crossJoin(F.broadcast(cents.withColumnRenamed("centroid", "seed_v")))
            .withColumn("d2", _d2(F.col("v"), F.col("seed_v"), dim))
            .withColumn(
                "rk",
                F.row_number().over(Window.partitionBy("_id").orderBy("d2", "cell")),
            )
            .filter(F.col("rk") == 1)
        )
        refined = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
        # EMPTY-CLUSTER handling (standard k-means keeps k cells): a
        # cell that attracted no members vanishes from the re-average
        # groupBy — silently training < n_cells centroids and degrading
        # IVF probe granularity below the requested k. Retain the
        # previous centroid for empty cells (deterministic, no re-scan).
        cents = (
            cents.select("cell", F.col("centroid").alias("_prev"))
            .join(refined, "cell", "left")
            .select(
                "cell", F.coalesce(F.col("centroid"), F.col("_prev")).alias("centroid")
            )
        )
    return cents


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """Train IVF cell centroids over raw corpus vectors — thin wrapper
    around :func:`_train_centroids`. Returns (cell, centroid)."""
    vecs = corpus.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v"))
    return _train_centroids(vecs, n_cells, infer_dim(corpus, vec_col))


def _assign_cells(df: DataFrame, centroids: DataFrame, out_id: str,
                  vec_col: str, n_probe: int, dim: int | None = None) -> DataFrame:
    """Rank IVF cells by distance per vector; keep the n_probe nearest."""
    return (
        df.withColumn("_vd", _as_double(F.col(vec_col)))
        .crossJoin(F.broadcast(centroids))
        .withColumn("d2", _d2(F.col("_vd"), F.col("centroid"), dim))
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
    dim = infer_dim(corpus, vec_col)
    cents = ivf_centroids(corpus, id_col, vec_col, n_cells).cache()
    c = _assign_cells(
        spread(corpus).select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
        ).select("neighbor_id", "cv", l2_norm(F.col("cv"), dim).alias("cn")),
        cents, "neighbor_id", "cv", 1, dim,
    )
    q = _assign_cells(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ).select("query_id", "qv", l2_norm(F.col("qv"), dim).alias("qn")),
        cents, "query_id", "qv", n_probe, dim,
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            _safe_sim(dot(F.col("qv"), F.col("cv"), dim),
                      F.col("qn"), F.col("cn")).alias("sim"),
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
    dim = infer_dim(df, vec_col)
    a = spread(df).select(
        F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    ).select("id_a", "va", l2_norm(F.col("va"), dim).alias("na"))
    b = df.select(
        F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    ).select("id_b", "vb", l2_norm(F.col("vb"), dim).alias("nb"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            # floor(x*1e6+0.5): the repo's decimal-fix rounding — the SAME
            # convention as the blocked kernel and the DuckDB twin, where
            # F.round (HALF_UP) / np.round (half-even) / DuckDB ROUND are
            # THREE conventions that disagree exactly on .5 boundaries,
            # breaking the bit-identical-twin contract
            (F.floor(dot(F.col("va"), F.col("vb"), dim)
                     / (F.col("na") * F.col("nb")) * 1e6 + 0.5) / 1e6
             ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def normalize_and_assign(
    df: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
) -> DataFrame:
    """Unit-normalize vectors and assign each to its nearest centroid —
    the ONE copy of the near-dup assignment contract, shared by
    :func:`embedding_near_dup` and the persisted index's build/append
    paths (operators/ann_index.py). The zero-norm guard and the
    ``(d, cell)`` tie-break are load-bearing: the persisted-index
    exactness tests hold only while every path assigns identically.
    Returns (_id, v, n, cell, d)."""
    base = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    ).select("_id", "v", l2_norm(F.col("v"), dim).alias("n"))
    # zero-norm guard mirrors normalize_embeddings: dividing by 0 would
    # make u all-NaN, the vector's cell radius NaN, and (NaN-is-largest)
    # every triangle test involving that cell vacuously true — silently
    # disabling pruning for the whole cell
    unit = base.select(
        "_id", "v", "n",
        F.when(F.col("n") > 0, F.transform("v", lambda x: x / F.col("n")))
        .otherwise(F.col("v")).alias("u"),
    )
    return (
        unit.crossJoin(F.broadcast(cents))
        .withColumn("d", F.sqrt(_d2(F.col("u"), F.col("centroid"), dim)))
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("_id").orderBy("d", "cell"))
        )
        .filter(F.col("rk") == 1)
        .select("_id", "v", "n", "cell", "d")
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    train_iters: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold)
    via EXACT IVF ball-cover pruning — recall is 1.0 at any threshold, unlike
    hyperplane LSH, so the result is bit-identical to the all-pairs twin.

    On unit vectors cosine(a,b) >= t  <=>  |â−b̂| <= r = sqrt(2−2t). Each
    vector goes to exactly ONE cell (nearest IVF centroid); a cell pair
    (i, j) can contain a qualifying pair only if
    ``dist(c_i, c_j) <= rad_i + rad_j + r`` (triangle inequality, rad =
    max member distance to its centroid).

    Pair SCORING is blocked matrix multiplication (round 5 — replaced the
    cell equi-join form): each (cell, sub-block) of ≤ ``block_rows``
    vectors is packed into ONE row carrying an id list and a vector
    matrix; surviving cell pairs join those packed rows (n_cells² × subs²
    rows at most — metadata-scale, never corpus-rows-scale) and one
    numpy/BLAS ``A @ B.T`` per block pair inside ``mapInPandas`` scores
    every candidate at once. The join-based form materialized an
    UnsafeRow with BOTH 8·dim-byte vectors for every candidate pair —
    measured, that row traffic (not the FLOPs) was ~95% of the cost.

    Scale shape: one broadcast join against n_cells centroids, one window
    per vector, one groupBy(cell, sub) to pack blocks, one equi-join of
    packed blocks through the pruned cell-pair relation. Block size
    bounds task memory: a block pair is 2·block_rows·dim·8 bytes
    (~4 MB at block_rows=4096, dim=64) regardless of corpus size, and
    block count grows linearly with the corpus, so the matmul stage
    parallelizes across any cluster. At the real near-dup regime
    (t >= 0.95, r <= 0.32) almost every cell pair is pruned; at loose
    thresholds (r → 2) nothing can be pruned by ANY exact method and the
    work degrades to blocked all-pairs — still distributed, never a
    single cartesian."""
    dim = infer_dim(df, vec_col)
    # ids pass through the numpy kernel untyped: the output schema follows
    # the INPUT id type (string doc ids work — numpy compares str arrays
    # lexicographically, same order as the Spark `<` on strings), instead
    # of the earlier hardcoded int64 that mangled non-integer ids
    id_type = df.schema[id_col].dataType.simpleString()
    spread_df = spread(df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("v")
    ), "_id")
    unit_for_training = spread_df.select(
        "_id", "v", l2_norm(F.col("v"), dim).alias("n")
    ).select(
        "_id",
        F.when(F.col("n") > 0, F.transform("v", lambda x: x / F.col("n")))
        .otherwise(F.col("v")).alias("v"),
    )

    # centroids trained on the UNIT vectors (shared training helper).
    # train_iters=0 is sound: the triangle-bound prune is exact for any
    # centroids (refinement only tightens cells) — a caller that retrains
    # per run can skip the refinement's extra full-corpus pass.
    cents = _train_centroids(unit_for_training, n_cells, dim, iters=train_iters).cache()

    # nearest-cell assignment (n_cells-row broadcast against the corpus;
    # the shared helper — one copy of the zero-norm guard + tie-break)
    assigned = normalize_and_assign(spread_df, cents, "_id", "v", dim).cache()

    return _near_dup_score_assignment(assigned, cents, dim, threshold, id_type)


def _near_dup_score_assignment(
    assigned: DataFrame,
    cents: DataFrame,
    dim: int,
    threshold: float,
    id_type: str,
    radii: DataFrame | None = None,
) -> DataFrame:
    """The SCORING half of :func:`embedding_near_dup`, shared with the
    persisted near-dup index (operators/ann_index.py): given a cell
    assignment (_id, v, n, cell, d) and its centroids, prune cell pairs
    with the triangle bound at ``threshold`` and score survivors with
    the blocked-matmul kernel. Cells and assignment are
    THRESHOLD-INDEPENDENT (nearest-centroid only), which is what makes
    the build-once/serve-many split sound: one persisted assignment
    serves any threshold. ``radii`` (cell, rad = max member distance)
    may be passed precomputed — the persisted index stores it at build
    time so serving never re-scans the corpus for a 16-row table;
    omitted, it is computed here (the one-shot path, where the
    assignment is already in flight)."""
    import pandas as pd

    r = float(max(2.0 - 2.0 * threshold, 0.0)) ** 0.5
    block_rows = 4096

    # surviving cell pairs under the triangle bound. Both sides are
    # n_cells rows; coalesce(1) so the tiny crossJoin doesn't inherit the
    # session's shuffle-partition count as a task-count product
    # (200 × 200 = 40k empty tasks under default confs).
    if radii is None:
        radii = assigned.groupBy("cell").agg(F.max("d").alias("rad"))
    radii = radii.coalesce(1)
    side = cents.coalesce(1).join(F.broadcast(radii), "cell").coalesce(1)
    ca = side.select(
        F.col("cell").alias("cell_a"), F.col("centroid").alias("ca"),
        F.col("rad").alias("rad_a"),
    )
    cb = side.select(
        F.col("cell").alias("cell_b"), F.col("centroid").alias("cb"),
        F.col("rad").alias("rad_b"),
    )
    cell_pairs = (
        ca.crossJoin(cb)  # n_cells² rows — metadata-sized, never corpus-sized
        .filter(
            F.sqrt(_d2(F.col("ca"), F.col("cb"), dim))
            <= F.col("rad_a") + F.col("rad_b") + F.lit(r)
        )
        # visit each UNORDERED cell pair once (the triangle bound is
        # symmetric): halves the packed-block join traffic and the
        # matmul work — the dominant cost is block-row shuffle + Arrow
        # exchange, not FLOPs. Cross-cell orientation is restored in the
        # kernel (a vector lives in exactly ONE cell, so a pair appears
        # in exactly one surviving block pair).
        .filter(F.col("cell_a") <= F.col("cell_b"))
        .select("cell_a", "cell_b")
    )

    # pack each (cell, sub-block) into one row: ids + raw-vector matrix +
    # norms. Sub-blocking bounds the packed row (and the per-task matmul)
    # to block_rows vectors however big a cell gets.
    packed = (
        assigned
        # n_sub = ceil(cell_size / block_rows); hash-assign members to subs
        .withColumn("sub", F.pmod(F.xxhash64("_id"), F.greatest(
            F.lit(1),
            (F.count(F.lit(1)).over(Window.partitionBy("cell")) / block_rows)
            .cast("int") + 1,
        )))
        .groupBy("cell", "sub")
        .agg(F.collect_list(F.struct("_id", "v", "n")).alias("rows"))
        .select(
            "cell",
            F.transform("rows", lambda s: s["_id"]).alias("ids"),
            F.transform("rows", lambda s: s["v"]).alias("vecs"),
            F.transform("rows", lambda s: s["n"]).alias("norms"),
        )
    )
    pa = packed.select(
        F.col("cell").alias("cell_a"), F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"), F.col("norms").alias("norms_a"),
    )
    pb = packed.select(
        F.col("cell").alias("cell_b"), F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"), F.col("norms").alias("norms_b"),
    )
    # KEYED spread (round 19): the join output is partitioned by
    # hash(cell_b) — at most n_cells non-empty partitions however big
    # the cluster, and a hot cell concentrates its block pairs on one
    # task. Spreading by (cell_a, cell_b) distributes over the
    # surviving PAIR count instead, and unlike the previous keyless
    # form it skips sortBeforeRepartition's local sort of the packed
    # matrix rows (the heaviest rows in the plan). Measured a tie at
    # sf0.1 (the exchange itself dominates at 16 packed rows); the
    # sort removal and per-pair distribution are the scale case.
    # (Also measured and rejected: deriving radii from the packed
    # aggregate — the cell_pairs broadcast still needs its own job, so
    # the job count stays 4 either way and assigned is already cached.)
    blocks = spread(
        pa.join(F.broadcast(cell_pairs), "cell_a").join(pb, "cell_b"),
        "cell_a", "cell_b",
    )

    def score(batches):
        import numpy as np

        for pdf in batches:
            out_a, out_b, out_s = [], [], []
            for i in range(len(pdf)):
                ia = np.asarray(pdf["ids_a"].iloc[i])
                ib = np.asarray(pdf["ids_b"].iloc[i])
                A = np.array([np.asarray(x) for x in pdf["vecs_a"].iloc[i]])
                B = np.array([np.asarray(x) for x in pdf["vecs_b"].iloc[i]])
                na = np.asarray(pdf["norms_a"].iloc[i], dtype=np.float64)
                nb = np.asarray(pdf["norms_b"].iloc[i], dtype=np.float64)
                # floor(x*1e6+0.5) — matches the allpairs twin and the
                # DuckDB oracle exactly (np.round is half-EVEN)
                sims = np.floor((A @ B.T) / np.outer(na, nb) * 1e6 + 0.5) / 1e6
                if pdf["cell_a"].iloc[i] == pdf["cell_b"].iloc[i]:
                    # same cell (incl. sub-block pairs, which still come
                    # in both orders): ia < ib dedups exactly once
                    keep = (sims >= threshold) & (ia[:, None] < ib[None, :])
                    xi, yi = np.nonzero(keep)
                    pa, pb = ia[xi], ib[yi]
                else:
                    # distinct cells are visited once (cell_a < cell_b):
                    # every cross pair is unique already; restore the
                    # id_a < id_b orientation elementwise. Comparison +
                    # np.where (not minimum/maximum ufuncs, which have no
                    # loop for fixed-width unicode dtypes) so string doc
                    # ids work the same as integer ones.
                    xi, yi = np.nonzero(sims >= threshold)
                    lo, hi = ia[xi], ib[yi]
                    swap = lo > hi
                    pa = np.where(swap, hi, lo)
                    pb = np.where(swap, lo, hi)
                out_a.append(pa); out_b.append(pb); out_s.append(sims[xi, yi])
            yield pd.DataFrame({
                "id_a": np.concatenate(out_a) if out_a else [],
                "id_b": np.concatenate(out_b) if out_b else [],
                "sim": np.concatenate(out_s) if out_s else np.array([], dtype=np.float64),
            })

    return blocks.mapInPandas(score, f"id_a {id_type}, id_b {id_type}, sim double")


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
    q_i = sign(x_i) * floor(|x_i| * scale + 0.5) ∈ [-127, 127], stored
    with the scale for dequantization — 4× smaller ANN storage with
    round-half-AWAY-FROM-ZERO, the published symmetric-absmax
    convention (round 11: plain floor(x+0.5) rounded NEGATIVE half-ties
    toward +inf — -126.5 -> -126 where every standard int8 quantizer
    stores -127 — a sign-asymmetric grid an independent implementation
    would disagree with; sign/abs/floor are bit-identical builtins in
    Spark and DuckDB, so the scheme stays engine-reproducible, which
    banker's rounding is not). Zero vectors quantize to zeros with
    scale 0."""
    base = df.select(
        F.col(id_col).alias(id_col), _as_double(F.col(vec_col)).alias("v")
    ).select(
        id_col, "v",
        F.array_max(F.transform("v", lambda x: F.abs(x))).alias("_m"),
    )
    scale = F.when(F.col("_m") > 0, F.lit(127.0) / F.col("_m")).otherwise(F.lit(0.0))
    base = base.withColumn("_scale", scale)
    q = F.transform(
        "v",
        lambda x: (
            F.signum(x) * F.floor(F.abs(x) * F.col("_scale") + F.lit(0.5))
        ).cast("int"),
    )
    return base.select(id_col, q.alias("q"), F.col("_scale").alias("scale"))


def negative_samples(
    emb: DataFrame,
    queries: DataFrame,
    k_pos: int = 5,
    n_neg: int = 3,
    seed: str = "neg-0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CONTRASTIVE negative sampling: for each query vector, ``n_neg``
    corpus vectors chosen by a deterministic per-(query, candidate)
    hash draw, EXCLUDING the query itself and its ``k_pos`` nearest
    neighbors — the (anchor, negative) pairs contrastive/embedding
    training needs, where a random negative that is secretly a
    positive poisons the loss. Deterministic: the draw is
    md5(seed:qid:cid), so the sample is a pure function of (corpus,
    queries, seed) — reproducible across runs, engines, partitionings.

    Shape: positives from :func:`cosine_topk_bruteforce` (query side
    broadcast); the candidate relation is corpus x queries with the
    BROADCAST query side, ranked per query by the 48-bit draw
    (keyed window partitioned by query). At 100 TB gate the corpus
    first (hash_sample) so candidates are |Q| x corpus·fraction, and/or
    swap positives to the IVF path — same exclusion join either way.
    """
    from pyspark.sql import Window

    from .scale import md5_tag48

    pos = cosine_topk_bruteforce(
        emb, queries, id_col=id_col, vec_col=vec_col, k=k_pos
    ).select("query_id", F.col("neighbor_id").alias("cand_id"))
    q = queries.select(F.col(id_col).alias("query_id")).coalesce(1)
    cand = emb.select(F.col(id_col).alias("cand_id")).crossJoin(F.broadcast(q))
    cand = cand.filter(F.col("cand_id") != F.col("query_id")).join(
        pos, ["query_id", "cand_id"], "left_anti"
    )
    u = md5_tag48(
        F.concat_ws(":", F.lit(seed), F.col("query_id").cast("string"),
                    F.col("cand_id").cast("string"))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(u.asc(), F.col("cand_id"))
    return (
        cand.withColumn("draw", u)
        .withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= n_neg)
        .select("query_id", F.col("cand_id").alias("negative_id"),
                "neg_rank")
    )
