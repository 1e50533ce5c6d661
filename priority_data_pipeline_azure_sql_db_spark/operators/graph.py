"""Connected components over near-duplicate pair edges (north star).

A dedup pipeline doesn't stop at PAIRS: near-duplicate relations are
transitive in practice (A~B, B~C → keep one of {A,B,C}), so the last
step is clustering the pair graph and electing one canonical document
per component — this operator.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors; converged when no label changes. Rounds needed =
graph diameter, which for near-dup clusters is tiny (duplicate clusters
are dense cliques-ish, diameter 2-4 measured on the fixtures).

Scale notes:
- Each round is one join edges⋈labels + one min-aggregate — both keyed
  shuffles, partial-aggregated map-side; nothing driver-side except the
  O(1) convergence check (a count of changed labels).
- For adversarial long-chain graphs (diameter ~ n) the classic fix is
  pointer-jumping / large-star-small-star (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) which converges in
  O(log n) rounds; near-dup graphs never need it, so this operator
  keeps the simpler propagation with an explicit ``max_iter`` guard
  (default 50 — the loop exits on convergence, so a generous cap costs
  nothing for normal graphs and only bounds pathological ones;
  round-12 review raised it from 20, whose diameter-20 ceiling one
  21-document drift chain could hit, and exposed the knob on
  canonical_docs) and raises if the guard is hit without convergence
  (silent wrong components are worse than a loud failure).
- Lineage: the loop rebinds ``labels`` to a materialized checkpoint
  every ``_CHECKPOINT_EVERY`` rounds (plans otherwise deepen by one
  join+agg per round), and the EDGE list is checkpointed once up front
  so per-round work never re-executes the edge source.
- Cluster-deployment note (round-12 review): RELIABLE checkpoint files
  (written when a checkpoint dir is set) are only garbage-collected by
  Spark when ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
  (default false) and the RDD is GC'd — set that flag (and run
  periodic checkpoint-dir GC) in long-lived drivers, or each
  connected_components call leaks one materialized edge copy. The
  returned labels frame is intentionally still cached: every caller
  consumes it immediately into its own store; long-lived drivers that
  don't should unpersist it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 5


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Eager checkpoint: reliable when the session has a checkpoint dir
    (cluster deployments — localCheckpoint blocks are executor-local
    and unrecoverable once lineage is truncated), local otherwise
    (single-JVM mode, where executor loss is process death anyway).
    The reliable branch persists FIRST: a bare checkpoint(eager=True)
    computes the plan twice — once for the eager materialization, again
    for the checkpoint write job (round-12 review; the exact
    re-execution pathology the round-7 cache→checkpoint change was
    made to avoid, reintroduced on the cluster path only)."""
    if df.sparkSession.sparkContext.getCheckpointDir():
        df = df.persist()
        try:
            ck = df.checkpoint(eager=True)
        finally:
            df.unpersist()
        return ck
    return df.localCheckpoint(eager=True)


def _local_components(spark, rows, node_type) -> DataFrame:
    """Driver-side union-find over a collected edge list — value-equal
    to the distributed loop (component = min member id). One pass with
    path compression + union by attaching the larger root under the
    smaller, so the root IS the min id throughout."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
        parent.setdefault(ru, ru)
        parent.setdefault(rv, rv)
    out = [(n, find(n)) for n in parent]
    from pyspark.sql.types import StructField, StructType

    schema = StructType([
        StructField("node", node_type, True),
        StructField("component", node_type, True),
    ])
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    local_edge_threshold: int = 100_000,
) -> DataFrame:
    """Label every node of the undirected pair graph with its component's
    minimum node id. Returns (node, component).

    ``edges`` rows are undirected pairs; direction and duplicates don't
    matter (they're symmetrized and deduped here).

    Small-graph fast path (round 13 — the er_append fixed-cost cut):
    when a ``limit(threshold+1)`` probe shows at most
    ``local_edge_threshold`` edge rows, the edges are collected and
    solved with driver-side union-find — metadata-sized data (100k
    edges ≈ a few MB), and it replaces the loop's per-round join +
    aggregate + convergence-count JOBS (each with fixed scheduler
    cost that dominates micro-batch appends) with ONE collect that
    executes the edge lineage exactly once. Labels are value-identical
    to the distributed loop (min member id per component). Graphs over
    the threshold pay only the short-circuiting limit probe (LocalLimit
    stops the scan at threshold+1 rows) and take the distributed loop
    unchanged; pass ``local_edge_threshold=0`` to disable the probe
    entirely. Null endpoints or mixed src/dst types fall back to the
    distributed path, which defines their semantics.
    """
    if local_edge_threshold:
        src_t = edges.schema[src].dataType
        dst_t = edges.schema[dst].dataType
        if src_t == dst_t:
            head = (
                edges.select(F.col(src), F.col(dst))
                .limit(local_edge_threshold + 1).collect()
            )
            if len(head) <= local_edge_threshold and not any(
                u is None or v is None for u, v in head
            ):
                return _local_components(edges.sparkSession, head, src_t)
    # EAGER checkpoint, not cache(): the loop consumes the edge
    # relation many times (neighbor join + convergence count per round),
    # and a cache leaves the full upstream lineage in every plan — with
    # an expensive edge source (round 7: the blocked-matmul embedding
    # near-dup, ~15 s a pass) partial cache hits re-executed the whole
    # pair computation inside the loop (measured 360 s for a 99-node
    # graph). Checkpointing truncates the lineage to the materialized
    # edges; the loop then only ever touches edge-sized data. RELIABLE
    # checkpoint when the session has a checkpoint dir (cluster
    # deployments: localCheckpoint blocks are executor-local and die
    # with the executor, unrecoverable once lineage is truncated);
    # localCheckpoint otherwise (single-JVM local mode, where executor
    # loss is process death anyway).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = _truncate_lineage(sym)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).cache()
    for it in range(max_iter):
        # candidate labels: own + every neighbor's current label
        neighbor = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if it % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            new_labels = _truncate_lineage(new_labels)
        # cached: the convergence count below and the next round's join
        # both consume this round's labels — without the cache each round
        # re-executes the whole prior lineage twice
        new_labels = new_labels.cache()
        changed = (
            labels.withColumnRenamed("label", "old")
            .join(new_labels, "node")
            .filter(F.col("old") != F.col("label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    labels.unpersist()  # error path must not leak the last round's cache
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological diameter; raise max_iter or switch to pointer-jumping"
    )


def canonical_docs(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Near-dup clustering summary: for every document in a near-dup
    component, its canonical (minimum) doc id and the cluster size.
    Returns (doc_id, canonical_id, cluster_size) for clustered docs only
    (singletons are by definition already canonical)."""
    comp = connected_components(pairs, src, dst, max_iter=max_iter)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            "cluster_size",
        )
    )
