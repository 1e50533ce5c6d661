"""Streaming ingest into the pipeline's staging store (round 7).

Connects the two halves of the repo: Structured Streaming sources feed
the SAME partition-pruned MERGE staging layer the batch pipeline loads
(`pipeline.StagingStore`), via ``foreachBatch`` — the standard Spark
recipe for streaming upserts into a batch-format table.

Delivery contract: Structured Streaming replays a failed micro-batch
from the checkpoint with the SAME batch_id and contents, and the MERGE
is idempotent on the primary key (a replayed delta upserts the same
rows to the same values), so the sink is effectively-once end to end —
checkpointed at-least-once delivery composed with an idempotent write.
That composition is exactly what the batch pipeline's bookmark+MERGE
contract provides for incremental loads (SURVEY.md EP1), re-expressed
for a continuous source.

Scale shape: each micro-batch MERGE moves O(delta) — the PK semi-join
prunes untouched partitions (pipeline.py:97) — so steady-state cost
tracks the stream rate, not the table size. One staging table accepts
one stream (StagingStore.merge rewrites whole partitions; serialize
writers per table the same way batch runs are serialized per entity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..pipeline import StagingStore


def stream_merge_into_staging(
    stream: DataFrame,
    store: StagingStore,
    table: str,
    pk: list[str],
    checkpoint_dir: str,
):
    """Run an available-now streaming MERGE: drain everything the source
    currently has into ``stg_<table>`` through per-micro-batch upserts,
    then stop. Returns the finished StreamingQuery (caller inspects
    ``lastProgress``/recentProgress for batch accounting).

    ``availableNow`` (not ``once``) so the drain respects source rate
    limits (maxFilesPerTrigger) while still terminating — the batch-job
    form of a continuous ingest; drop the trigger for 24/7 tailing.
    """
    spark = stream.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # dropDuplicates within the batch: a micro-batch may carry the
        # same PK twice (source replays, late files); MERGE semantics
        # need one row per key per batch. Deterministic survivor: max
        # by the remaining columns is overkill here — the staging MERGE
        # itself is last-writer-wins per batch, so any stable pick
        # works; dropDuplicates keeps the first encountered.
        store.merge(spark, batch_df.dropDuplicates(pk), table, pk)

    return (
        stream.writeStream
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_rollup_pointer(store_path: str) -> tuple[int, str | None]:
    """(last_applied_batch_id, current agg dir) — (-1, None) if empty."""
    import os

    ptr = os.path.join(store_path, "CURRENT")
    if not os.path.exists(ptr):
        return -1, None
    with open(ptr) as fh:
        bid, dirname = fh.read().strip().split("\n")
    return int(bid), os.path.join(store_path, dirname)


def fold_rollup_batch(
    spark,
    store_path: str,
    delta_agg: DataFrame,
    batch_id: int,
    keys: list[str],
    sum_cols: list[str],
) -> bool:
    """Fold one micro-batch's pre-aggregated delta into the standing
    rollup store, EXACTLY once. Unlike the PK MERGE sink, a rollup
    merge is NOT idempotent (folding a replayed batch double-counts),
    so at-least-once delivery needs a ledger: the pointer file CURRENT
    records (last_applied_batch_id, current agg version dir) and is
    swapped atomically (os.replace) only AFTER the new version is fully
    written. A replayed batch_id <= the pointer's is skipped; a crash
    between version write and pointer swap leaves the pointer on the
    old version, so the replay re-folds against unchanged state. New
    versions go to fresh dirs (a parquet store cannot be read and
    overwritten in place); the superseded dir is removed best-effort
    after the swap. Returns True if the batch was applied.
    """
    import os
    import shutil

    from ..operators.merge import combine_rollups

    last, cur = _read_rollup_pointer(store_path)
    if batch_id <= last:
        return False  # replay of an already-folded batch
    parts = [delta_agg]
    if cur is not None:
        parts.append(spark.read.parquet(cur))
    merged = combine_rollups(parts, keys, sum_cols)
    new_dir = f"agg_{batch_id}"
    merged.write.mode("overwrite").parquet(os.path.join(store_path, new_dir))
    tmp = os.path.join(store_path, "CURRENT.tmp")
    os.makedirs(store_path, exist_ok=True)
    with open(tmp, "w") as fh:
        fh.write(f"{batch_id}\n{new_dir}")
    os.replace(tmp, os.path.join(store_path, "CURRENT"))
    if cur is not None:
        shutil.rmtree(cur, ignore_errors=True)  # superseded version
    return True


def stream_rollup_into_store(
    stream: DataFrame,
    rollup_fn,
    store_path: str,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
):
    """Streaming INCREMENTAL AGGREGATE MAINTENANCE: keep a standing
    rollup current against a stream for O(delta + groups) per
    micro-batch — the continuous-aggregate counterpart of the staging
    MERGE sink, for the non-idempotent (additive) case. Each batch
    aggregates its own rows (``rollup_fn``, algebraic measures only —
    see combine_rollups) and folds via the exactly-once pointer ledger
    (:func:`fold_rollup_batch`). Reading the current rollup is one
    pointer lookup + parquet read of O(groups) rows.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        fold_rollup_batch(
            batch_df.sparkSession, store_path, rollup_fn(batch_df),
            batch_id, keys, sum_cols,
        )

    return (
        stream.writeStream
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_store(spark, store_path: str) -> DataFrame:
    """Current contents of a rollup store (empty read is an error —
    a consumer before the first fold should fail loudly, not see an
    empty aggregate that looks like 'no data')."""
    _, cur = _read_rollup_pointer(store_path)
    if cur is None:
        raise RuntimeError(f"rollup store has no applied batches: {store_path}")
    return spark.read.parquet(cur)
