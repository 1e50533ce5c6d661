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
