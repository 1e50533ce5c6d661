"""Sharded corpus export: size-bounded parquet shards + a manifest.

Training-data consumers read a corpus as N similarly-sized shards with a
manifest (file → rows/bytes) for deterministic work assignment, resharding
decisions, and integrity checks. This sink produces exactly that:

- ``maxRecordsPerFile`` bounds shard size WITHOUT a repartition — each
  write task rolls to a new file at the limit, so no extra shuffle;
- an optional deterministic layout (``shard_by``): repartition on
  ``hash(key) % num_shards`` so a given key always lands in the same
  shard — the property that lets downstream dedup/joins run shard-local;
- the manifest is built from parquet FOOTERS (pyarrow metadata read —
  O(files), no data scan).

At 100 TB this is the same code path: ``maxRecordsPerFile`` is enforced
per task on executors, footer listing parallelizes over files, and the
manifest stays O(shards).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.store_io import write_partitioned

MANIFEST_NAME = "_manifest.jsonl"


def write_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    shard_by: str | None = None,
    num_shards: int | None = None,
) -> dict:
    """Write ``df`` as bounded parquet shards and a manifest; returns the
    manifest summary dict."""
    writer = df
    if shard_by is not None:
        if not num_shards:
            raise ValueError("shard_by requires num_shards")
        # single hash layer: repartition already places rows by
        # hash(column) % num_shards — pre-hashing ourselves would add a
        # second hash over N distinct values and leave some shards empty
        writer = df.repartition(num_shards, F.col(shard_by))
    (
        writer.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
    return write_manifest(path)


def write_manifest(path: str) -> dict:
    """Scan the shard directory's parquet footers into ``_manifest.jsonl``
    (one line per shard: name relative to ``path``, rows, bytes) and
    return a summary.

    Listing goes through ``pyarrow.fs`` (resolved from the path/URI, so
    ``s3://...`` and ``hdfs://...`` work the same as a local directory)
    and recurses, so Hive-partitioned layouts (``key=value/part-*.parquet``)
    are fully enumerated — not just top-level files."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    filesystem, root = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(), os.path.abspath(path)
    )
    infos = filesystem.get_file_info(
        pafs.FileSelector(root, recursive=True, allow_not_found=False)
    )
    entries = []
    for info in sorted(infos, key=lambda i: i.path):
        if info.type != pafs.FileType.File or not info.path.endswith(".parquet"):
            continue
        with filesystem.open_input_file(info.path) as f:
            n_rows = pq.ParquetFile(f).metadata.num_rows
        entries.append({
            "file": os.path.relpath(info.path, root),
            "rows": n_rows,
            "bytes": info.size,
        })
    manifest_path = f"{root.rstrip('/')}/{MANIFEST_NAME}"
    with filesystem.open_output_stream(manifest_path) as out:
        for e in entries:
            out.write((json.dumps(e) + "\n").encode())
    return {
        "shards": len(entries),
        "rows": sum(e["rows"] for e in entries),
        "bytes": sum(e["bytes"] for e in entries),
    }


def read_manifest(path: str) -> list[dict]:
    from pyarrow import fs as pafs

    filesystem, root = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(), os.path.abspath(path)
    )
    with filesystem.open_input_stream(f"{root.rstrip('/')}/{MANIFEST_NAME}") as fh:
        text = fh.read().decode()
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def write_ordered_shards(
    df: DataFrame,
    out_dir: str,
    order_cols: list[str],
    n_shards: int = 16,
) -> list[dict]:
    """GLOBALLY ORDERED export without a single-task sort: Spark's
    range partitioner samples the order keys to pick ``n_shards``
    boundary splits, each shard sorts locally, and shard k's every row
    precedes shard k+1's — so reading shards in index order replays the
    exact global order (the curriculum-schedule export: easy-to-hard
    across the WHOLE corpus, written at full parallelism). A naive
    ``orderBy().write`` collapses to one task for the final sort at
    scale; ``orderBy`` + parquet keeps Spark's range exchange but
    loses the shard→range map consumers need for resumable ordered
    reads — this writer persists it.

    Writes ``shard=k`` directories plus an ordering manifest (one row
    per shard: index, rows, min/max of the leading order column) and
    returns the manifest. Boundaries come from SAMPLING, so shard SIZES
    vary run to run (the registered query is rows-only for exactly that
    reason) — but the ordering contract itself is exact and is asserted
    by pytest: non-overlapping ascending shard ranges, each shard
    internally sorted.
    """
    import json as _json

    # sort key leads with the to-be partition column: FileFormatWriter
    # requires ordering by partitionBy cols, and an unsatisfied child
    # ordering gets a SortExec(shard) injected ABOVE this sort — stable
    # in memory, but a spilled external merge interleaves equal-key
    # runs arbitrarily, silently unsorting shards exactly at the scale
    # the writer exists for. shard is constant per task here, so the
    # row order is identical to sorting by order_cols alone — the
    # leading key only makes the writer's requirement already-satisfied.
    ranged = df.repartitionByRange(n_shards, *[F.col(c) for c in order_cols]) \
        .withColumn("shard", F.spark_partition_id()) \
        .sortWithinPartitions("shard", *order_cols)
    write_partitioned(ranged, out_dir, ["shard"], what="ordered shards")
    spark = df.sparkSession
    lead = order_cols[0]
    stats = (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(lead).alias("lo"),
            F.max(lead).alias("hi"),
        )
        .orderBy("shard")
        .collect()  # O(n_shards) manifest rows — metadata, not data
    )
    manifest = [
        {"shard": r["shard"], "rows": r["rows"],
         "lo": str(r["lo"]), "hi": str(r["hi"])}
        for r in stats
    ]
    with open(os.path.join(out_dir, "_order_manifest.jsonl"), "w") as fh:
        for m in manifest:
            fh.write(_json.dumps(m) + "\n")
    return manifest
