"""JSONL corpus export — the interchange format LLM training stacks eat.

Parquet is the engine-internal layout (sinks/shards.py); JSON Lines is
what tokenizer trainers, data loaders, and third-party curation tools
exchange. Spark's JSON writer emits exactly one JSON object per line
(JSONL), so the sink is the native ``write.json`` with the same
discipline as the parquet shard sink:

- ``maxRecordsPerFile`` bounds shard size without an extra shuffle;
- optional deterministic layout: repartition on ``hash(key) %
  num_shards`` so a key always lands in the same shard;
- optional gzip (a .json.gz shard is splittable at the FILE level —
  standard for JSONL corpora, where the shard is the unit of work);
- a manifest (one line per shard: file, bytes; JSONL rows are counted
  on read-back, not from footers — JSON has none) for deterministic
  work assignment and integrity checks.

Round-trip fidelity caveat (documented, not hidden): JSON has no
int64-vs-double or timestamp type discipline — a lossless round-trip
holds for string/integral/boolean columns (the training-corpus shape:
id, text, metadata), and the reader takes an explicit schema to avoid
inference drift. Binary columns must be encoded (base64) upstream.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.jsonl"


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
    shard_by: str | None = None,
    num_shards: int | None = None,
    compression: str | None = "gzip",
) -> dict:
    """Write ``df`` as JSONL shards + manifest; returns a summary dict."""
    writer = df
    if shard_by is not None:
        if not num_shards:
            raise ValueError("shard_by requires num_shards")
        writer = df.repartition(num_shards, F.col(shard_by))
    w = (
        writer.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if compression:
        w = w.option("compression", compression)
    w.json(path)
    return write_jsonl_manifest(path)


def write_jsonl_manifest(path: str) -> dict:
    """List the shard files into ``_manifest.jsonl`` (file, bytes) and
    return a summary. Uses ``pyarrow.fs`` like the parquet manifest, so
    object stores work identically to local directories."""
    from pyarrow import fs as pafs

    filesystem, root = pafs.FileSystem.from_uri(path) if "://" in path else (
        pafs.LocalFileSystem(), os.path.abspath(path)
    )
    infos = filesystem.get_file_info(
        pafs.FileSelector(root, recursive=True, allow_not_found=False)
    )
    entries = []
    for info in sorted(infos, key=lambda i: i.path):
        name = os.path.basename(info.path)
        if info.type != pafs.FileType.File:
            continue
        if not (".json" in name) or name.startswith(("_", ".")):
            continue
        entries.append({
            "file": os.path.relpath(info.path, root),
            "bytes": info.size,
        })
    manifest_path = f"{root.rstrip('/')}/{MANIFEST_NAME}"
    with filesystem.open_output_stream(manifest_path) as out:
        for e in entries:
            out.write((json.dumps(e) + "\n").encode())
    return {
        "shards": len(entries),
        "bytes": sum(e["bytes"] for e in entries),
    }


def read_jsonl_shards(
    spark: SparkSession, path: str, schema: str, mode: str = "FAILFAST"
) -> DataFrame:
    """Read a JSONL shard directory back with an EXPLICIT schema (never
    inference — sampling-based inference can flip a column's type
    between runs, which breaks hash-stable round-trips) and FAILFAST
    parsing by default: Spark's PERMISSIVE mode turns a corrupt or
    truncated line into an all-null row, silently corrupting counts —
    a sink that sells hash-stable round-trips must surface torn shards
    at read time. Pass mode='PERMISSIVE' explicitly for salvage
    reads."""
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("pathGlobFilter", "part-*")
        .json(path)
    )


class QuarantineRead(NamedTuple):
    """Result of :func:`read_jsonl_with_quarantine`.

    ``cached`` is the shared cached parse both sides filter — after
    materializing ``good`` and ``bad``, call ``cached.unpersist()`` to
    release it (round-9 ADVICE fix: the cache is REQUIRED by
    SPARK-21610 but was previously unreleasable, leaking one cached
    relation per call for the session's lifetime)."""

    good: DataFrame
    bad: DataFrame
    cached: DataFrame


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema: str
) -> QuarantineRead:
    """Salvage read with row-level DEAD-LETTERING: parse a JSONL
    directory against an explicit schema and split the result into
    (good, quarantined) — the production middle ground between FAILFAST
    (one torn line kills a 100 TB read) and plain PERMISSIVE (corrupt
    lines silently become all-null rows that poison counts downstream).

    Good rows parsed cleanly; quarantined rows carry the raw offending
    line in ``_corrupt_record`` for replay/repair after the upstream
    writer is fixed — the standard dead-letter loop. Both sides come
    from ONE scan definition (Spark plans the parse once; the split is
    two filters on the corrupt marker), and the caller decides the
    policy: alert on ``quarantined.count() > 0``, persist it next to
    the staging table, or fail the batch above a threshold. Release the
    backing cache with ``result.cached.unpersist()`` once both sides
    are materialized (see :class:`QuarantineRead`).
    """
    full = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("pathGlobFilter", "part-*")
        .json(path)
        # Spark requires caching/materializing referenced corrupt-record
        # columns before filtering on them (SPARK-21610: the parser
        # drops the raw line otherwise)
        .cache()
    )
    good = full.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    bad = full.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return QuarantineRead(good, bad, full)
