"""Sequence packing for LLM pretraining data (north star).

The standard pretraining layout: concatenate documents in a
deterministic order and chunk the token stream into fixed-budget
training sequences ("concat-and-chunk"). A document can straddle a
sequence boundary; what the pipeline needs per document is which
sequence its tokens start in, how many sequences it spans, and its
token offset inside the first one — that is exactly a prefix-sum, so
the whole operator is one window cumsum over the doc ordering, no UDFs,
one shuffle.

Scale note: the cumsum window runs over a single global ordering. At
100 TB you shard first (deterministic hash shard — operators/sample.py)
and pack per shard: each shard's window is independent and the
boundary error is at most one partial sequence per shard. The operator
takes an optional ``shard_col`` for exactly that; with it the window
partitions by shard and ordering stays within the shard.

(The greedy first-fit bin-packing variant — never splitting a document
— is a sequential scan with reset and NOT expressible as a window
function; concat-and-chunk is both the more common pretraining layout
and the one with an exact SQL twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Returns (id, n_tokens, first_seq, offset_in_seq, n_seqs_spanned)
    where sequences are ``budget`` tokens long and documents are laid
    out in ascending id order (within the shard when ``shard_col``).
    """
    part = Window.partitionBy(shard_col) if shard_col else Window.partitionBy()
    w = part.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    toks = df.select(
        *( [shard_col] if shard_col else [] ),
        F.col(id_col),
        token_count(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(w))
    start = F.col("_cum") - F.col("n_tokens")        # first token's global offset
    end = F.col("_cum") - 1                          # last token's global offset
    return cum.select(
        *( [shard_col] if shard_col else [] ),
        id_col,
        "n_tokens",
        F.floor(start / budget).cast("bigint").alias("first_seq"),
        (start % budget).cast("bigint").alias("offset_in_seq"),
        (F.floor(end / budget) - F.floor(start / budget) + 1)
        .cast("bigint").alias("n_seqs_spanned"),
    )
