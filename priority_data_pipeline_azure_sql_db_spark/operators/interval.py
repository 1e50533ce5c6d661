"""Interval (range) join as a bucketized equi-join.

Spark executes a raw ``ON a.key = b.key AND b.ts BETWEEN a.ts AND a.ts+Δ``
as an equi-join on key with a post-filter — fine until a key is dense,
when each key group degenerates to its own quadratic comparison. The
standard decomposition used here buckets time into Δ-wide cells: a left
row joins only its own and the following bucket, so the match space is
O(rows × bucket density), never O(rows²) per key. (Same shape the inline
``range_join_close_events`` query uses; this is the reusable,
cross-table generalization.)

Scale note: the bucket id joins WITH the key columns, so dense keys also
spread across time buckets — the partition key is (key, bucket), which is
exactly the salting axis an event stream needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float = 0.0,
    upper_seconds: float = 60.0,
    inclusive_lower: bool = False,
    inclusive_upper: bool = True,
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` with ``r_ts − l_ts`` inside
    (lower, upper] seconds (bounds configurable). Columns keep their
    names; callers should pre-alias collisions."""
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    # Round the µs bounds FIRST and derive the bucket width from them, so
    # the two-bucket candidate generation and the delta filter agree by
    # construction: independent truncation could make width < span for
    # fractional bounds, silently dropping pairs in the gap; int() also
    # truncates toward zero for negative lower bounds. MICROseconds
    # (round-12 review fix): timestamps carry µs components that a
    # millisecond delta truncated, so a same-ms/different-µs pair and a
    # boundary straddle both diverged from exact-comparison twins.
    lo_us = round(lower_seconds * 1_000_000)
    up_us = round(upper_seconds * 1_000_000)
    width_us = up_us - lo_us
    if width_us < 1:
        raise ValueError(
            "interval narrower than 1µs: bucket width rounds to zero "
            f"(lower={lower_seconds}s, upper={upper_seconds}s)"
        )

    l = left.withColumn("__lus", F.unix_micros(F.col(left_ts)))
    r = right.withColumn("__rus", F.unix_micros(F.col(right_ts)))
    # left row spans buckets [base, base+1] of the shifted right timeline:
    # r in (l+lo, l+up] ⇒ floor((r-lo)/width) ∈ {floor(l/width), +1}
    base = F.floor((F.col("__lus")) / width_us)
    l = l.withColumn("__bucket", F.explode(F.array(base, base + 1)))
    r = r.withColumn("__bucket", F.floor((F.col("__rus") - lo_us) / width_us))

    delta = F.col("__rus") - F.col("__lus")
    lo_ok = delta >= lo_us if inclusive_lower else delta > lo_us
    up_ok = delta <= up_us if inclusive_upper else delta < up_us
    return (
        l.join(r, [*on, "__bucket"])
        .filter(lo_ok & up_ok)
        .drop("__bucket", "__lus", "__rus")
    )
