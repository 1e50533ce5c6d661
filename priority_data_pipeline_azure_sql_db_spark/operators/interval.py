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
    # Round the ms bounds FIRST and derive the bucket width from them, so
    # the two-bucket candidate generation and the delta filter agree by
    # construction: independent truncation could make width_ms < up_ms -
    # lo_ms for fractional bounds (e.g. lower=0.0009, upper=1.0 → width
    # 999 vs span 1000), silently dropping pairs in the gap; int() also
    # truncates toward zero for negative lower bounds, shifting by 1ms.
    lo_ms = round(lower_seconds * 1000)
    up_ms = round(upper_seconds * 1000)
    width_ms = up_ms - lo_ms
    if width_ms < 1:
        raise ValueError(
            "interval narrower than 1ms: bucket width rounds to zero "
            f"(lower={lower_seconds}s, upper={upper_seconds}s)"
        )

    l = left.withColumn("__lms", F.unix_millis(F.col(left_ts)))
    r = right.withColumn("__rms", F.unix_millis(F.col(right_ts)))
    # left row spans buckets [base, base+1] of the shifted right timeline:
    # r in (l+lo, l+up] ⇒ floor((r-lo)/width) ∈ {floor(l/width), +1}
    base = F.floor((F.col("__lms")) / width_ms)
    l = l.withColumn("__bucket", F.explode(F.array(base, base + 1)))
    r = r.withColumn("__bucket", F.floor((F.col("__rms") - lo_ms) / width_ms))

    delta = F.col("__rms") - F.col("__lms")
    lo_ok = delta >= lo_ms if inclusive_lower else delta > lo_ms
    up_ok = delta <= up_ms if inclusive_upper else delta < up_ms
    return (
        l.join(r, [*on, "__bucket"])
        .filter(lo_ok & up_ok)
        .drop("__bucket", "__lms", "__rms")
    )
