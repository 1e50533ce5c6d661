"""Generic as-of (merge_asof) join as a single-shuffle window plan.

Spark has no native as-of join; the naive form (theta join on ts ranges +
per-left-row top-1) shuffles twice and explodes on dense keys. The scale
pattern used here: tag both sides, UNION them on a common layout, sort
each key group once by (ts, side-priority), and carry the right side's
latest value forward with an IGNORE NULLS running last — every left row
reads its as-of match in one pass. One shuffle on the key columns, state
O(1) per row, no range-join blowup. (Same shape the inline
``asof_last_click_before_error`` query uses; this is the reusable,
cross-table generalization.)

Semantics match pandas ``merge_asof``: ``direction='backward'`` takes the
latest right row with ``r_ts <= l_ts`` (``allow_exact_matches=False`` →
strictly ``<``); ``'forward'`` the earliest with ``r_ts >= l_ts``.
``tolerance`` (seconds) drops matches further than that from the left ts
and must be positive (pandas raises; so do we). NULL timestamps
(round-12 review — pandas raises 'Merge keys contain null values'): a
distributed operator can't cheaply pre-raise without an extra action,
so the DOCUMENTED deviation is deterministic null semantics instead of
fabricated matches — right rows with a NULL ts never match anything,
left rows with a NULL ts come back unmatched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Return ``left`` with ``right_cols`` (suffixed) from each row's
    as-of match in ``right``; unmatched rows keep nulls."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_seconds is not None and tolerance_seconds <= 0:
        # a sign error would silently drop EVERY match (gap >= 0 always)
        raise ValueError("tolerance_seconds must be positive")

    # Right rows must sort before left rows at equal ts for inclusive
    # matches (so the frame up to the current row sees them), after for
    # exclusive. 'forward' flips the sort, which flips the rule.
    inclusive_first = allow_exact_matches
    r_prio = 0 if inclusive_first else 2

    rv = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    ).alias("__rv")
    # NULL-ts right rows would sort NULLS-FIRST (backward) and become
    # the carried 'latest' for every real left row — fabricated matches
    # pandas would have raised on (round-12 review fix)
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(r_prio).alias("__prio"),
        rv,
    )
    # the whole left row rides through the union as a struct — no row-id
    # join-back afterwards, so the plan stays ONE shuffle on the key
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__prio"),
        F.lit(None).cast(r_tagged.schema["__rv"].dataType).alias("__rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    r_tagged = r_tagged.withColumn(
        "__lrow", F.lit(None).cast(l_tagged.schema["__lrow"].dataType)
    )

    # __rv as the final sort key makes ties among right rows at the same
    # (key, ts) deterministic: last() then always returns the greatest
    # right-value struct, independent of shuffle order (left rows carry
    # NULL __rv, which sorts consistently and never competes).
    order = [F.col("__ts"), F.col("__prio"), F.col("__rv")]
    if direction == "forward":
        order = [F.col("__ts").desc(), F.col("__prio"), F.col("__rv")]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        r_tagged.unionByName(l_tagged)
        .withColumn("__match", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__lrow").isNotNull())
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__match.__rts").cast("double")
        )
        merged = merged.withColumn(
            "__match", F.when(gap <= tolerance_seconds, F.col("__match"))
        )

    # NULL-ts left rows are unmatched by definition (forward sort put
    # them NULLS-LAST where they'd swallow the earliest right row)
    merged = merged.withColumn(
        "__match", F.when(F.col("__ts").isNotNull(), F.col("__match"))
    )
    out = merged.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        F.col("__match.__rts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
