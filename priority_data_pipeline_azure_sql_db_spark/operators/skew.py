"""Skew-mitigation utilities (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
our session) handles most skew at runtime. ``salted_join`` is the
explicit fallback for the pathological case AQE can't fix: a shuffle join
where one key owns a double-digit percentage of the rows (the classic
hot-customer / null-key problem).

Mechanics: the skewed (large) side gets a random salt in [0, n); the
small side is exploded n× with every salt value; the join key becomes
(key, salt), spreading the hot key over n reducers. Cost: n× replication
of the small side — use only for genuinely hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    Deterministic salt (hash of the full row modulo buckets) so the result
    is reproducible; distribution quality matches random for salting
    purposes.
    """
    salted_large = large.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_buckets)),
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    return salted_large.join(replicated_small, on=[*on, SALT_COL], how=how).drop(SALT_COL)
