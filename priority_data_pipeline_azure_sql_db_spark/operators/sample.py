"""Deterministic sampling for training-data mixes (north star).

Corpus pipelines need samples that are (a) reproducible across runs and
engines, (b) stable under repartitioning, and (c) cheap at 100 TB.
``df.sample()`` is none of these (seeded per-partition RNG — resplitting
the input changes the sample). Hash-gating is all three: a row is kept
iff a hash of its key falls below the fraction threshold, so membership
is a pure function of the key. The gate compares the leading 15 hex
digits of md5(key) against the fraction rendered as 15-digit hex —
fixed-width lowercase hex compares identically as a string in every
engine (and md5, unlike xxhash64, exists everywhere), so the DuckDB
oracle reproduces the exact sample.

Scale shape: a filter on a codegen'd hash — no shuffle, no state, prunes
at full scan speed; stratified mixing is the same filter with a
per-stratum threshold from a CASE expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits of the md5 — plenty of resolution for any
# practical fraction, and exact in BIGINT for anyone converting.
_HEX_DIGITS = 15
_SPACE = 16 ** _HEX_DIGITS


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _HEX_DIGITS)


def _threshold_hex(fraction: float) -> str:
    n = int(fraction * _SPACE)
    if n >= _SPACE:
        # saturate: 'g' sorts after every hex digit, so every fixed-width
        # hex prefix passes (a 16-char numeric rendering would string-sort
        # BELOW 15-char prefixes and silently keep ~1/16 instead of all)
        return "g"
    return format(n, f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by key.

    Same key ⇒ same verdict on every run, engine, and partitioning; a
    different ``salt`` draws an independent sample (e.g. independent
    subsamples for ablations).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(_hash_prefix(key) < F.lit(_threshold_hex(fraction)))


def stratified_mix(df: DataFrame, stratum_col: str, key_col: str,
                   fractions: dict[str, float], salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix weighting
    step (e.g. keep 100% of books, 10% of web). Strata absent from
    ``fractions`` are dropped; the verdict is the same hash gate as
    ``hash_sample`` with the threshold chosen by stratum."""
    if not fractions:
        raise ValueError(
            "stratified_mix requires at least one stratum fraction "
            "(an empty mix would silently drop the whole corpus)"
        )
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    case = None
    for s, f in sorted(fractions.items()):
        cond = F.col(stratum_col) == F.lit(s)
        t = F.lit(_threshold_hex(f))
        case = F.when(cond, t) if case is None else case.when(cond, t)
    thr = case.otherwise(F.lit(""))  # unknown stratum: nothing sorts below ''
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(_hash_prefix(key) < thr)


def split_train_eval(df: DataFrame, key_col: str, eval_fraction: float = 0.01,
                     salt: str = "split") -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split by key hash:
    the eval set is the bottom ``eval_fraction`` of the hash space, train
    is everything else — membership never changes as the corpus grows
    (a new row lands on one fixed side), the property that prevents
    train/eval contamination across pipeline re-runs."""
    thr = F.lit(_threshold_hex(eval_fraction))
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    prefix = _hash_prefix(key)
    return df.filter(prefix >= thr), df.filter(prefix < thr)
