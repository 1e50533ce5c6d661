"""MERGE / upsert semantics for incremental loads (SURVEY.md §4, §7 risk #1).

The reference re-fetches from ``lastRun`` with ``ge`` (inclusive) and
blind-appends, so overlapping windows duplicate rows
(reference resources/priorityDataSource.py:660-663, :871-876) — a defect we fix,
not port. Without Delta in this image, MERGE is emulated the classic way:

    target ⟵ (target ANTI-JOIN delta ON pk) UNION ALL delta

which is exactly the plan Delta's MERGE INTO produces for
whole-row-replace. One shuffle on the PK for the anti join (broadcast when
the delta is small — the common incremental case, which AQE converts
automatically); at 100 TB you'd additionally partition the target by the
watermark date so only touched partitions rewrite.

``dedup_within`` handles the delta's own duplicates (a re-fetched window
can contain the same PK twice across retries): latest-wins by an ordering
column, via max_by-style window — deterministic, unlike dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_within(df: DataFrame, pk: list[str], order_col: str | None = None) -> DataFrame:
    """Keep exactly one row per PK. With ``order_col``, latest-wins;
    without one, content-hash-wins — BOTH deterministic (round 11: the
    old ``order_col=None`` path used ``dropDuplicates``, whose winner
    depends on physical partition order; every caller of this operator
    wants the reproducibility contract, so the cheap-but-arbitrary
    form is gone).

    Determinism under TIES: two retries of the same PK can carry the
    same ``order_col`` value with different payloads (the re-fetched
    window case the module docstring cites) — ordering by ``order_col``
    alone would leave the winner to physical partition order. The
    ordering therefore tiebreaks on xxhash64 over every non-PK column,
    a pure function of row CONTENT, so the kept row is identical across
    runs, partitionings, and engines; fully identical duplicate rows
    tie harmlessly (either copy is the same row)."""
    non_pk = [c for c in df.columns if c not in pk]
    order = [F.col(order_col).desc()] if order_col is not None else []
    if non_pk:
        order.append(F.xxhash64(*[F.col(c) for c in non_pk]).desc())
    if not order:  # pk-only frame: all dups identical, any copy is fine
        return df.dropDuplicates(pk)
    w = Window.partitionBy(*pk).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(target: DataFrame, delta: DataFrame, pk: list[str]) -> DataFrame:
    """Upsert ``delta`` into ``target`` on ``pk`` — delta wins on conflict.

    Equivalent SQL: ``MERGE INTO target USING delta ON pk WHEN MATCHED THEN
    UPDATE * WHEN NOT MATCHED THEN INSERT *``. Columns must match.
    """
    kept = target.join(delta.select(*pk), on=pk, how="left_anti")
    return kept.unionByName(delta)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data audit between two snapshots of the same table: one
    row per PK present in either side, tagged ``inserted`` / ``deleted``
    / ``updated`` / ``unchanged`` — the diff the reference's
    watermark-window reloads imply but never surface (a re-fetched
    window silently overwrites; this says WHAT changed, the input to
    CDC downstreams and load-correctness checks).

    Shape: ONE full-outer join on the PK — at 100 TB both sides are the
    same table family, so bucket/partition them identically and the join
    is co-located with no shuffle (the StagingStore layout already
    partitions by PK hash). Row equality is column-wise with NULL-safe
    ``<=>`` over ``compare_cols`` (default ``None``: all shared non-PK
    columns, name-sorted so the comparison set is deterministic) — no
    row-hash, so engines can't disagree on serialization.

    ``compare_cols=[]`` is a VALID, distinct input meaning "compare
    nothing": every PK present on both sides is ``unchanged``. A caller
    like ``cdc_audit_delta`` that subtracts audit columns from the
    shared set can legitimately end up with an empty compare list; the
    old ``or``-fallback silently re-included the audit columns and
    misclassified byte-identical re-fetches as updated (round-9 ADVICE
    fix).
    """
    compare = sorted(
        (set(old.columns) & set(new.columns)) - set(pk)
    ) if compare_cols is None else compare_cols
    o = old.alias("o")
    n = new.alias("n")
    cond = None
    for c in pk:
        # plain equality, NOT eqNullSafe: PKs are non-null by definition,
        # and <=> would rewrite the join keys to (coalesce(k), isnull(k)),
        # which disables bucketed co-location and forces an exchange —
        # caught by test_snapshot_diff_bucketed_no_exchange
        eq = F.col(f"o.{c}") == F.col(f"n.{c}")
        cond = eq if cond is None else cond & eq
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    in_old = F.col(f"o.{pk[0]}").isNotNull()
    in_new = F.col(f"n.{pk[0]}").isNotNull()
    change = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("updated"))
    )
    keys = [
        F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c) for c in pk
    ]
    return o.join(n, cond, "full_outer").select(
        *keys, change.alias("change_type")
    )


def combine_rollups(
    parts: list[DataFrame], keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge pre-aggregated rollup partials — the REFRESH step of
    incremental aggregate-table maintenance: a standing rollup plus a
    delta-batch rollup re-aggregate to exactly the full recompute,
    provided every measure is ALGEBRAIC under addition (counts and sums
    are; averages must ship as sum+count and divide at read time;
    partial sums must stay DECIMAL until the final projection or the
    double bridge re-orders rounding vs the one-pass answer).

    Shape: unionByName over the partials (no shuffle) → ONE hash-agg on
    the rollup keys. Each partial is already O(#groups), so at 100 TB
    the refresh costs O(delta + groups), never a re-scan of the fact
    table — the continuous-aggregate maintenance loop.
    """
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), parts)
    return u.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def scd2_history(
    df: DataFrame,
    pk: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    op_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    row per (entity, attribute-state RUN) with ``valid_from`` /
    ``valid_to`` / ``is_current`` — the versioned-dimension build that
    turns the staging store's upsert stream into point-in-time joinable
    history. Consecutive rows with identical attributes collapse
    (NULL-safe comparison); ``valid_to`` is the next change's timestamp
    (half-open intervals), NULL while current.

    LAST-CHANGE-WINS PER INSTANT (round-11 Kimball-agreement fix): a
    published SCD2 dimension has at most ONE state per (entity,
    valid_from) — two changes at the same timestamp must collapse to
    the final one, not materialize a zero-length ``[t, t)`` version
    row. The old build emitted those: A@t1, B@t2, A@t2 produced THREE
    rows with the current row claiming "A since t2" although the
    entity was observably A since t1 (and alternating same-instant
    states emitted byte-identical rows, breaking the (pk, valid_from)
    uniqueness every downstream consumer assumes). Only the last row
    of each equal-timestamp group (by tiebreaks, then a content hash
    for full determinism) can now open or extend a run.

    Shape: KEYED windows over (pk) ordered by (ts, tiebreaks, content
    hash) — partitions are one entity's history, never corpus-sized;
    all windows share the same partitioning so Catalyst plans ONE
    shuffle. Ties on the timestamp are ordered by ``tiebreak_cols``
    (pass the event/row id) — REQUIRED for a meaningful
    last-change-per-instant if the log can carry two changes at the
    same instant.

    TOMBSTONES (round 12, VERDICT r11 ask #4): ``op_col`` names an
    optional boolean is-delete column. A tombstone row closes the
    entity's open run at its timestamp — valid_to = tombstone ts,
    is_current = false — and emits no run of its own; a later change
    RE-CREATES the entity (a new run opens even if the attributes
    equal the pre-delete state — the entity observably left and
    returned). Consecutive tombstones collapse (a double delete is a
    no-op), and a leading tombstone (delete for an entity with no
    prior state in the log) emits nothing. Because the semantics live
    in THIS builder, scd2_apply_delta and the streaming fold inherit
    delete handling unchanged — rebuild-equality and micro-batch
    boundary independence carry over to hard deletes.
    """
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    hash_cols = [F.col(c) for c in attr_cols] + (
        [F.col(op_col)] if op_col else []
    )
    order = [F.col(ts_col)] + tb + [F.xxhash64(*hash_cols)]
    w = Window.partitionBy(*pk).orderBy(*order)
    nxt_ts = F.lead(ts_col).over(w)
    # null-safe (round-12 review fix): `nxt_ts != ts` is NULL (filtered
    # out) when ts_col is NULL, silently dropping NULL-timestamp
    # changes. And `nxt_ts.isNull()` can't mark the partition end — it
    # also fires when the NEXT row's ts is NULL, keeping both rows of a
    # NULL-instant tie. lead(lit(1)) is NULL exactly at partition end;
    # eqNullSafe makes NULL <=> NULL a tie that collapses to the last.
    at_end = F.lead(F.lit(1)).over(w).isNull()
    last_of_instant = at_end | ~nxt_ts.eqNullSafe(F.col(ts_col))
    df = df.withColumn("_loi", last_of_instant).filter("_loi").drop("_loi")
    attr_change = F.lit(False)
    for c in attr_cols:
        attr_change = attr_change | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    if op_col is None:
        changed = (F.row_number().over(w) == 1) | attr_change
        runs = df.withColumn("_chg", changed).filter("_chg")
        w2 = Window.partitionBy(*pk).orderBy(*order)
        return runs.select(
            *pk,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.lead(ts_col).over(w2).isNull().alias("is_current"),
        )
    # tombstone path: a BOUNDARY row is the first row, any delete/
    # upsert flip (closing or re-creating), or a genuine attribute
    # change between two upserts. Deletes stay in the boundary
    # sequence so the following lead(ts) end-dates the prior run, then
    # drop out of the emitted history.
    dcur = F.coalesce(F.col(op_col).cast("boolean"), F.lit(False))
    dprev = F.lag(dcur).over(w)
    changed = (
        (F.row_number().over(w) == 1)
        | ~dcur.eqNullSafe(dprev)
        | (~dcur & ~F.coalesce(dprev, F.lit(True)) & attr_change)
    )
    runs = (
        df.withColumn("_del", dcur)
        .withColumn("_chg", changed).filter("_chg")
    )
    w2 = Window.partitionBy(*pk).orderBy(*order)
    return (
        runs.select(
            *pk,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.lead(ts_col).over(w2).isNull().alias("is_current"),
            "_del",
        )
        .filter(~F.col("_del"))
        .drop("_del")
    )


def scd2_close_deleted(
    history: DataFrame,
    present: DataFrame,
    pk: list[str],
    as_of,
) -> DataFrame:
    """Kimball CDC delete handling (round 11): entities ABSENT from the
    latest full snapshot get their current row end-dated — valid_to =
    ``as_of``, is_current = false — so point-in-time lookups after the
    deletion return no state and the dimension's current set matches
    reality. Before this operator existed, no SCD2 surface could expire
    an entity: snapshot_diff correctly TAGS 'deleted' rows but nothing
    consumed the tag, and a hard-deleted source entity stayed
    is_current=true with a NULL valid_to forever.

    ``present`` is the full set of live entity keys (the latest
    snapshot — NOT a watermark delta, whose absences mean 'unchanged');
    historical (already-closed) rows pass through untouched, so the
    operator is idempotent. Shape: one distinct + one left join on the
    entity key — O(|history| + |present|), co-partitionable at scale.
    """
    gone = (
        history.filter(F.col("is_current"))
        .select(*pk)
        .join(present.select(*pk).distinct(), pk, "left_anti")
        .withColumn("_gone", F.lit(True))
    )
    h = history.join(gone, pk, "left")
    closing = F.col("is_current") & F.coalesce(F.col("_gone"), F.lit(False))
    # match the history's own timestamp flavor (ntz vs ltz) — a bare
    # datetime literal is ltz and would fail analysis against an ntz
    # valid_to column
    as_of_lit = F.lit(as_of).cast(history.schema["valid_to"].dataType)
    return h.select(
        *[c for c in history.columns if c not in ("valid_to", "is_current")],
        F.when(closing, as_of_lit).otherwise(F.col("valid_to"))
        .alias("valid_to"),
        (F.col("is_current") & ~F.coalesce(F.col("_gone"), F.lit(False)))
        .alias("is_current"),
    )


def scd2_apply_delta(
    history: DataFrame,
    base_log: DataFrame,
    delta_log: DataFrame,
    pk: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    op_col: str | None = None,
) -> DataFrame:
    """INCREMENTAL SCD2 maintenance: fold a delta change-log into an
    existing type-2 history in O(touched entities), not a full-log
    rebuild. The change LOG stays the source of truth (history is
    derived state — the same discipline as the rollup store): entities
    appearing in the delta get their history rebuilt from their full
    log slice (base + delta — correct even for out-of-order and
    same-instant arrivals, because the rebuild sees the whole entity
    log with its tiebreaks); entities the delta never touches keep
    their existing history rows UNREAD beyond an anti-join on the key.
    Result is exactly ``scd2_history(base + delta)`` — equality is the
    operator's contract (pytest + the driver-checked query twin).
    ``op_col`` (round 12) carries tombstones: because the touched
    entities are rebuilt from their FULL log slice, delete handling —
    closing, re-creation, double-delete collapse — is inherited from
    scd2_history verbatim, and a tombstone arriving in any micro-batch
    ends up exactly where the one-pass build would put it.
    """
    touched = delta_log.select(*pk).distinct()
    untouched = history.join(touched, pk, "left_anti")
    touched_log = (
        base_log.join(touched, pk, "left_semi").unionByName(delta_log)
    )
    rebuilt = scd2_history(
        touched_log, pk, attr_cols, ts_col, tiebreak_cols, op_col=op_col
    )
    return untouched.unionByName(rebuilt)
