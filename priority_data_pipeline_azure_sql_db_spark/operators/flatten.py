"""Nested sub-form handling (SURVEY.md §2.1 O6/O7).

The reference's only nested structure: an OData ``$expand`` inlines child
rows as a JSON array column per parent row; ``parsingDf`` then splits the
response into a parent table plus one child table per sub-form, copying the
parent's PK onto every child row
(reference resources/priorityDataSource.py:696-703, :750-826 — core
``pd.json_normalize(record_path=..., meta=pk)`` at :804).

Spark-native shape: the nested response is an ``ArrayType(StructType)``
column; flattening is ``explode_outer`` + struct expansion. Both directions
below are expressed declaratively so Catalyst owns the physical plan:

- ``nest_subform`` (child rows → array-per-parent) is a ``groupBy(pk)`` +
  ``collect_list(struct(...))`` + a left join back to the parent — two
  shuffles on the parent key, both AQE-coalesced; at 100 TB you'd
  pre-bucket parent and child on the PK so the join is shuffle-free.
- ``explode_subform`` is a generate + projection: NO shuffle at all.
  Parent-key propagation is free because the key is already on the row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nest_subform(
    parent: DataFrame,
    child: DataFrame,
    parent_pk: list[str],
    child_join_keys: list[str],
    subform_col: str,
) -> DataFrame:
    """Inline child rows as an array<struct> column on each parent row —
    the engine-side equivalent of the source's ``$expand`` (O6).

    ``child_join_keys`` are the child's FK columns matching ``parent_pk``
    positionally. Parents with no children get an empty array (the OData
    response shape), not null.
    """
    payload_cols = [c for c in child.columns if c not in set(child_join_keys)]
    per_parent = (
        child.groupBy(*child_join_keys)
        .agg(F.collect_list(F.struct(*payload_cols)).alias(subform_col))
    )
    cond = [parent[p] == per_parent[c] for p, c in zip(parent_pk, child_join_keys)]
    joined = parent.join(per_parent, cond, "left")
    empty = F.array().cast(per_parent.schema[subform_col].dataType)
    return joined.select(
        *[parent[c] for c in parent.columns],
        F.coalesce(F.col(subform_col), empty).alias(subform_col),
    )


def explode_subform(
    nested: DataFrame,
    parent_pk: list[str],
    subform_col: str,
) -> DataFrame:
    """O7: split a nested sub-form back out into its own child table, with
    the parent PK replicated onto each child row (``meta=pk`` semantics,
    reference resources/priorityDataSource.py:804).

    Plain ``explode`` (not ``explode_outer``) drops parents whose sub-form
    array is empty or null directly — matching the reference: a parent
    with no sub-form rows contributes nothing to the child table.
    """
    elem = "__subform_elem"
    exploded = nested.select(*parent_pk, F.explode(subform_col).alias(elem))
    child_fields = exploded.schema[elem].dataType.fieldNames()
    return exploded.select(*parent_pk, *[F.col(f"{elem}.{f}").alias(f) for f in child_fields])


def flatten_expand(
    parent: DataFrame,
    child: DataFrame,
    parent_pk: list[str],
    child_join_keys: list[str],
) -> DataFrame:
    """The scale path for $expand flattening: semantically identical to
    ``explode_subform(nest_subform(...))`` — child rows restricted to the
    (watermark-filtered) parents, FK columns renamed to the parent PK —
    but physically a single semi-join on the key set instead of a
    collect_list materialization.

    Why: nest-then-explode builds one array per parent (GC-hostile at any
    scale, catastrophic at 100 TB); the join form broadcasts the parent
    key set when small and AQE-shuffles otherwise, never materializing
    arrays. Use ``nest_subform``/``explode_subform`` only when the source
    genuinely delivers nested data.
    """
    # no distinct needed: left-semi never duplicates the probe side
    keys = parent.select(
        *[parent[p].alias(c) for p, c in zip(parent_pk, child_join_keys)]
    )
    flat = child.join(keys, on=child_join_keys, how="left_semi")
    for p, c in zip(parent_pk, child_join_keys):
        flat = flat.withColumnRenamed(c, p)
    return flat.select(
        *parent_pk, *[c for c in flat.columns if c not in set(parent_pk)]
    )


def parent_without_subforms(nested: DataFrame, subform_cols: list[str]) -> DataFrame:
    """O8: the parent table = all columns minus the sub-form array columns
    (reference resources/priorityDataSource.py:781-786)."""
    drop = set(subform_cols)
    return nested.select(*[c for c in nested.columns if c not in drop])
