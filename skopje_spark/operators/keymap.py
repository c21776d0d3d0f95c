"""KeyMap — distributed surrogate-key management.

Re-expression of the reference's in-memory bijective key map
(`KeyMap<PK, Obj>`, ``/root/reference/src/keymap.rs:37-44``) and its
get-or-assign `transact` (``/root/reference/src/keymap.rs:149-183``) /
gap-filling `calc_lowest_key` (``/root/reference/src/keymap.rs:129-147``)
algorithms, as *batch* DataFrame operators.

Two allocation policies:

- **dense** (idiomatic, scale path): new values get
  ``max(existing_key) + dense_rank() OVER (ORDER BY value)``. One
  global window over the *new values only* — dimensions are small
  relative to facts, so a single-partition window over the novel
  values is cheap; existing rows never move.
- **gapfill** (exact reference parity): the smallest free integers are
  assigned in value order, reproducing `calc_lowest_key`'s scan-from-0
  semantics ({0,1,3} → next is 2, per the reference doc-test
  ``/root/reference/src/keymap.rs:24-35``). Implemented distributively:
  ``sequence(0, max_key + n_new)`` → anti-join existing keys → zip by
  row_number. Cost is O(max_key + n) — inherent to gap-filling; use
  dense at 100 TB.

Uniqueness in both directions (the BiMap invariant) holds by
construction: incoming values are deduplicated before assignment and
keys are allocated injectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keymap_assign(
    dim: DataFrame,
    incoming: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    policy: str = "dense",
) -> DataFrame:
    """Get-or-assign surrogate keys (batch `transact`,
    ``/root/reference/src/keymap.rs:149-183``).

    Parameters
    ----------
    dim : existing dimension ``(key_col: bigint, value_col)``.
    incoming : rows containing ``value_col`` (any other columns are
        ignored); duplicates are collapsed.
    policy : 'dense' (max+dense_rank, scale path) or 'gapfill'
        (smallest-free-key, exact reference parity).

    Returns the updated dimension ``(key_col, value_col)`` covering the
    union of old and new values.
    """
    dim = dim.select(
        F.col(key_col).cast("bigint").alias(key_col), F.col(value_col)
    )
    values = incoming.select(value_col).distinct()
    new_vals = values.join(dim.select(value_col), value_col, "left_anti")

    if policy == "dense":
        w = Window.orderBy(value_col)
        # max over existing keys: broadcast one-row aggregate, no collect
        mx = dim.agg(F.coalesce(F.max(key_col), F.lit(-1)).alias("__mx"))
        assigned = (
            new_vals.crossJoin(F.broadcast(mx))
            .select(
                (F.col("__mx") + F.dense_rank().over(w)).cast("bigint").alias(key_col),
                F.col(value_col),
            )
        )
        return dim.unionByName(assigned)

    if policy == "gapfill":
        bounds = dim.agg(
            F.coalesce(F.max(key_col), F.lit(-1)).alias("__mx")
        ).crossJoin(new_vals.agg(F.count(F.lit(1)).alias("__n")))
        # candidate keys 0..max+n cover ≥ n free slots by pigeonhole
        candidates = bounds.select(
            F.explode(F.sequence(F.lit(0), (F.col("__mx") + F.col("__n")).cast("bigint")))
            .alias(key_col)
        )
        free = candidates.join(dim.select(key_col), key_col, "left_anti")
        wk = Window.orderBy(key_col)
        wv = Window.orderBy(value_col)
        free_ranked = free.select(
            F.col(key_col), F.row_number().over(wk).alias("__rn")
        )
        new_ranked = new_vals.select(
            F.col(value_col), F.row_number().over(wv).alias("__rn")
        )
        assigned = (
            new_ranked.join(free_ranked, "__rn")
            .select(F.col(key_col).cast("bigint"), F.col(value_col))
        )
        return dim.unionByName(assigned)

    raise ValueError(f"unknown policy {policy!r}")


def keymap_lookup(
    dim: DataFrame,
    facts: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Replace ``value_col`` in a fact stream with its surrogate key
    (the read side of the BiMap). Broadcasts the dimension — the
    canonical small-dim/large-fact pattern."""
    return facts.join(F.broadcast(dim), value_col, "left").drop(value_col)
