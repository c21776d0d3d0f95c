"""Change-data-capture operators: snapshot diff, changelog apply,
SCD2 dimension historization.

The reference's load surface is existence-driven upsert against a
mutable store (``fetch_or_insert``, ``/root/reference/src/extract/pg.rs:67-99``;
transactional INSERT, ``/root/reference/src/load/pg.rs:50-86``) — Postgres
keeps "current state" and history is lost. A lake engine works on
immutable snapshots, so the same user needs the inverse tools:

- :func:`snapshot_diff` — turn two snapshots into an I/U/D changelog
  (what the Postgres WAL gave the reference's users for free);
- :func:`apply_changes` — replay a changelog onto a snapshot
  (``diff(old, new)`` applied to ``old`` reproduces ``new`` exactly —
  property-tested);
- :func:`scd2_apply` — get-or-create with *history*: the reference's
  ``KeyMap::transact`` (``/root/reference/src/keymap.rs:149-183``)
  answers "what is the current row"; SCD2 additionally answers "what
  was the row at time t" via [valid_from, valid_to) intervals.

Scale notes (100 TB): every operator is a single full-outer or left
join on the business key — one shuffle each side, AQE-coalesced, no
window over the full fact, no collect. For repeated daily diffs,
bucket both snapshots on the key (operators/skew.write_bucketed) and
the join plans zero exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_COL = "__op"


def _any_differs(left_prefix: str, right_prefix: str, cols: Sequence[str]) -> Column:
    """True when any tracked column differs (null-safe)."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | ~F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}"))
    return cond


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """I/U/D changelog between two snapshots of the same table.

    Returns one row per changed key with the key columns, the NEW
    values of ``compare_cols`` (OLD values for deletes), and ``__op``
    in {'I','U','D'}. Unchanged keys are dropped. One full-outer join
    on the key; both sides shuffle once.
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    # literal presence markers, not key-NULL checks: a matched row can
    # carry NULL key values (eqNullSafe join), and — the bug that
    # matters in practice — an update that sets a value to NULL must
    # emit NULL as the row's NEW image, which a coalesce(new, old)
    # projection silently replaces with the OLD value (corrupting any
    # downstream that folds new images, e.g. operators/ivm.py).
    o = old.withColumn("__o_side", F.lit(True)).alias("o")
    n = new.withColumn("__n_side", F.lit(True)).alias("n")
    on = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    joined = o.join(n, cond, "full_outer")
    new_present = F.col("n.__n_side").isNotNull()
    old_present = F.col("o.__o_side").isNotNull()
    op = (
        F.when(~old_present, F.lit("I"))
        .when(~new_present, F.lit("D"))
        .when(_any_differs("o", "n", compare_cols), F.lit("U"))
        .otherwise(F.lit(None))
    )
    out_keys = [
        F.when(new_present, F.col(f"n.{k}")).otherwise(F.col(f"o.{k}")).alias(k)
        for k in keys
    ]
    # I/U rows carry NEW values (NULLs included); D rows carry OLD
    out_vals = [
        F.when(new_present, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in compare_cols
    ]
    return (
        joined.select(*out_keys, *out_vals, op.alias(OP_COL))
        .filter(F.col(OP_COL).isNotNull())
    )


def apply_changes(
    snapshot: DataFrame, changes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Replay an I/U/D changelog (shape of :func:`snapshot_diff`)
    onto a snapshot: keys present in the changelog take the changelog
    row (or disappear for 'D'); all other rows pass through. By
    construction ``apply_changes(old, snapshot_diff(old, new)) ≡ new``.
    One left-anti join plus a union — single shuffle per side."""
    value_cols = [c for c in snapshot.columns if c not in keys]
    untouched = snapshot.join(changes.select(*keys), list(keys), "left_anti")
    replaced = (
        changes.filter(F.col(OP_COL) != "D")
        .select(*keys, *value_cols)
    )
    return untouched.select(*keys, *value_cols).unionByName(replaced)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    track_cols: Sequence[str],
    load_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply an update batch to a type-2 slowly-changing dimension.

    ``dim`` carries ``keys + track_cols + valid_from/valid_to/
    is_current`` (valid_to NULL on current rows, is_current int 1/0).
    ``updates`` carries ``keys + track_cols``. For each update key:
    unchanged → current row kept; changed → current row closed at
    ``load_ts`` and a new current version inserted; unknown key → new
    current version. History rows pass through untouched.

    Plan shape: history passes through scan-only; current ⟕ updates is
    one join (key-partitioned both sides); new keys come from the same
    join's right-anti slice, so the update batch is read once.
    """
    hist = dim.filter(F.col(is_current) == 0)
    cur = dim.filter(F.col(is_current) == 1).alias("c")
    upd = updates.alias("u")
    on = [F.col(f"c.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    j = cur.join(upd, cond, "full_outer")
    in_cur = F.col(f"c.{keys[0]}").isNotNull()
    in_upd = F.col(f"u.{keys[0]}").isNotNull()
    changed = in_cur & in_upd & _any_differs("c", "u", track_cols)

    keep_cols = [F.col(f"c.{k}").alias(k) for k in keys] + [
        F.col(f"c.{t}").alias(t) for t in track_cols
    ]
    # current rows with no (effective) change: not in updates, or equal
    kept = j.filter(in_cur & ~changed).select(
        *keep_cols,
        F.col(f"c.{valid_from}").alias(valid_from),
        F.col(f"c.{valid_to}").alias(valid_to),
        F.lit(1).alias(is_current),
    )
    closed = j.filter(changed).select(
        *keep_cols,
        F.col(f"c.{valid_from}").alias(valid_from),
        F.lit(load_ts).alias(valid_to),
        F.lit(0).alias(is_current),
    )
    fresh = j.filter(changed | (in_upd & ~in_cur)).select(
        *[F.col(f"u.{k}").alias(k) for k in keys],
        *[F.col(f"u.{t}").alias(t) for t in track_cols],
        F.lit(load_ts).alias(valid_from),
        F.lit(None).cast("string").alias(valid_to),
        F.lit(1).alias(is_current),
    )
    return hist.select(*kept.columns).unionByName(kept).unionByName(closed).unionByName(fresh)
