"""Fast numeric array literals.

Building an array literal element-by-element (``F.array(*[F.lit(v) ...])``)
costs one py4j round-trip per element — ~0.8 s of pure driver latency
for an 8×64 centroid table, paid on every plan construction. These
helpers render the whole array as ONE SQL expression string and parse
it in a single call. ``repr(float)`` is the shortest decimal that
round-trips in IEEE-754, and Java's ``parseDouble`` maps it back to
the identical bits, so the resulting Literal tree is bit-equal to the
element-wise one. Non-finite values (no SQL literal spelling) fall
back to the element-wise path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def _finite(vals: list[float]) -> bool:
    return all(v == v and v != _INF and v != -_INF for v in vals)


def double_array_lit(vals) -> Column:
    """array<double> literal in one parsed expression."""
    vs = [float(v) for v in vals]
    if _finite(vs):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in vs) + ")")
    return F.array(*[F.lit(v) for v in vs])


def double_matrix_lit(rows) -> Column:
    """array<array<double>> literal in one parsed expression."""
    rs = [[float(v) for v in r] for r in rows]
    if all(_finite(r) for r in rs):
        return F.expr(
            "array("
            + ",".join(
                "array(" + ",".join(f"{v!r}D" for v in r) + ")" for r in rs
            )
            + ")"
        )
    return F.array(*[F.array(*[F.lit(v) for v in r]) for r in rs])
