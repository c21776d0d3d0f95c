"""Bloom-filter membership pre-filtering for dedup-against-a-corpus.

The training-data shape: drop from a huge ``train`` table every row
whose key already exists in a ``seen`` corpus (previous crawl, another
shard, a benchmark set). A plain ``left_anti`` join shuffles the full
train side on the key. A Bloom filter of the seen keys turns that into:

1. build a fixed-size bitmap of the seen keys — one narrow scan, one
   small bitmap per partition, OR-merged in two levels (executor-side
   group OR, then the driver ORs only the group results; bitmap size
   is a constant independent of data volume);
2. broadcast the bitmap; rows whose key is *definitely absent*
   (any probe bit unset) pass through with **zero** join work — at a
   1% false-positive rate that is ~99% of the novel rows;
3. only the "maybe present" sliver (true dupes + fpp of the novel
   rows) goes through the exact anti-join for confirmation.

The result is EXACTLY equal to the plain anti-join — the filter is an
accelerator, not an approximation — so the operator is fully
oracle-checkable (``q_dedup_bloom_anti``).

Determinism: probe positions come from sha256 slices (cross-engine
reproducible, like every hash in :mod:`skopje_spark.operators.dedup`);
swap for xxhash64 when only Spark must agree. Positions are computed
JVM-side in whole-stage codegen; only the vectorized bitmap probe runs
in a pandas UDF over the broadcast bitmap.

Reference parity: the reference dedupes by primary-key conflict inside
Postgres (`ON CONFLICT DO NOTHING`, /root/reference/src/load/pg.rs:76);
at lake scale the membership sketch replaces the unique index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_K = 5


def _bit_positions(col: Column, *, num_bits: int, k: int) -> list[Column]:
    """k deterministic probe positions per value: independent sha256
    slices (salted per probe) mod num_bits, all JVM-side codegen."""
    out = []
    for i in range(k):
        h = F.sha2(F.concat(col.cast("string"), F.lit(f"#bloom{i}")), 256)
        # 15 hex chars = 60 bits, safely inside bigint
        out.append(
            F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
                   F.lit(num_bits))
        )
    return out


def fold_positions(bm, ps) -> None:
    """OR one row's probe-position list into ``bm`` (uint8 bitmap
    array), in place. THE single definition of the positions→bitmap
    bit layout — the manifest builder (sources/skipping.py) and the
    partition partials below both call it, so layout or NULL-handling
    changes cannot diverge between the build side and the probe side.

    NULL-safe: a NULL key hashes to NULL positions (sha2 of NULL);
    such a row contributes nothing — correct, because NULL never
    equals any point-lookup value, so dropping it cannot cause a
    false negative."""
    import numpy as np

    if ps is None:
        return
    clean = [p for p in ps if p is not None and p == p]  # drops None/NaN
    if not clean:
        return
    a = np.asarray(clean, dtype=np.int64)
    np.bitwise_or.at(bm, a >> 3, (1 << (a & 7)).astype(np.uint8))


def bit_positions_py(value, *, num_bits: int, k: int) -> list[int]:
    """Driver-side Python twin of :func:`_bit_positions` — same sha256
    recipe, so a value probed here hits exactly the bits the Spark
    expression set (unit-pinned agreement). Lets metadata consumers
    (e.g. sources/skipping.py's point-lookup pruning) probe per-file
    bitmaps without launching a job."""
    import hashlib

    out = []
    for i in range(k):
        h = hashlib.sha256(
            (str(value) + f"#bloom{i}").encode("utf-8")
        ).hexdigest()
        out.append(int(h[:15], 16) % num_bits)
    return out


def build_bloom(
    seen: DataFrame,
    key: str | Column,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
    tree_groups: int | None = 32,
):
    """Bitmap of the seen keys as a numpy uint8 array (num_bits/8
    bytes). One narrow pass: each partition folds its keys into a
    local bitmap (``mapInPandas``), then the per-partition bitmaps are
    OR-combined in TWO levels: partitions hash into ``tree_groups``
    groups whose members OR executor-side (one small shuffle of
    bitmap rows), and the driver ORs only the group results — driver
    memory is O(tree_groups × bitmap), NOT O(partitions × bitmap)
    (at 10k partitions × 128 KiB the single-level OR would hold
    ~1.2 GB on the driver; two-level holds 4 MiB).
    ``tree_groups=None`` selects the legacy single-level driver OR
    (kept for the bit-identity unit test).

    Size num_bits for the target false-positive rate:
    fpp ≈ (1 - e^(-k·n/m))^k — e.g. m=2^20, k=5 holds ~1e5 keys at
    fpp < 1%."""
    import numpy as np

    nbytes = (num_bits + 7) // 8  # round up: probes reach bit num_bits-1
    partials = _bloom_partials(
        seen, key, num_bits=num_bits, k=k, tree_groups=tree_groups
    )
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in partials.collect():
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out


def _bloom_partials(
    seen: DataFrame,
    key: str | Column,
    *,
    num_bits: int,
    k: int,
    tree_groups: int | None,
) -> DataFrame:
    """The pre-collect bitmap frame: one row per non-empty partition
    (``tree_groups=None``) or one row per partition GROUP after the
    executor-side OR level — whatever reaches ``collect()`` in
    :func:`build_bloom`. Split out so the driver-row bound is a
    testable surface."""
    import numpy as np
    import pandas as pd

    keyc = F.col(key) if isinstance(key, str) else key
    nbytes = (num_bits + 7) // 8
    prj = seen.select(
        F.array(*_bit_positions(keyc, num_bits=num_bits, k=k)).alias("__pos"),
        F.spark_partition_id().alias("__pid"),
    )

    n_groups = int(tree_groups) if tree_groups else 0

    def to_bitmap(batches):
        bm = np.zeros(nbytes, dtype=np.uint8)
        gid, seen_rows = 0, False
        for pdf in batches:
            if len(pdf) and not seen_rows:
                gid = int(pdf["__pid"].iloc[0]) % n_groups if n_groups else 0
                seen_rows = True
            for ps in pdf["__pos"]:
                fold_positions(bm, ps)
        if seen_rows:  # empty partitions contribute nothing to the OR
            yield pd.DataFrame({"gid": [gid], "bm": [bm.tobytes()]})

    partials = prj.mapInPandas(to_bitmap, "gid int, bm binary")
    if not n_groups:
        return partials.select("bm")

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for buf in pdf["bm"]:
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pd.DataFrame({"bm": [acc.tobytes()]})

    return partials.groupBy("gid").applyInPandas(or_group, "bm binary")


def might_contain(
    df: DataFrame,
    bitmap,
    key: str | Column,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
    out_col: str = "might_contain",
) -> DataFrame:
    """Adds a boolean ``out_col``: False = key definitely not in the
    seen corpus (no false negatives); True = present or a false
    positive. Probe positions are JVM-computed; the pandas UDF only
    indexes the broadcast bitmap (vectorized per row)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    keyc = F.col(key) if isinstance(key, str) else key
    if len(bitmap) != (num_bits + 7) // 8:
        # both directions matter: a SMALLER probe range over a larger
        # bitmap passes an index-bounds check yet maps keys to different
        # bit positions than the build did — silent false negatives that
        # break the no-false-negative contract of bloom_anti_join
        raise ValueError(
            f"bitmap has {len(bitmap)} bytes; num_bits={num_bits} needs "
            f"{(num_bits + 7) // 8} — build and probe must agree on num_bits"
        )
    b = df.sparkSession.sparkContext.broadcast(bitmap.tobytes())

    def probe(pos_series):
        import pandas as pd

        bm = np.frombuffer(b.value, dtype=np.uint8)

        def one(ps):
            a = np.asarray(ps, dtype=np.int64)
            return bool(np.all((bm[a >> 3] >> (a & 7)) & 1))

        return pd.Series([one(ps) for ps in pos_series])

    mc = pandas_udf(probe, "boolean")
    return df.withColumn(
        out_col, mc(F.array(*_bit_positions(keyc, num_bits=num_bits, k=k)))
    )


def bloom_anti_join(
    train: DataFrame,
    seen: DataFrame,
    *,
    train_key: str = "key",
    seen_key: str | None = None,
    num_bits: int = DEFAULT_NUM_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``train`` whose key does NOT appear in ``seen`` —
    bit-identical to ``train.join(seen, key, "left_anti")``, but only
    the bloom-positive sliver reaches the join. Definite negatives
    (the overwhelming majority of novel rows) never shuffle."""
    seen_key = seen_key or train_key
    bm = build_bloom(seen, seen_key, num_bits=num_bits, k=k)
    flagged = might_contain(
        train, bm, train_key, num_bits=num_bits, k=k, out_col="__maybe"
    )
    definite = flagged.filter(~F.col("__maybe"))
    confirm = flagged.filter(F.col("__maybe")).join(
        seen.select(F.col(seen_key).alias(train_key)).distinct(),
        on=train_key,
        how="left_anti",
    )
    return definite.unionByName(confirm).drop("__maybe")
