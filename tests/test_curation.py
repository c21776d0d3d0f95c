"""Unit tests: deterministic sampling/split/quota operators and PII
redaction — the property guarantees the query oracles can't express
(nestedness, stability, idempotence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from skopje_spark.operators.sampling import (
    cap_per_group,
    mixture_sample,
    split_assign,
)
from skopje_spark.operators.text import redact_pii


def _docs(spark, n=2000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 7).cast("string")).alias("source"),
    )


def test_split_assign_partitions_everything(spark):
    d = _docs(spark)
    out = split_assign(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # roughly proportional (hash is uniform-ish)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # re-dividing the tail never touches earlier splits: change the
    # val/test boundary and check the train set is identical
    out2 = split_assign(d, "doc_id", {"train": 0.8, "val": 0.15, "test": 0.05})
    t1 = out.filter(F.col("split") == "train").select("doc_id")
    t2 = out2.filter(F.col("split") == "train").select("doc_id")
    assert t1.exceptAll(t2).count() == 0 and t2.exceptAll(t1).count() == 0
    # deterministic under re-partitioning
    out3 = split_assign(d.repartition(13), "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.select("doc_id", "split").exceptAll(
        out3.select("doc_id", "split")).count() == 0


def test_mixture_sample_nested_and_deterministic(spark):
    d = _docs(spark)
    lo = mixture_sample(d, "source", {"src0": 0.2}, "doc_id", default_rate=0.1)
    hi = mixture_sample(d, "source", {"src0": 0.6}, "doc_id", default_rate=0.3)
    # raising every rate strictly grows the sample (nested property)
    assert lo.exceptAll(hi).count() == 0
    assert lo.count() < hi.count()
    # re-running with a different partitioning gives the identical set
    lo2 = mixture_sample(
        d.repartition(13), "source", {"src0": 0.2}, "doc_id", default_rate=0.1
    )
    assert lo.exceptAll(lo2).count() == 0 and lo2.exceptAll(lo).count() == 0
    # rate 0 removes a group entirely
    none = mixture_sample(d, "source", {"src0": 0.0}, "doc_id", default_rate=0.0)
    assert none.count() == 0


def test_cap_per_group_exact_and_stable(spark):
    d = _docs(spark)
    capped = cap_per_group(d, ["source"], "doc_id", 11)
    per = capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r["n"] == 11 for r in per)  # every group has ≥11 docs here
    # deterministic under re-partitioning
    capped2 = cap_per_group(d.repartition(17), ["source"], "doc_id", 11)
    assert capped.exceptAll(capped2).count() == 0
    # capping the capped output is a no-op (idempotent)
    again = cap_per_group(capped, ["source"], "doc_id", 11)
    assert again.count() == capped.count()


def test_redact_pii_spans(spark):
    rows = [
        ("reach me at jo.na+x@sub.example.co.uk today",
         "reach me at <EMAIL> today"),
        ("call +1-800-555-1234 or 44-207-946-0958 now",
         "call <PHONE> or <PHONE> now"),
        ("host 192.168.0.1 and 10.0.0.255 up",
         "host <IP> and <IP> up"),
        ("user@10.0.0.1 is one email",  # numeric host: IP rule applies
         "user@<IP> is one email"),
        ("no pii here 1234", "no pii here 1234"),
        ("version 1.2.3 stays", "version 1.2.3 stays"),  # 3-part ≠ IPv4
    ]
    df = spark.createDataFrame(rows, ["text", "expect"])
    out = df.select("expect", redact_pii(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expect"], (r["got"], r["expect"])


def test_budget_sample_exact_takewhile(spark):
    """Each group's taken weight is maximal without overflowing the
    budget under the fixed hash order, and the result is reproducible."""
    from skopje_spark.operators.sampling import budget_sample, hash_bucket

    rows = [(i, "a" if i % 2 else "b", 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string, w long")
    budgets = {"a": 150, "b": 80}
    got = budget_sample(df, "grp", "w", "id", budgets).collect()
    again = budget_sample(df, "grp", "w", "id", budgets).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    # python reference: take-while in (hash, id) order per group
    KNUTH, MOD = 2654435761, 4294967296
    want = []
    by_grp = {}
    for i, g, w in rows:
        by_grp.setdefault(g, []).append((((i * KNUTH) % MOD), i, w))
    for g, items in by_grp.items():
        items.sort()
        cum = 0
        for _, i, w in items:
            if cum + w <= budgets[g]:
                want.append((i, g, w))
                cum += w
            # NOT break: smaller later rows may still fit? No — take-while
            # semantics stop at first overflow; mirror the operator:
            else:
                break
    assert sorted(t[0] for t in got) == sorted(t[0] for t in want)
    for g in budgets:
        tot = sum(w for i, gg, w in want if gg == g)
        assert tot <= budgets[g]
