#!/usr/bin/env python
"""Deterministic larger-SF scaling fixture: replicate an existing sf
directory K times with per-replica key offsets (FK structure preserved)
and a per-replica Caesar shift on document text (replicas share no
tokens/shingles, so dedup/LM candidate volumes scale LINEARLY with K
instead of degenerating into a cross-replica duplicate explosion).
Embedding labels get a per-replica suffix so similarity blocks keep
their size. The bench itself never reads this directory unless pointed
at it explicitly (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_SF2_DIR) — it exists
so 8-vs-32-core scaling can be measured at a size where sf0.1's
driver-bound regime no longer hides plan quality (VERDICT r14 item 8).

Usage: python tools/make_bigsf.py [--src /root/testdata/sf0.1]
                                  [--out /root/testdata_big/sf1]
                                  [--k 10] [--threads 8]
"""

from __future__ import annotations

import argparse
import os
import string


def _shift_expr(col: str, k: int) -> str:
    """Caesar-shift a-z / A-Z by k (deterministic per replica)."""
    if k == 0:
        return col
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    src = lo + up
    dst = lo[k % 26:] + lo[: k % 26] + up[k % 26:] + up[: k % 26]
    return f"translate({col}, '{src}', '{dst}')"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/testdata_big/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    import duckdb

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={args.threads}")

    def rp(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    # key offsets: one round decimal above the true max per key family
    offs = {}
    for fam, (t, c) in {
        "ord": ("orders", "o_orderkey"),
        "cust": ("customer", "c_custkey"),
        "supp": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "ev": ("events", "event_id"),
        "user": ("events", "user_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }.items():
        m = con.execute(f"SELECT MAX({c}) FROM {rp(t)}").fetchone()[0]
        offs[fam] = 10 ** (len(str(int(m))) )

    def emit(t: str, select_k) -> None:
        union = "\nUNION ALL\n".join(select_k(k) for k in range(args.k))
        con.execute(
            f"COPY ({union}) TO '{args.out}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE 200000)"
        )
        print(t, con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0])

    # dimensions copied verbatim
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {rp(t)}) TO '{args.out}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)"
        )

    emit("customer", lambda k: (
        f"SELECT c_custkey + {k * offs['cust']} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM {rp('customer')}"
    ))
    emit("supplier", lambda k: (
        f"SELECT s_suppkey + {k * offs['supp']} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM {rp('supplier')}"
    ))
    emit("part", lambda k: (
        f"SELECT p_partkey + {k * offs['part']} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice FROM {rp('part')}"
    ))
    emit("orders", lambda k: (
        f"SELECT o_orderkey + {k * offs['ord']} AS o_orderkey, "
        f"o_custkey + {k * offs['cust']} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority FROM {rp('orders')}"
    ))
    emit("lineitem", lambda k: (
        f"SELECT l_orderkey + {k * offs['ord']} AS l_orderkey, "
        f"l_partkey + {k * offs['part']} AS l_partkey, "
        f"l_suppkey + {k * offs['supp']} AS l_suppkey, l_linenumber, "
        f"l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate FROM {rp('lineitem')}"
    ))
    emit("events", lambda k: (
        f"SELECT event_id + {k * offs['ev']} AS event_id, ts, "
        f"user_id + {k * offs['user']} AS user_id, event_type, value, "
        f"props FROM {rp('events')}"
    ))
    emit("documents", lambda k: (
        f"SELECT doc_id + {k * offs['doc']} AS doc_id, "
        f"{_shift_expr('text', k)} AS text, lang, source, n_chars "
        f"FROM {rp('documents')}"
    ))
    emit("embeddings", lambda k: (
        f"SELECT vec_id + {k * offs['vec']} AS vec_id, embedding, "
        f"label * {args.k} + {k} AS label FROM {rp('embeddings')}"
    ))


if __name__ == "__main__":
    main()
