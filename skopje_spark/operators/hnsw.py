"""Distributed HNSW approximate-nearest-neighbor — the graph-ANN
family (Malkov & Yashunin, "Efficient and robust approximate nearest
neighbor search using Hierarchical Navigable Small World graphs",
TPAMI 2018), Spark-first.

A single global HNSW graph does not distribute (every insert walks
the whole graph), so this uses the SHARD-AND-MERGE layout production
vector stores deploy: the corpus hash-partitions into ``shards``
independent sub-graphs, each built and searched ENTIRELY inside one
Arrow-batched ``applyInPandas`` task (numpy kernels, no driver
traffic), and per-shard top-k candidates merge with one small shuffle
(k × shards rows per query). Search cost per query is
shards × O(ef · log n_shard) distance evaluations — sub-linear in the
corpus, against the brute-force scan's O(n) — and the build is one
pass over the data with NO global state, so it scales by adding
shards exactly like the IVF family (operators/similarity.py) scales
by adding cells.

DETERMINISM (the property every oracle here leans on): layer
assignment uses a splitmix64 hash of the node id instead of the
paper's RNG, inserts process ids in sorted order, and every beam /
neighbor-selection tie breaks on (−sim, id) — the same corpus always
builds the same graph and returns the same candidates, across runs
and engines.

Index lifecycle mirrors the LSH/IVF/BM25 persisted indexes:
:func:`hnsw_topk` builds-and-searches in one pass;
:func:`hnsw_index_build` persists the per-shard adjacency (+ vectors)
as parquet partitioned by ``shard=``; :func:`hnsw_index_probe`
re-loads only the adjacency rows (no re-insertion — the graph is
reconstructed structurally) and searches. Probing reads every shard
partition but each shard's search stays sub-linear, the same
scan-vs-probe economics as the IVF ``cell=`` layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hnsw_topk",
    "hnsw_index_build",
    "hnsw_index_append",
    "hnsw_index_probe",
]


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public-domain splitmix64 finalizer)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _level_of(node_id: int, m_l: float) -> int:
    """The paper's geometric level draw, derandomized: uniform from a
    hash of the id instead of an RNG."""
    import math

    u = (_splitmix64(int(node_id)) + 1) / 2.0**64
    return int(-math.log(u) * m_l)


class _ShardGraph:
    """One shard's HNSW graph over UNIT-normalized vectors (cosine ==
    dot). Pure numpy + dict adjacency; lives for the duration of one
    applyInPandas task."""

    def __init__(self, M: int = 8, ef_construction: int = 64):
        import math

        self.M = M
        self.M0 = 2 * M
        self.efc = ef_construction
        self.m_l = 1.0 / math.log(M)
        self.ids: list[int] = []
        self.vecs: np.ndarray | None = None  # (n, d) normalized
        self.levels: list[int] = []
        # adj[layer][local_idx] = list[local_idx]
        self.adj: list[dict[int, list[int]]] = []
        self.entry: int | None = None

    # -- construction ---------------------------------------------------
    def build(self, ids, vectors):
        order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
        ids = np.asarray(ids, dtype=np.int64)[order]
        vecs = np.asarray(vectors, dtype=np.float64)[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        self.vecs = vecs / norms[:, None]
        self.ids = [int(i) for i in ids]
        for li in range(len(ids)):
            self._insert(li)
        return self

    def _sims(self, q: np.ndarray, cand: list[int]) -> np.ndarray:
        return self.vecs[cand] @ q

    def _greedy(self, q, start: int, layer: int) -> int:
        """ef=1 descent on one layer: move to the best neighbor until
        no improvement (ties never move — id order is fixed)."""
        cur = start
        cur_sim = float(self.vecs[cur] @ q)
        improved = True
        while improved:
            improved = False
            nbrs = self.adj[layer].get(cur, [])
            if not nbrs:
                break
            sims = self._sims(q, nbrs)
            j = int(np.argmax(sims))
            if sims[j] > cur_sim:
                cur, cur_sim = nbrs[j], float(sims[j])
                improved = True
        return cur

    def _beam(self, q, start: int, layer: int, ef: int) -> list[int]:
        """ef-bounded best-first search on one layer; returns visited
        candidates sorted by (−sim, id)."""
        import heapq

        start_sim = float(self.vecs[start] @ q)
        visited = {start}
        # candidate max-heap by sim (store −sim), result min-heap by sim
        cand = [(-start_sim, start)]
        res = [(start_sim, start)]
        while cand:
            c_negsim, c = heapq.heappop(cand)
            if -c_negsim < res[0][0] and len(res) >= ef:
                break
            for nb in self.adj[layer].get(c, []):
                if nb in visited:
                    continue
                visited.add(nb)
                s = float(self.vecs[nb] @ q)
                if len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(res, (s, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
        return [i for _, i in sorted(res, key=lambda t: (-t[0], self.ids[t[1]]))]

    def _select(self, q, cands: list[int], m: int) -> list[int]:
        """Closest-m neighbor selection with (−sim, id) tie-break."""
        if len(cands) <= m:
            return list(cands)
        sims = self._sims(q, cands)
        order = sorted(
            range(len(cands)), key=lambda j: (-sims[j], self.ids[cands[j]])
        )
        return [cands[j] for j in order[:m]]

    def _insert(self, li: int):
        lvl = _level_of(self.ids[li], self.m_l)
        self.levels.append(lvl)
        old_top = len(self.adj) - 1  # before any layer extension
        while len(self.adj) <= lvl:
            self.adj.append({})
        for layer in range(lvl + 1):
            self.adj[layer].setdefault(li, [])
        if self.entry is None:
            self.entry = li
            return
        q = self.vecs[li]
        cur = self.entry
        # greedy descent through layers ABOVE the new node's level
        for layer in range(old_top, lvl, -1):
            cur = self._greedy(q, cur, layer)
        # link on every layer the node occupies AND the entry reaches
        for layer in range(min(lvl, old_top), -1, -1):
            cands = self._beam(q, cur, layer, self.efc)
            mmax = self.M0 if layer == 0 else self.M
            nbrs = self._select(q, cands, self.M)
            self.adj[layer][li] = list(nbrs)
            for nb in nbrs:
                lst = self.adj[layer].setdefault(nb, [])
                if li not in lst:
                    lst.append(li)
                    if len(lst) > mmax:
                        self.adj[layer][nb] = self._select(
                            self.vecs[nb], lst, mmax
                        )
            cur = cands[0]
        if lvl > self.levels[self.entry]:
            self.entry = li

    # -- search -----------------------------------------------------------
    def search(self, q: np.ndarray, k: int, ef: int):
        """[(sim, node_id)] for one unit query vector."""
        if self.entry is None or self.vecs is None or not len(self.ids):
            return []
        cur = self.entry
        for layer in range(len(self.adj) - 1, 0, -1):
            cur = self._greedy(q, cur, layer)
        found = self._beam(q, cur, 0, max(ef, k))
        sims = self._sims(q, found)
        order = sorted(
            range(len(found)), key=lambda j: (-sims[j], self.ids[found[j]])
        )
        return [
            (float(sims[j]), self.ids[found[j]]) for j in order[:k]
        ]

    # -- (de)serialization --------------------------------------------------
    def rows(self):
        """(vec_id, layer, neighbor_ids) rows for the persisted index."""
        out = []
        for layer, adj in enumerate(self.adj):
            for li, nbrs in adj.items():
                out.append((
                    self.ids[li], layer,
                    [self.ids[n] for n in nbrs],
                ))
        return out

    @classmethod
    def from_rows(cls, ids, vectors, adj_rows, M=8):
        """Structural reload: rebuild the layered adjacency from
        persisted rows — no re-insertion, bit-identical search."""
        g = cls(M=M)
        order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
        ids = np.asarray(ids, dtype=np.int64)[order]
        vecs = np.asarray(vectors, dtype=np.float64)[order]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        g.vecs = vecs / norms[:, None]
        g.ids = [int(i) for i in ids]
        pos = {i: li for li, i in enumerate(g.ids)}
        g.levels = [0] * len(g.ids)
        for vid, layer, nbrs in adj_rows:
            while len(g.adj) <= layer:
                g.adj.append({})
            li = pos[int(vid)]
            g.adj[layer][li] = [pos[int(n)] for n in nbrs]
            g.levels[li] = max(g.levels[li], int(layer))
        if g.ids:
            top = len(g.adj) - 1
            # the entry point is the lowest-id node on the top layer —
            # the same tie-break the builder's insert order produces
            ents = sorted(g.ids[li] for li in g.adj[top])
            g.entry = pos[ents[0]] if ents else None
        return g


def _shard_col(id_col: str, shards: int):
    return (F.xxhash64(F.col(id_col)) % shards + shards) % shards


def _collect_queries(query_df: DataFrame, id_col: str, vec_col: str):
    """Driver-side collect of the QUERY SET only — bounded by the
    caller's query count (the corpus never moves)."""
    rows = query_df.select(id_col, vec_col).collect()
    qids = [int(r[0]) for r in rows]
    qv = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(qv, axis=1)
    norms[norms == 0] = 1.0
    return qids, qv / norms[:, None]


def _merge_topk(per_shard: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        per_shard.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hnsw_topk(
    embeddings: DataFrame,
    query_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    shards: int = 8,
    M: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
) -> DataFrame:
    """Build-and-search in one pass: hash-shard the corpus, build one
    HNSW graph per shard inside ``applyInPandas``, beam-search every
    query in every shard, merge per-shard top-k to the global top-k.
    Returns (q_id, vec_id, cos_sim) with cos_sim rounded at 6 dp.

    Scale: per-query distance evaluations ≈ shards × ef — independent
    of corpus size within a shard's log factor; the only shuffle is
    k × shards candidate rows per query."""
    from skopje_spark.queries.rounding import dround

    spark = embeddings.sparkSession
    qids, qvecs = _collect_queries(query_df, id_col, vec_col)
    bq = spark.sparkContext.broadcast((qids, qvecs))
    sharded = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _shard_col(id_col, shards).alias("shard"),
    )

    def run(pdf):
        import pandas as pd

        g = _ShardGraph(M=M, ef_construction=ef_construction).build(
            pdf["vec_id"].to_numpy(),
            np.asarray([list(v) for v in pdf["vec"]], dtype=np.float64),
        )
        lqids, lq = bq.value
        out = []
        for qi, qv in zip(lqids, lq):
            for sim, vid in g.search(qv, k, ef_search):
                out.append((qi, vid, sim))
        return pd.DataFrame(out, columns=["q_id", "vec_id", "cos_sim"])

    per_shard = sharded.groupBy("shard").applyInPandas(
        run, schema="q_id long, vec_id long, cos_sim double"
    )
    merged = _merge_topk(per_shard, k)
    return merged.select(
        "q_id", "vec_id", dround(F.col("cos_sim"), 6).alias("cos_sim")
    ).orderBy("q_id", F.desc("cos_sim"), "vec_id")


def hnsw_index_build(
    embeddings: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shards: int = 8,
    M: int = 8,
    ef_construction: int = 64,
) -> int:
    """Persist the per-shard HNSW graphs as a parquet index
    partitioned by ``shard=`` (one directory per sub-graph, the IVF
    ``cell=`` layout): rows are (vec_id, layer, neighbors, vec —
    vector carried on the layer-0 row only, by-reference everywhere
    else). Returns the number of shards written."""
    sharded = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _shard_col(id_col, shards).alias("shard"),
    )

    def run(pdf):
        import pandas as pd

        vecs = {
            int(i): list(map(float, v))
            for i, v in zip(pdf["vec_id"], pdf["vec"])
        }
        g = _ShardGraph(M=M, ef_construction=ef_construction).build(
            pdf["vec_id"].to_numpy(),
            np.asarray([list(v) for v in pdf["vec"]], dtype=np.float64),
        )
        shard = int(pdf["shard"].iloc[0])
        rows = [
            (shard, vid, layer, nbrs,
             vecs[vid] if layer == 0 else None)
            for vid, layer, nbrs in g.rows()
        ]
        return pd.DataFrame(
            rows, columns=["shard", "vec_id", "layer", "neighbors", "vec"]
        )

    out = sharded.groupBy("shard").applyInPandas(
        run,
        schema="shard int, vec_id long, layer int, "
               "neighbors array<long>, vec array<double>",
    )
    out.write.mode("errorifexists").partitionBy("shard").parquet(path)
    # the hash MODULUS must be recorded, not inferred: max(shard)+1
    # undercounts whenever the top shards got no rows, and appends
    # hashed with a different modulus would silently double-index ids
    # (underscore prefix: invisible to Spark's parquet reader)
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_hnsw_meta.json"), "w") as f:
        _json.dump(
            {"shards": shards, "M": M,
             "ef_construction": ef_construction},
            f,
        )
    return shards


def hnsw_index_append(
    embeddings: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    M: int = 8,
    ef_construction: int = 64,
) -> int:
    """Append new vectors to a persisted index WITHOUT a full
    rebuild: each touched shard's graph reloads structurally, the new
    nodes run the real HNSW insert (levels from the same hashed draw,
    links re-pruned), and ONLY those shards rewrite (dynamic
    partition overwrite — untouched shards' files never move). Cost ∝
    touched shards, the same economics as ``ivf_index_append``.

    Note the honest asymmetry: unlike the LSH index, HNSW append is
    NOT guaranteed graph-identical to a fresh build over the union
    (insert order shapes the links); search quality is equivalent,
    and the determinism contract still holds — the same index + the
    same appends always produce the same graph. Duplicate ids refuse
    loudly."""
    import json as _json
    import os as _os

    spark = embeddings.sparkSession
    idx = spark.read.parquet(path)
    meta_file = _os.path.join(path, "_hnsw_meta.json")
    with open(meta_file) as f:
        shards = int(_json.load(f)["shards"])
    new = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _shard_col(id_col, shards).alias("shard"),
    )

    def run(key, left, right):
        import pandas as pd

        cols = ["shard", "vec_id", "layer", "neighbors", "vec"]
        if not len(right):
            return pd.DataFrame(columns=cols)  # shard untouched
        shard = int(key[0])
        base = left[left["layer"] == 0]
        vecs = {
            int(i): list(map(float, v))
            for i, v in zip(base["vec_id"], base["vec"])
        }
        g = _ShardGraph.from_rows(
            base["vec_id"].to_numpy(),
            np.asarray([list(v) for v in base["vec"]], dtype=np.float64),
            list(zip(left["vec_id"], left["layer"], left["neighbors"])),
            M=M,
        ) if len(base) else _ShardGraph(M=M, ef_construction=ef_construction)
        g.efc = ef_construction
        have = set(g.ids)
        order = right.sort_values("vec_id")
        for vid, v in zip(order["vec_id"], order["vec"]):
            vid = int(vid)
            if vid in have:
                raise ValueError(
                    f"hnsw_index_append: id {vid} already indexed in "
                    f"shard {shard} — appends must be novel ids"
                )
            arr = np.asarray(list(v), dtype=np.float64)
            n = np.linalg.norm(arr)
            unit = arr / (n if n else 1.0)
            g.vecs = (
                unit[None, :] if g.vecs is None
                else np.vstack([g.vecs, unit[None, :]])
            )
            g.ids.append(vid)
            vecs[vid] = list(map(float, arr))
            g._insert(len(g.ids) - 1)
        rows = [
            (shard, vid, layer, nbrs, vecs[vid] if layer == 0 else None)
            for vid, layer, nbrs in g.rows()
        ]
        return pd.DataFrame(rows, columns=cols)

    out = (
        idx.groupBy("shard")
        .cogroup(new.groupBy("shard"))
        .applyInPandas(
            run,
            schema="shard int, vec_id long, layer int, "
                   "neighbors array<long>, vec array<double>",
        )
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(path)
    )
    return shards


def hnsw_index_probe(
    spark,
    path: str,
    query_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    ef_search: int = 64,
    M: int = 8,
) -> DataFrame:
    """Search a persisted index WITHOUT rebuilding: each shard's
    adjacency rows reload structurally (no re-insertion — search is
    bit-identical to the build-time graph), queries beam through
    every shard, per-shard candidates merge to the global top-k."""
    from skopje_spark.queries.rounding import dround

    qids, qvecs = _collect_queries(query_df, id_col, vec_col)
    bq = spark.sparkContext.broadcast((qids, qvecs))
    idx = spark.read.parquet(path)

    def run(pdf):
        import pandas as pd

        base = pdf[pdf["layer"] == 0]
        g = _ShardGraph.from_rows(
            base["vec_id"].to_numpy(),
            np.asarray([list(v) for v in base["vec"]], dtype=np.float64),
            list(zip(pdf["vec_id"], pdf["layer"], pdf["neighbors"])),
            M=M,
        )
        lqids, lq = bq.value
        out = []
        for qi, qv in zip(lqids, lq):
            for sim, vid in g.search(qv, k, ef_search):
                out.append((qi, vid, sim))
        return pd.DataFrame(out, columns=["q_id", "vec_id", "cos_sim"])

    per_shard = idx.groupBy("shard").applyInPandas(
        run, schema="q_id long, vec_id long, cos_sim double"
    )
    merged = _merge_topk(per_shard, k)
    return merged.select(
        "q_id", "vec_id", dround(F.col("cos_sim"), 6).alias("cos_sim")
    ).orderBy("q_id", F.desc("cos_sim"), "vec_id")
