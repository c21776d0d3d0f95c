"""WebDataset-style tar shard export/import — the delivery format
training loaders actually consume.

A curated corpus leaves the lake as SHARDS: tar archives whose members
are ``{key}.{ext}`` files, one group of extensions per sample
(``000042.txt`` + ``000042.json`` + ``000042.bin`` …), read
sequentially by data-loader workers (webdataset/tarp convention). The
value of tar over parquet at the trainer boundary is sequential-read
friendliness and zero-copy handoff to loaders that know nothing of
columnar formats.

Spark-side shape: shard assignment is a deterministic range partition
on the sample key (same inputs → same shards, byte for byte:
members are written in sorted key order with fixed metadata, so shard
tars are reproducible artifacts you can checksum); each partition
writes its own ``shard-NNNNN.tar`` via ``foreachPartition`` — the
write is embarrassingly parallel and never moves bytes through the
driver. The import path reads tars through Spark's ``binaryFile``
source and untars inside Arrow batches.

Sandbox note: shards write to a filesystem path the executors can
reach (local mode here, NFS/fuse mounts on a cluster); an object-store
deployment would upload from the executor instead — the tar-building
kernel is the same.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_tar_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str,
    members: dict[str, str],
    n_shards: int = 8,
) -> int:
    """Write ``df`` as ``n_shards`` reproducible tar shards.

    ``members`` maps column → member extension: ``{"text": "txt",
    "meta": "json"}`` writes ``{key}.txt`` and ``{key}.json`` per row.
    String columns encode UTF-8; binary columns pass through. Keys are
    zero-padded sample ids; members are emitted in (key, ext-sorted)
    order with zeroed timestamps/owners, so a shard's bytes are a pure
    function of its rows. Returns the shard count."""
    os.makedirs(path, exist_ok=True)
    cols = [id_col] + list(members)
    exts = dict(members)
    prepared = (
        df.select(*cols)
        .repartitionByRange(n_shards, F.col(id_col))
        .sortWithinPartitions(id_col)
    )

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for r in rows:
                key = f"{int(r[id_col]):012d}"
                for col in sorted(exts):
                    v = r[col]
                    if v is None:
                        continue
                    data = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    info = tarfile.TarInfo(name=f"{key}.{exts[col]}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        out = os.path.join(path, f"shard-{pid:05d}.tar")
        tmp = out + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, out)

    prepared.rdd.foreachPartition(write_partition)
    return n_shards


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read shards back as ``(key string, ext string, data binary)``
    rows — tars scanned via ``binaryFile`` (splittable across shards,
    one task per shard), members untarred inside Arrow batches. The
    loader-side inverse of :func:`write_tar_shards`; grouping by key
    reassembles samples."""
    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "shard-*.tar")
    ).select("content")

    def untar(batches):
        import pandas as pd

        for pdf in batches:
            keys, exts, datas = [], [], []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, _, ext = m.name.partition(".")
                        keys.append(stem)
                        exts.append(ext)
                        datas.append(tar.extractfile(m).read())
            if keys:
                yield pd.DataFrame({"key": keys, "ext": exts, "data": datas})

    return bins.mapInPandas(untar, "key string, ext string, data binary")
