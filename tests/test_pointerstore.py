"""Second pointer-store backend (sinks/versioned.py:LogPointerStore):
conditional-put commit semantics, listing-free pointer resolution,
and the full commit protocol running unchanged on top of it — the
proof that the three-primitive interface is sufficient for object
stores without atomic rename."""

from __future__ import annotations

import os
import threading

import pytest

import skopje_spark.sinks.versioned as V
from skopje_spark.sinks.versioned import (
    CommitConflict,
    LogPointerStore,
    latest_version,
    vacuum,
    versioned_merge_concurrent,
    versioned_read,
    versioned_upsert,
    versioned_write,
)


@pytest.fixture()
def logstore(monkeypatch):
    store = LogPointerStore()
    monkeypatch.setattr(V, "POINTER_STORE", store)
    return store


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_conditional_put_refuses_second_writer(tmp_path, logstore):
    path = str(tmp_path / "t")
    os.makedirs(path)
    assert logstore.read_pointer(path) is None
    logstore.swap_pointer(path, 0)
    assert logstore.read_pointer(path) == 0
    # the store itself arbitrates the race: same version twice = loud
    with pytest.raises(CommitConflict, match="conditional put"):
        logstore.swap_pointer(path, 0)
    logstore.swap_pointer(path, 1)
    assert logstore.read_pointer(path) == 1


def test_pointer_resolution_survives_lost_or_corrupt_hint(tmp_path, logstore):
    """The hint is an optimization, never an authority: deleting it,
    staleness, and corruption all resolve to the true latest by
    existence probes."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    for v in range(4):
        logstore.swap_pointer(path, v)
    hint = os.path.join(path, "_commits", "_HINT")
    os.unlink(hint)
    assert logstore.read_pointer(path) == 3  # probes forward from -1
    with open(hint, "w") as f:
        f.write("1")  # stale: probes forward
    assert logstore.read_pointer(path) == 3
    with open(hint, "w") as f:
        f.write("99")  # corrupt overshoot: walks back, then forward
    assert logstore.read_pointer(path) == 3
    with open(hint, "w") as f:
        f.write("junk")
    assert logstore.read_pointer(path) == 3


def test_protocol_end_to_end_on_log_backend(spark, tmp_path, logstore):
    """write / time travel / partial-rewrite upsert / vacuum — the
    whole snapshot protocol, unchanged, on conditional-put commits."""
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a"), (2, "b")]), path)
    versioned_upsert(spark, path, _df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert latest_version(path) == 1
    assert {r["v"] for r in versioned_read(spark, path).collect()} == {
        "a", "B", "c",
    }
    assert {r["v"] for r in versioned_read(spark, path, version=0).collect()} == {
        "a", "b",
    }
    versioned_write(_df(spark, [(9, "z")]), path)
    vacuum(path, keep=1, min_file_age_s=0)
    assert {r["v"] for r in versioned_read(spark, path).collect()} == {"z"}
    with pytest.raises(FileNotFoundError):
        versioned_read(spark, path, version=0)


def test_guarded_cas_still_loses_loudly_on_log_backend(spark, tmp_path, logstore):
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(1, "a")]), path, expected_version=None)
    versioned_write(_df(spark, [(1, "b")]), path, expected_version=0)
    with pytest.raises(CommitConflict, match="expected 0"):
        versioned_write(_df(spark, [(1, "c")]), path, expected_version=0)
    assert versioned_read(spark, path).collect()[0]["v"] == "b"


def test_racing_writers_all_land_on_log_backend(spark, tmp_path, logstore):
    """The OCC stress shape on the new backend: 6 disjoint-key
    writers, every update lands, versions serialize consecutively,
    and the commit log is gap-free."""
    path = str(tmp_path / "t")
    versioned_write(_df(spark, [(999, "base")]), path)
    errors: list[Exception] = []

    def worker(i: int) -> None:
        try:
            versioned_merge_concurrent(
                spark, path, _df(spark, [(i, f"w{i}")]), ["k"],
                max_retries=16, backoff_s=0.05,
            )
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert latest_version(path) == 6
    rows = {r["k"]: r["v"] for r in versioned_read(spark, path).collect()}
    assert rows[999] == "base" and all(rows[i] == f"w{i}" for i in range(6))
    # gap-free conditional-put log: objects 0..6 all present
    logd = os.path.join(path, "_commits")
    assert all(os.path.exists(os.path.join(logd, str(v))) for v in range(7))


def test_metadata_commits_and_partitions_on_log_backend(spark, tmp_path, logstore):
    """The guarded metadata ops and partition layout ride the backend
    abstraction unchanged."""
    import datetime as dt

    from skopje_spark.sinks.versioned import (
        set_check_constraint,
        table_constraints,
        versioned_partitions,
        versioned_restore,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", dt.date(2024, 1, 1 + i % 2)) for i in range(8)],
        "id long, src string, day date",
    )
    versioned_write(df, path, partition_by=["src"])
    assert len(versioned_partitions(path)) == 2
    set_check_constraint(spark, path, "id_pos", "id >= 0")
    assert table_constraints(path) == {"id_pos": "id >= 0"}
    versioned_restore(path, 0, spark=spark)
    assert latest_version(path) == 2
    assert versioned_read(spark, path).count() == 8
