"""Unit tests: the write-side expectations ladder (sinks/expect.py) —
DLT-grade warn/drop/quarantine/fail over the versioned store, with
per-expectation metrics riding commit metadata."""

from __future__ import annotations

import json

import pytest

from skopje_spark.sinks.expect import (
    ExpectationViolation,
    expectation_metrics,
    expectations_write,
)
from skopje_spark.sinks.versioned import (
    latest_version,
    set_check_constraint,
    snapshot_meta,
    versioned_read,
)

EXPECT = {
    "k_positive": "k > 0",
    "v_known": "v IS NOT NULL AND v <> ''",
}


def _df(spark):
    # k=-1 violates k_positive; v NULL and '' violate v_known;
    # (-2, NULL) violates BOTH — overlap pins the any-violation count
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (-1, "c"), (3, None), (4, ""), (-2, None)],
        ["k", "v"],
    )


def test_metrics_counts_null_as_violation(spark):
    m = expectation_metrics(_df(spark), EXPECT)
    assert m == {
        "rows_in": 6,
        "violations": {"k_positive": 2, "v_known": 3},
    }


def test_drop_admits_only_passing_rows_and_records_metrics(spark, tmp_path):
    path = str(tmp_path / "e1")
    res = expectations_write(
        _df(spark), path, EXPECT, on_violation="drop"
    )
    assert res["rows_in"] == 6
    assert res["rows_written"] == 2  # overlap: 4 distinct violators
    assert res["rows_quarantined"] == 0
    assert res["quarantine_version"] is None
    got = {(r["k"], r["v"]) for r in versioned_read(spark, path).collect()}
    assert got == {(1, "a"), (2, "b")}
    rec = json.loads(snapshot_meta(path, "expectations", version=res["version"]))
    assert rec["k_positive"] == {"condition": "k > 0", "violations": 2}
    assert rec["v_known"]["violations"] == 3
    assert snapshot_meta(path, "expectations_mode", version=res["version"]) == "drop"
    assert snapshot_meta(path, "rows_written", version=res["version"]) == "2"


def test_quarantine_routes_violators_with_named_failures(spark, tmp_path):
    path = str(tmp_path / "e2")
    res = expectations_write(_df(spark), path, EXPECT)
    assert res["rows_written"] == 2 and res["rows_quarantined"] == 4
    qpath = path + "_quarantine"
    q = versioned_read(spark, qpath)
    rows = {r["k"]: sorted(r["_violations"]) for r in q.collect()}
    assert rows == {
        -1: ["k_positive"],
        3: ["v_known"],
        4: ["v_known"],
        -2: ["k_positive", "v_known"],
    }
    # the quarantine commit back-points at the main commit
    assert snapshot_meta(qpath, "quarantine_of", version=res["quarantine_version"]) == path
    assert snapshot_meta(
        qpath, "quarantine_source_version", version=res["quarantine_version"]
    ) == str(res["version"])


def test_warn_admits_everything_but_records(spark, tmp_path):
    path = str(tmp_path / "e3")
    res = expectations_write(
        _df(spark), path, EXPECT, on_violation="warn"
    )
    assert res["rows_written"] == 6 and res["rows_quarantined"] == 0
    assert versioned_read(spark, path).count() == 6
    rec = json.loads(snapshot_meta(path, "expectations", version=res["version"]))
    assert rec["v_known"]["violations"] == 3


def test_fail_aborts_with_metrics_and_commits_nothing(spark, tmp_path):
    path = str(tmp_path / "e4")
    with pytest.raises(ExpectationViolation) as ei:
        expectations_write(
            _df(spark), path, EXPECT, on_violation="fail"
        )
    assert ei.value.metrics == {"k_positive": 2, "v_known": 3}
    assert latest_version(path) is None
    # a fully clean batch commits under fail
    clean = _df(spark).filter("k > 0 AND v IS NOT NULL AND v <> ''")
    res = expectations_write(clean, path, EXPECT, on_violation="fail")
    assert res["rows_written"] == 2


def test_composes_with_check_constraints_and_write_kwargs(spark, tmp_path):
    from skopje_spark.sinks.versioned import ConstraintViolation

    path = str(tmp_path / "e5")
    res = expectations_write(
        _df(spark), path, EXPECT, on_violation="drop",
    )
    set_check_constraint(spark, path, "k_small", "k < 100")
    # the hard CHECK floor still rejects under the soft ladder
    bad = spark.createDataFrame([(500, "x")], ["k", "v"])
    with pytest.raises(ConstraintViolation):
        expectations_write(bad, path, EXPECT, on_violation="drop")
    # guarded CAS forwards through write_kw
    from skopje_spark.sinks.versioned import CommitConflict

    ok = spark.createDataFrame([(5, "y")], ["k", "v"])
    with pytest.raises(CommitConflict):
        expectations_write(
            ok, path, EXPECT, on_violation="drop", expected_version=0
        )


def test_bad_inputs_raise(spark, tmp_path):
    with pytest.raises(ValueError, match="on_violation"):
        expectations_write(
            _df(spark), str(tmp_path / "x"), EXPECT, on_violation="explode"
        )
    with pytest.raises(ValueError, match="at least one"):
        expectation_metrics(_df(spark), {})
    with pytest.raises(ValueError, match="empty condition"):
        expectation_metrics(_df(spark), {"e": "  "})
