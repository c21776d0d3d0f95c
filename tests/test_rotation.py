"""Verification-rotation ordering contract for __spark_entry__.

The driver's bounded correctness sweep takes the first N entries of
``queries()``; the order therefore IS the verification policy.  These
tests pin the policy: latest-red queries first, then never-checked,
then least-recently-checked, with registry order as the stable
tiebreak.  The history is read from the CORRECTNESS_r*.json files the
driver itself writes, so the order self-corrects every round.
"""

from __future__ import annotations

import importlib
import json


def _history(tmp_path, rounds: dict[int, dict]):
    """Write CORRECTNESS files under tmp_path and parse them."""
    for rnd, rows in rounds.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))
    mod = importlib.import_module("__spark_entry__")
    return mod._check_history(here=str(tmp_path))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED_NO_ORACLE = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "err": "no_oracle",
}
RED_EXC = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "err": "Traceback ...",
}


def test_check_history_latest_round_wins(tmp_path):
    hist = _history(
        tmp_path,
        {
            1: {"a": GREEN, "b": GREEN},
            2: {"a": RED_NO_ORACLE},
        },
    )
    assert hist["a"] == (2, False)  # latest word (r2 red) wins over r1 green
    assert hist["b"] == (1, True)


def test_check_history_counts_exceptions_as_red(tmp_path):
    assert _history(tmp_path, {3: {"a": RED_EXC}})["a"] == (3, False)


def test_ordered_puts_latest_red_first():
    """Against the real repo history: every latest-red catalog query must
    appear before every latest-green one, so a 50-slot sweep always
    re-checks them."""
    mod = importlib.import_module("__spark_entry__")
    hist = mod._check_history()
    names = list(mod._ordered())
    greens = {n for n in names if hist.get(n, (0, False))[1]}
    first_green = min(
        (names.index(n) for n in greens), default=len(names)
    )
    for n in names:
        if n in hist and not hist[n][1]:
            assert names.index(n) < first_green, (
                f"latest-red {n} sorted after a green query"
            )


def test_ordered_registry_complete_and_oracles_aligned():
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 146
    # every oracle key is a query key (driver joins on name)
    assert set(oracles) <= set(qs)
