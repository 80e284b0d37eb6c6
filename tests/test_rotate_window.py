"""tools/rotate_window.py — staleness-driven correctness-window
rotation (VERDICT r6 item 6). Pure-function tests: no Spark."""

from __future__ import annotations

import json

from tools.rotate_window import (
    coverage_bound,
    load_latest_green,
    max_staleness_after,
    rotation_order,
)


def test_never_checked_lead_then_stalest():
    registry = ["a", "b", "c", "d", "e"]
    latest = {"a": 6, "b": 3, "d": 5}  # c, e never checked
    order = rotation_order(registry, latest)
    assert order == ["c", "e", "b", "d", "a"]


def test_ties_broken_by_registry_position_stably():
    registry = ["x", "y", "z"]
    latest = {"x": 4, "y": 4, "z": 4}
    assert rotation_order(registry, latest) == ["x", "y", "z"]


def test_coverage_bound():
    assert coverage_bound(50, 50) == 1
    assert coverage_bound(150, 50) == 3
    assert coverage_bound(151, 50) == 4
    assert coverage_bound(1, 50) == 1


def test_max_staleness_after_window():
    # 4 entries, window 2: the two stalest rotate in; the freshest two
    # stay behind. Oldest behind = r5 at round 7 => 2 rounds stale.
    registry = ["a", "b", "c", "d"]
    latest = {"a": 3, "b": 4, "c": 5, "d": 6}
    order = rotation_order(registry, latest)
    assert order == ["a", "b", "c", "d"]
    assert max_staleness_after(order, latest, 2, 7) == 2
    # everything fits in the window -> nothing left behind
    assert max_staleness_after(order, latest, 4, 7) == 0


def test_load_latest_green_semantics(tmp_path):
    # r5: q1 hash-green, q2 rows-only green, q3 hard failure
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({
        "q1": {"rows_match": True, "schema_match": True, "hash_match": True,
               "spark_rows": 10, "oracle_rows": 10, "err": None},
        "q2": {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"},
        "q3": {"rows_match": False, "schema_match": True, "hash_match": False,
               "spark_rows": 9, "oracle_rows": 10, "err": None},
    }))
    # r6: q1 FAILS (later failure must not erase the r5 green), q3 green
    (tmp_path / "CORRECTNESS_r06.json").write_text(json.dumps({
        "q1": {"rows_match": True, "schema_match": True, "hash_match": False,
               "spark_rows": 10, "oracle_rows": 10, "err": None},
        "q3": {"rows_match": True, "schema_match": True, "hash_match": True,
               "spark_rows": 10, "oracle_rows": 10, "err": None},
    }))
    latest = load_latest_green(str(tmp_path))
    assert latest == {"q1": 5, "q2": 5, "q3": 6}
    # q1's latest check failed -> its green is stale -> it outranks q3
    order = rotation_order(["q3", "q1", "q2"], latest)
    assert order == ["q1", "q2", "q3"]


def test_real_registry_rotation_invariants():
    """On the real correctness history: the checked entries at the head
    of the rotation are exactly the stalest greens (data-driven — at
    round 7 that was the q09/q10 overflow pair), the registry fits the
    3-round re-check guarantee, and the CURRENT registry order is
    window-consistent: the driver checks the first 50 entries, which
    must be the rotation's top 50 (no overflow regression). When a new
    CORRECTNESS_rN.json lands, re-apply the rotation:
    PYTHONPATH=. python tools/rotate_window.py --apply"""
    import __spark_entry__ as entry

    registry = list(entry.queries().keys())
    latest = load_latest_green("/root/repo")
    order = rotation_order(registry, latest)
    checked = [n for n in order if n in latest]
    oldest_round = min(latest[n] for n in checked)
    stalest = {n for n in checked if latest[n] == oldest_round}
    assert set(checked[: len(stalest)]) == stalest
    assert coverage_bound(len(registry), 50) <= 3
    assert set(registry[:50]) == set(order[:50]), (
        "registry window out of date — run tools/rotate_window.py --apply"
    )


def test_apply_rotation_round_trips(tmp_path):
    """--apply rewrites the queries() dict body in rotation order,
    preserving the comment block and losing nothing."""
    from tools.rotate_window import apply_rotation

    entry = tmp_path / "entry.py"
    entry.write_text(
        "def a(s, d):\n    return None\n\n"
        "def b(s, d):\n    return None\n\n"
        "def queries():\n"
        "    return {\n"
        "    # order comment line 1\n"
        "    # order comment line 2\n"
        '        "b": b,\n'
        '        "a": a,\n'
        "    }\n"
    )
    apply_rotation(str(entry), ["a", "b"])
    text = entry.read_text()
    assert '"a": a,\n        "b": b,' in text
    assert "# order comment line 1" in text
    ns: dict = {}
    exec(text, ns)
    assert list(ns["queries"]().keys()) == ["a", "b"]


def test_rotation_guard_detects_stale():
    """Round 10 (VERDICT r9 item 10): the mechanical guard — fresh
    registry passes; a registry whose head is not the rotation top-50
    is flagged with the exact remediation command. oracle_check exits
    on it; bench.py prints it to stderr every round, so an idle round
    can no longer let the window silently go stale."""
    import __spark_entry__ as e
    from tools.oracle_check import check_rotation_fresh

    assert check_rotation_fresh(e) is None

    class Stale:
        @staticmethod
        def queries():
            return dict(reversed(list(e.queries().items())))

    msg = check_rotation_fresh(Stale)
    assert msg is not None and "rotate_window.py --apply" in msg
