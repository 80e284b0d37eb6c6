"""tools/bench_check.py — the bench regression tripwire's pure logic:
single-run banding and the round-7 union adjudication."""

from __future__ import annotations

from tools.bench_check import check, check_union


BASE = {"fast": 0.5, "slow": 10.0}


def test_single_run_banding():
    run = {"fast": 0.85, "slow": 12.0, "brand_new": 1.0}
    suspects, ok, new, missing = check(run, BASE)
    # fast: limit 0.5*1.2 + 0.3 = 0.9 -> in band; slow: limit 12.0 -> at limit
    assert [s["entry"] for s in suspects] == []
    assert new == ["brand_new"]
    suspects, *_ = check({"slow": 12.01}, BASE)
    assert [s["entry"] for s in suspects] == ["slow"]


def test_union_requires_all_runs_above_band():
    runs = [
        {"fast": 2.0, "slow": 12.5},   # both above
        {"fast": 0.6, "slow": 12.5},   # fast back in band
        {"fast": 2.0, "slow": 12.5},
    ]
    suspects, ok, new, missing = check_union(runs, BASE)
    # only slow is above band in EVERY run
    assert [s["entry"] for s in suspects] == ["slow"]
    assert suspects[0]["sec"] == [12.5, 12.5, 12.5]
    assert missing == []
    # entry missing from every run reports missing
    suspects, ok, new, missing = check_union(
        [{"slow": 10.0}, {"slow": 10.0}], BASE
    )
    assert missing == ["fast"] and suspects == []
