"""Bench regression tripwire (VERDICT r5 item 8).

Compares a bench run (raw one-line JSON from ``bench.py`` or a driver
``BENCH_rN.json`` with a ``parsed`` block) against the recorded
per-entry baseline floors in ``tools/bench_baseline.json``, applying the
variance contract documented in BASELINE.md:

- default band: ±20% (covers the measured quiet-machine ±10% plus
  moderate background load);
- per-entry overrides for the short-stage-dominated entries that swing
  ±20% even quiet (``semantic_dedup``, ``maxsim_topk``): ±30%;
- entries whose baseline is under 1 s get an absolute floor of 0.3 s
  added to the allowance — sub-second entries are scheduler-noise-bound,
  and a 0.4 s→0.6 s move is not a plan regression.

Output: a human-readable table plus ONE JSON line
``{"suspects": [...], "new": [...], "missing": [...], "ok": N}``.
Exit code 1 iff suspects is non-empty, so it is CI-runnable:

    python tools/bench_check.py BENCH_r05.json

Passing SEVERAL run files switches to union adjudication (the round-7
protocol): an entry is a suspect only if it exceeds its band in EVERY
run — single-run flags on adjacent quiet runs are the documented
alternating-flap variance, not regressions:

    python tools/bench_check.py run1.json run2.json run3.json

The baseline file records, per entry, the best quiet-machine median
observed so far (see BASELINE.md round-6 note for provenance). Refresh
it deliberately — after a quiet-machine run that BEATS an entry — with:

    python tools/bench_check.py --update <run.json>

(--update only LOWERS floors or adds new entries; it never raises a
floor, so a noisy run cannot silently relax the contract.)
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(HERE, "bench_baseline.json")

DEFAULT_BAND = 0.20
BAND_OVERRIDES = {
    # BASELINE.md variance contract: many-short-stage entries swing ±20%
    # run-to-run even on a quiet machine.
    "semantic_dedup": 0.30,
    "maxsim_topk": 0.30,
}
# Sub-second entries are dominated by fixed scheduler/JIT overhead; allow
# this much absolute slack on top of the relative band.
ABS_SLACK_S = 0.30


def load_run(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_rN.json wrapper
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' block found")
    return {k: float(v) for k, v in d["queries"].items()}


def check(run: dict[str, float], baseline: dict[str, float]):
    suspects, ok, new = [], [], []
    for name, sec in sorted(run.items()):
        if name not in baseline:
            new.append(name)
            continue
        floor = baseline[name]
        band = BAND_OVERRIDES.get(name, DEFAULT_BAND)
        limit = floor * (1.0 + band) + (ABS_SLACK_S if floor < 1.0 else 0.0)
        if sec > limit:
            suspects.append(
                {
                    "entry": name,
                    "sec": sec,
                    "floor": floor,
                    "limit": round(limit, 3),
                    "ratio": round(sec / floor, 2),
                }
            )
        else:
            ok.append(name)
    missing = sorted(set(baseline) - set(run))
    return suspects, ok, new, missing


def check_union(runs: "list[dict[str, float]]", baseline: dict):
    """Multi-run adjudication (the round-7 protocol, codified): an entry
    is a suspect only if it exceeds its band in EVERY given run —
    single-run flags on adjacent quiet runs are the documented
    alternating-flap variance, not regressions. Returns the same tuple
    shape as :func:`check`, with each suspect's per-run readings."""
    per_run = [check(r, baseline) for r in runs]
    always = set.intersection(
        *[{s["entry"] for s in sus} for sus, _, _, _ in per_run]
    )
    suspects = []
    for name in sorted(always):
        floor = baseline[name]
        vals = [r.get(name) for r in runs]
        suspects.append(
            {
                "entry": name,
                "sec": vals,
                "floor": floor,
                "limit": round(
                    floor * (1.0 + BAND_OVERRIDES.get(name, DEFAULT_BAND))
                    + (ABS_SLACK_S if floor < 1.0 else 0.0), 3
                ),
                "ratio": round(min(v for v in vals if v is not None) / floor, 2),
            }
        )
    new = sorted(set().union(*[set(n) for _, _, n, _ in per_run]))
    missing = sorted(set.intersection(*[set(m) for _, _, _, m in per_run]))
    ok = len(set(baseline) - always - set(missing))
    return suspects, ok, new, missing


def main(argv: list[str]) -> int:
    update = "--update" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if not paths:
        print(__doc__)
        return 2
    baseline: dict[str, float] = {}
    if os.path.exists(BASELINE_PATH):
        baseline = json.load(open(BASELINE_PATH))

    if len(paths) > 1 and not update:
        # union adjudication over N quiet runs: suspect = above band in ALL
        runs = [load_run(p) for p in paths]
        suspects, n_ok, new, missing = check_union(runs, baseline)
        for s in suspects:
            print(f"SUSPECT {s['entry']}: {s['sec']} vs floor {s['floor']}s "
                  f"(limit {s['limit']}s, best {s['ratio']}x) — above band "
                  f"in ALL {len(runs)} runs")
        for n in new:
            print(f"NEW     {n} (no baseline floor yet)")
        for m in missing:
            print(f"MISSING {m}: in baseline but in none of the runs")
        print(f"OK      {n_ok} entries within band in at least one run")
        print(json.dumps({
            "suspects": [s["entry"] for s in suspects],
            "new": new,
            "missing": missing,
            "ok": n_ok,
        }))
        return 1 if suspects else 0

    run = load_run(paths[0])

    if update:
        changed = 0
        for name, sec in run.items():
            if name not in baseline or sec < baseline[name]:
                baseline[name] = round(sec, 3)
                changed += 1
        json.dump(baseline, open(BASELINE_PATH, "w"), indent=1, sort_keys=True)
        print(f"baseline updated: {changed} floors lowered/added "
              f"({len(baseline)} entries total)")
        return 0

    suspects, ok, new, missing = check(run, baseline)
    for s in suspects:
        print(f"SUSPECT {s['entry']}: {s['sec']}s vs floor {s['floor']}s "
              f"(limit {s['limit']}s, {s['ratio']}x)")
    for n in new:
        print(f"NEW     {n}: {run[n]}s (no baseline floor yet)")
    for m in missing:
        print(f"MISSING {m}: in baseline but not in this run")
    print(f"OK      {len(ok)} entries within band")
    print(json.dumps({
        "suspects": [s["entry"] for s in suspects],
        "new": new,
        "missing": missing,
        "ok": len(ok),
    }))
    return 1 if suspects else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
