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


def main(argv: list[str]) -> int:
    update = "--update" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if not paths:
        print(__doc__)
        return 2
    run = load_run(paths[0])
    baseline: dict[str, float] = {}
    if os.path.exists(BASELINE_PATH):
        baseline = json.load(open(BASELINE_PATH))

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
