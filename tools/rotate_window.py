"""Staleness-driven correctness-window rotation.

The driver oracle-checks the FIRST ``window`` (50) entries of
``__spark_entry__.queries()`` each round, so registry order IS the
correctness window. Through round 6 that order was hand-maintained,
which is how the round-6 overflow happened (52 rotation candidates for
50 slots left q09/q10 r3-stale — VERDICT r6 item 1/6). This tool makes
overflows structurally impossible:

  * reads every ``CORRECTNESS_r*.json`` and derives, per registered
    query, the latest round with a green driver check (hash-matched, or
    the documented rows-only weak check for estimate-valued entries);
  * emits the staleness-sorted rotation: never-checked / last-check-
    failed entries first, then ascending latest-green round, ties broken
    by current registry position (stable);
  * asserts the coverage invariant: with N registered queries and a
    ``window``-entry driver gate, staleness-sorted rotation guarantees
    every entry is re-checked at least every ceil(N / window) rounds —
    the tool fails if that bound exceeds ``--max-age`` (default 3).

Usage:
    PYTHONPATH=. python tools/rotate_window.py            # report
    PYTHONPATH=. python tools/rotate_window.py --emit dict  # paste-ready
                                                # queries() body lines
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

WINDOW = 50
ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def load_latest_green(repo_root: str) -> dict[str, int]:
    """Map query name -> latest round with a green driver check.

    Green = hash-matched (rows/schema/hash all true, no error), or the
    rows-only weak check (err == 'no_oracle' with a recorded row count)
    that the driver applies to estimate-valued queries. A query whose
    latest appearance FAILED is treated as if that appearance never
    happened (it must lead the next window).
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = ROUND_RE.search(path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            results = json.load(f)
        for name, rec in results.items():
            if _is_green(rec) and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def _is_green(rec: dict) -> bool:
    if rec.get("hash_match"):
        return bool(rec.get("rows_match")) and bool(rec.get("schema_match"))
    return rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None


def rotation_order(
    registry: list[str], latest_green: dict[str, int]
) -> list[str]:
    """Staleness-sorted rotation: never-checked (or latest-check-failed)
    entries first in registry order, then ascending latest-green round,
    ties broken by current registry position (a stable sort — entries a
    past rotation already ordered within a round keep that order)."""
    pos = {name: i for i, name in enumerate(registry)}
    return sorted(
        registry, key=lambda n: (latest_green.get(n, -1), pos[n])
    )


def coverage_bound(n_queries: int, window: int) -> int:
    """Worst-case rounds between driver checks of any one query under
    staleness-sorted rotation: each round retires the ``window`` stalest
    entries, so an entry waits at most ceil(N / window) rounds."""
    return max(1, math.ceil(n_queries / window))


def max_staleness_after(
    order: list[str], latest_green: dict[str, int], window: int,
    this_round: int,
) -> int:
    """Rounds-stale of the OLDEST green entry left outside this round's
    window, after the window runs (entries inside it become fresh)."""
    behind = order[window:]
    if not behind:
        return 0
    oldest = min(latest_green.get(n, -1) for n in behind)
    return this_round - oldest if oldest >= 0 else this_round + 1


def apply_rotation(entry_path: str, order: "list[str]") -> None:
    """Rewrite the ``queries()`` dict body of ``entry_path`` in the given
    order. The leading comment block (lines starting with ``#`` right
    after ``return {``) is preserved verbatim; only the entry lines are
    replaced."""
    src = open(entry_path).read()
    start = src.index("    return {\n", src.index("def queries()"))
    end = src.index("    }\n", start) + len("    }\n")
    body_lines = src[start + len("    return {\n"):end - len("    }\n")]
    comment = "".join(
        line
        for line in body_lines.splitlines(keepends=True)
        if line.lstrip().startswith("#")
    )
    entries = "".join(f'        "{name}": {name},\n' for name in order)
    new = (
        src[:start] + "    return {\n" + comment + entries + "    }\n"
        + src[end:]
    )
    with open(entry_path, "w") as f:
        f.write(new)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=WINDOW)
    ap.add_argument(
        "--max-age", type=int, default=3,
        help="fail if the guaranteed re-check interval exceeds this",
    )
    ap.add_argument(
        "--emit", choices=("report", "dict", "latest"), default="report",
        help="'dict' prints paste-ready queries() body lines; 'latest' "
        "prints one 'qid latest_green=rN' line per registry entry "
        "(registry order) — the mechanical source for any latest-green "
        "citation (ADVICE r9: derive these from the CORRECTNESS_r*.json "
        "key sets instead of hand-carrying them between rounds)",
    )
    ap.add_argument(
        "--apply", action="store_true",
        help="rewrite __spark_entry__.py's queries() dict body in the "
        "rotation order (comment block preserved); verifies the registry "
        "round-trips identically",
    )
    ap.add_argument("--repo-root", default=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    args = ap.parse_args()

    sys.path.insert(0, args.repo_root)
    import __spark_entry__ as entry  # noqa: E402

    registry = list(entry.queries().keys())
    latest = load_latest_green(args.repo_root)
    rounds_seen = [
        int(ROUND_RE.search(p).group(1))
        for p in glob.glob(os.path.join(args.repo_root, "CORRECTNESS_r*.json"))
    ]
    this_round = (max(rounds_seen) + 1) if rounds_seen else 1
    order = rotation_order(registry, latest)

    bound = coverage_bound(len(registry), args.window)
    if bound > args.max_age:
        print(
            f"FAIL: {len(registry)} queries / {args.window}-entry window "
            f"=> worst-case re-check every {bound} rounds > {args.max_age}. "
            "Shrink the registry or raise the window.",
            file=sys.stderr,
        )
        return 1

    if args.emit == "dict":
        for name in order:
            print(f'        "{name}": {name},')
        return 0

    if args.emit == "latest":
        for name in registry:
            tag = f"r{latest[name]}" if name in latest else "never"
            print(f"{name} latest_green={tag}")
        return 0

    if args.apply:
        path = os.path.join(args.repo_root, "__spark_entry__.py")
        apply_rotation(path, order)
        # round-trip check: reload and confirm the registry is the
        # rotation order with nothing lost
        import importlib

        importlib.reload(entry)
        new_keys = list(entry.queries().keys())
        assert new_keys == order, "apply round-trip mismatch"
        print(f"applied: {len(order)} entries rewritten in rotation order")
        return 0

    print(f"registry: {len(registry)} queries; window: {args.window}; "
          f"rotating for round {this_round}")
    print(f"guaranteed re-check interval: every {bound} round(s) "
          f"(max allowed {args.max_age})")
    never = [n for n in order if n not in latest]
    if never:
        print(f"never-checked (lead the window): {never}")
    print("window head (first 10):")
    for name in order[:10]:
        print(f"  {name}  latest_green=r{latest.get(name, '-')}")
    stale_after = max_staleness_after(order, latest, args.window, this_round)
    print(f"oldest entry left behind the window after this round: "
          f"{stale_after} round(s) stale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
