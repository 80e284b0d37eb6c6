"""Local replica of the driver's correctness gate: run queries() against
oracle_sql() through DuckDB at sf0.01 and compare row counts + values
(columns sorted by name, values stringified — the driver's hash contract).

    PYTHONPATH=. python tools/oracle_check.py [n_queries] [start]

Defaults to the driver's window (first 50 registry entries)."""

from __future__ import annotations

import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def check_rotation_fresh(entry, window: int = 50) -> "str | None":
    """Round 10 (VERDICT r9 item 10): the registry order IS the driver's
    correctness window — a stale order silently re-checks last round's
    50 and lets the tail age past the 3-round freshness bound. Returns
    an error string when registry[:window] differs from the rotation
    top-window computed from the CORRECTNESS_r*.json on disk."""
    from tools.rotate_window import load_latest_green, rotation_order

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    registry = list(entry.queries())
    top = rotation_order(registry, load_latest_green(repo_root))[:window]
    if registry[:window] == top:
        return None
    return (
        "registry window is STALE (registry[:50] != rotation top-50 for "
        "the CORRECTNESS_r*.json on disk) — run:\n"
        "    PYTHONPATH=. python tools/rotate_window.py --apply\n"
        "and commit __spark_entry__.py before anything else"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as _entry_mod

    stale = check_rotation_fresh(_entry_mod)
    if stale is not None and not os.environ.get(
        "SPARK_GRAFT_SKIP_ROTATION_GUARD"
    ):
        sys.exit(stale)

    from vector_index_spark import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)[start : start + n]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(sdf)} rows")
                n_rows_only += 1
                continue
            odf = con.execute(oracles[name]).df()
            cols = sorted(sdf.columns)
            ok_schema = cols == sorted(odf.columns)
            if not ok_schema:
                print(f"FAIL {name}: columns {cols} vs {sorted(odf.columns)}")
                n_fail += 1
                continue
            a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
            b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
            if len(a) != len(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                n_fail += 1
            elif not a.equals(b):
                neq = (a != b).any(axis=1)
                i = neq.idxmax()
                print(f"FAIL {name}: first diff row {i}:")
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
                n_fail += 1
            else:
                print(f"PASS {name}: {len(a)} rows")
                n_pass += 1
        except Exception:
            print(f"ERROR {name}:")
            traceback.print_exc()
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
          f"of {len(names)}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
