"""Driver-simulation correctness sweep.

Runs EVERY entry of __spark_entry__.queries() against its oracle_sql()
the way the driver does — but locally and fast:

- each query runs on a FRESH `spark.newSession()` with default SQL confs
  (no build_spark tuning), so conf dependencies that only hold in our own
  session (the round-1 nanosAsLong failure mode) surface here;
- results are canonicalized driver-style: columns sorted by name, rows
  sorted, cells normalized, then compared value-by-value.

Usage:  python verify_driver_sim.py [sf_dir]      (default /root/testdata/sf0.01)
Exit 0 if every query matches; prints one line per failure.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tests.oracle import compare, duckdb_conn

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # deliberately bare: the driver's session is not ours
    base = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    base.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    t_start = time.perf_counter()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sess = base.newSession()  # fresh SQL confs + temp views per query
        try:
            df = fn(sess, sf_dir)
            if name in oracles:
                expected = con.execute(oracles[name]).fetchdf()
                problems = compare(df, expected, ordered=False)
                if problems:
                    n_fail += 1
                    failures.append(f"{name}: " + "; ".join(problems[:3]))
                else:
                    n_pass += 1
            else:
                df.count()  # rows-only check, like the driver's weak gate
                n_rows_only += 1
        except Exception as e:
            n_fail += 1
            tb = traceback.format_exc().splitlines()
            failures.append(f"{name}: EXC {type(e).__name__}: {e} | {tb[-1]}")

    dt = time.perf_counter() - t_start
    print(f"\n== driver-sim: {n_pass} pass, {n_rows_only} rows-only, "
          f"{n_fail} FAIL in {dt:.0f}s at {sf_dir} ==")
    for f in failures:
        print("FAIL", f[:500])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
