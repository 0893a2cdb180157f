"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Times are wall-clock per query over a warm session (mirrors the reference's
TestTpchDistributed 20 s/query envelope; see BASELINE.md).

Per-query numbers are noisy round-over-round: queries run alphabetically in
ONE shared JVM, so GC/cache pressure from a neighboring family can shift an
individual query by ~2x while the suite total stays stable — compare totals
and per-family rollups, not single queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dremio_oss_spark.session import build_spark
    import __spark_entry__ as entrymod

    spark = build_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warm the JVM + file-listing caches with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            # count() forces full execution without driver-side
            # materialization (collect would measure pickling, not the query)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # one broken query must not kill the bench
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # full per-query detail to a sidecar file; the printed line must stay
    # small enough to survive the driver's stdout-tail buffer (the r01 line
    # with 114 entries overflowed it and recorded parsed=null)
    detail = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        **({"errors": errors} if errors else {}),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # compact line: every TPC-H query individually (BASELINE.md's per-query
    # and suite bounds) + rollups for the other families
    compact: dict[str, float] = {}
    groups: dict[str, float] = {}
    for name, t in timings.items():
        if name.startswith("tpch_"):
            compact[name] = round(t, 2)
        else:
            g = name.split("_", 1)[0]
            groups[g] = groups.get(g, 0.0) + t
    for g, t in sorted(groups.items()):
        compact[f"{g}_total"] = round(t, 2)
    compact["tpch_total"] = round(
        sum(t for n, t in timings.items() if n.startswith("tpch_")), 2
    )
    line = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        **({"n_errors": len(errors)} if errors else {}),
    }
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
