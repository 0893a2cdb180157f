"""r15 optimization profiler: per-query construction-vs-execution split.

Runs every registered query at sf0.1 in a warm session (same methodology
as bench.py) but times the two phases separately:
  build_s  — queries[name](spark, sf_dir): Python orchestration, Engine
             setup, lake-DML writes, py4j/analysis
  exec_s   — noop-sink write of the returned frame (guide §1.4: forces
             every column, unlike the bench's count(); the bench keeps
             count() for methodology continuity)
Prints a JSON dict to plans/r15/$PROFILE_OUT (default profile.json —
set PROFILE_OUT for ad-hoc runs so the committed baseline isn't
clobbered).  Usage:
  python plans/r15/profile_r15.py [query ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys
import time

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dremio_oss_spark.session import build_spark
    import __spark_entry__ as entrymod

    spark = build_spark(app_name="profile_r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    only = sys.argv[1:]
    names = only or sorted(queries)

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            out[name] = {"build_s": round(t1 - t0, 3),
                         "exec_s": round(t2 - t1, 3),
                         "total_s": round(t2 - t0, 3)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"{type(e).__name__}: {e}"[:200]}
        spark.sparkContext.setJobDescription(None)

    out_name = os.environ.get("PROFILE_OUT", "profile.json")
    with open(os.path.join(here, out_name), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    tot = sum(v.get("total_s", 0) for v in out.values())
    bld = sum(v.get("build_s", 0) for v in out.values())
    print(f"n={len(out)} total={tot:.1f}s build={bld:.1f}s "
          f"exec={tot - bld:.1f}s")
    for name, v in sorted(out.items(), key=lambda kv: -kv[1].get("total_s", 0))[:30]:
        print(f"{v.get('total_s', 0):8.2f} {v.get('build_s', 0):8.2f} "
              f"{v.get('exec_s', 0):8.2f}  {name}")


if __name__ == "__main__":
    main()
