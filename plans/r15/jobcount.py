"""Per-query Spark JOB counter (noise-free driver-overhead signal).

Runs the named queries at $SPARK_GRAFT_SF_DIR under setJobGroup and
reports exact job counts via statusTracker().getJobIdsForGroup — the
r14 methodology: on this host wall-clock swings up to ~1.4x
run-over-run on identical code, so job counts are the comparison
signal for action-removal work.  Each query also reports build/exec
wall (noop sink) for context.

Usage: python plans/r15/jobcount.py <query> [query ...]
       python plans/r15/jobcount.py --family refl
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

    spark = build_spark(app_name="jobcount_r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    args = sys.argv[1:]
    if args and args[0] == "--family":
        pref = args[1]
        names = sorted(n for n in queries if n.startswith(pref))
    else:
        names = args
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    st = spark.sparkContext.statusTracker()

    out = {}
    for name in names:
        gid = f"jc-{name}-{time.time_ns()}"
        spark.sparkContext.setJobGroup(gid, name)
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobGroup(None, None)
        jobs = len(st.getJobIdsForGroup(gid))
        out[name] = {"jobs": jobs, "build_s": round(t1 - t0, 3),
                     "exec_s": round(t2 - t1, 3)}
        print(f"{name}: jobs={jobs} build={t1-t0:.2f}s exec={t2-t1:.2f}s",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
