"""Suite-wide py4j round-trip counter (the r14 session-5 methodology).

Monkeypatches py4j's ClientServerConnection.send_command to count
driver->JVM round-trips per query, runs every registered query at
$SPARK_GRAFT_SF_DIR (construction + noop-sink execution), and prints
the per-query and total counts.  Wall-clock-noise-free like job counts,
but it also sees PLAN-CONSTRUCTION chatter that never becomes a job.

Usage: python plans/r15/py4jcount.py [query ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)

COUNTER = {"n": 0}


def main() -> None:
    import py4j.clientserver as cs

    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **k):
        COUNTER["n"] += 1
        return orig(self, *a, **k)

    cs.ClientServerConnection.send_command = counted

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dremio_oss_spark.session import build_spark
    import __spark_entry__ as entrymod

    spark = build_spark(app_name="py4jcount_r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or sorted(queries)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()

    out = {}
    for name in names:
        before = COUNTER["n"]
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = COUNTER["n"] - before
        except Exception as e:  # noqa: BLE001
            out[name] = -1
            print(f"{name}: ERROR {e}", flush=True)
    total = sum(v for v in out.values() if v > 0)
    for name, v in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8d}  {name}")
    print(f"TOTAL {total}")
    out_name = os.environ.get("PY4J_OUT", "py4j_counts.json")
    with open(os.path.join(here, out_name), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
