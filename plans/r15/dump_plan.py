"""Dump .explain('formatted') for named queries to plans/r15/<q>_<tag>.txt.

Usage: python plans/r15/dump_plan.py TAG query [query ...]
Plan-only: builds the query (which may run its builder-side statements)
and writes the formatted plan; never executes the returned frame.
"""
from __future__ import annotations

import os
import sys

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
sys.path.insert(0, repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dremio_oss_spark.session import build_spark
    import __spark_entry__ as entrymod

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = build_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = os.path.join(here, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(txt)
        print(out, len(txt.splitlines()), "lines")


if __name__ == "__main__":
    main()
