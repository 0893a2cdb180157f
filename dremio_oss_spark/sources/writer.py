"""Writers: CTAS / INSERT INTO / COPY INTO with load-dedup.

Reference: dremio-oss
- CTAS: `exec/planner/sql/handlers/query/CreateTableHandler.java` +
  `sabot/op/writer/WriterOperator.java:52` (partitioned parquet output).
- INSERT: `exec/planner/sql/handlers/query/InsertTableHandler.java`.
- COPY INTO: `exec/planner/sql/handlers/query/CopyIntoPlanBuilder.java`;
  auto-ingest pipes dedup already-loaded files over a lookback window
  (`sabot/grammar/.../ingestion.ftl:195-222` DEDUPE_LOOKBACK_PERIOD).

Spark-first: writes are `df.write.parquet` — distributed, partitioned,
committed via Spark's output committer (the reference's
WriterCommitterOperator role).  COPY INTO file-dedup is a metadata join
against a tiny `_loaded_files` ledger, broadcast at plan time — never a
scan of the target table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_DIR = "_loaded_files"


def ctas(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "error",
) -> None:
    """CREATE TABLE AS SELECT -> partitioned parquet directory."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def insert_into(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """INSERT INTO -> append to an existing parquet table."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def copy_into(
    spark: SparkSession,
    target: str,
    source_glob: str,
    fmt: str = "parquet",
    schema: str | None = None,
    dedup: bool = True,
    **read_opts,
) -> int:
    """COPY INTO target FROM source — returns rows loaded.

    With dedup=True, files already recorded in the target's ledger are
    skipped (auto-ingest pipe semantics).  The ledger is tiny (one row
    per loaded file), so the skip-join is a broadcast, not a shuffle.
    """
    from .formats import FormatRegistry

    src = FormatRegistry(spark).read(source_glob, fmt, schema=schema, **read_opts)
    src = src.withColumn("_src_file", F.input_file_name())

    ledger_path = os.path.join(target, LEDGER_DIR)
    if dedup and os.path.exists(ledger_path):
        loaded = spark.read.parquet(ledger_path)
        src = src.join(
            F.broadcast(loaded),
            src["_src_file"] == loaded["file_name"],
            "left_anti",
        )

    files = [r[0] for r in src.select("_src_file").distinct().collect()]
    if not files:
        return 0
    rows = src.drop("_src_file")
    n = rows.count()
    rows.write.mode("append").parquet(target)
    spark.createDataFrame([(f,) for f in files], "file_name string").write.mode(
        "append"
    ).parquet(ledger_path)
    return n


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a written table, ignoring the COPY INTO ledger sidecar."""
    return spark.read.parquet(path)
