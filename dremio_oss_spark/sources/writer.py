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
    on_error: str = "abort",
    **read_opts,
) -> int:
    """COPY INTO target FROM source — returns rows loaded.

    With dedup=True, files already recorded in the target's ledger are
    skipped (auto-ingest pipe semantics).  The ledger is tiny (one row
    per loaded file), so the skip-join is a broadcast, not a shuffle.

    on_error='continue' (reference `COPY INTO ... ON_ERROR ('continue')`,
    CopyIntoPlanBuilder + ON_ERROR grammar): malformed CSV/JSON rows are
    diverted to `<target>/_rejects` (parquet of raw lines) instead of
    failing the load — Spark's PERMISSIVE corrupt-record column does the
    classification distributed, no extra pass.
    """
    from .formats import FormatRegistry

    reader_opts = dict(read_opts)
    corrupt_col = "_corrupt"
    continue_mode = on_error == "continue" and fmt in ("csv", "json", "tsv", "psv")
    if continue_mode:
        if not schema:
            raise ValueError("on_error='continue' requires an explicit schema")
        schema = f"{schema}, {corrupt_col} string"
        reader_opts.update(
            mode="PERMISSIVE", columnNameOfCorruptRecord=corrupt_col
        )
    src = FormatRegistry(spark).read(source_glob, fmt, schema=schema, **reader_opts)
    # _src_file must attach BEFORE any cache(): input_file_name() over an
    # InMemoryRelation returns '' — with dedup on, that poisoned the
    # ledger with a single '' entry and every later COPY INTO anti-joined
    # ALL rows away (silent data loss on the continue path)
    src = src.withColumn("_src_file", F.input_file_name())
    cached = None
    if continue_mode:
        # Spark disallows querying only the corrupt-record column of a raw
        # CSV/JSON scan; cache materializes the parse once (documented
        # workaround) — and the load reads the same cache, so no re-parse
        cached = src = src.cache()
        rejects = src.where(F.col(corrupt_col).isNotNull()).select(
            F.col(corrupt_col).alias("raw_record")
        )
        n_rej = rejects.count()
        if n_rej:
            rejects.write.mode("append").parquet(os.path.join(target, "_rejects"))
        src = src.where(F.col(corrupt_col).isNull()).drop(corrupt_col)

    ledger_path = os.path.join(target, LEDGER_DIR)
    if dedup and os.path.exists(ledger_path):
        # no broadcast hint: the loaded-files ledger grows with every
        # COPY INTO ever run against the table — AQE broadcasts while
        # it is genuinely small and shuffles once it isn't
        loaded = spark.read.parquet(ledger_path)
        src = src.join(
            loaded,
            src["_src_file"] == loaded["file_name"],
            "left_anti",
        )

    try:
        files = [r[0] for r in src.select("_src_file").distinct().collect()]
        if not files:
            return 0
        rows = src.drop("_src_file")
        if cached is None:
            # count + write would scan/parse the source twice; one
            # materialized pass serves both
            cached = rows = rows.cache()
        n = rows.count()
        rows.write.mode("append").parquet(target)
        spark.createDataFrame(
            [(f,) for f in files], "file_name string"
        ).write.mode("append").parquet(ledger_path)
        return n
    finally:
        if cached is not None:
            cached.unpersist()


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a written table, ignoring the COPY INTO ledger sidecar."""
    return spark.read.parquet(path)
