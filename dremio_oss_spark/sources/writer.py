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
from ..localframe import meta_df

LEDGER_DIR = "_loaded_files"
ERRORS_DIR = "_copy_errors"


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
    job_id: str | None = None,
    **read_opts,
) -> int:
    """COPY INTO target FROM source — returns rows loaded.

    With dedup=True, files already recorded in the target's ledger are
    skipped (auto-ingest pipe semantics).  The ledger is tiny (one row
    per loaded file), so the skip-join is a broadcast, not a shuffle.

    on_error='continue' (reference `COPY INTO ... ON_ERROR ('continue')`,
    CopyIntoPlanBuilder + the ON_ERROR grammar, ingestion.ftl:160):
    malformed CSV/JSON rows are diverted instead of failing the load —
    Spark's PERMISSIVE corrupt-record column does the classification
    distributed, no extra pass.  Good rows of a bad file still load.

    on_error='skip_file' (`OnErrorAction.SKIP_FILE`,
    SqlCopyIntoTable.java:709 — the only mode auto-ingest PIPEs accept,
    SqlManagePipe.java:84): a file containing ANY malformed record is
    skipped WHOLE — its good rows do not load — and with dedup the file
    is recorded consumed, so a later run never retries it (a corrected
    file arrives under a new name: the pipe contract).

    Both error modes append per-record diagnostics (job_id, file name,
    raw record, reason) to `<target>/_copy_errors`, queryable via
    `TABLE(copy_errors('<target>'))` — the reference's copy_errors
    table function over its copy-into error history
    (CopyErrorsMacro.java, copy_errors() validation mode).  Error
    classification runs AFTER the ledger anti-join, and a file whose
    rows were ALL rejected is still recorded consumed, so re-running
    the same COPY INTO never duplicates error records.
    """
    from .formats import FormatRegistry

    reader_opts = dict(read_opts)
    corrupt_col = "_corrupt"
    if on_error not in ("abort", "continue", "skip_file"):
        raise ValueError(
            "on_error must be 'abort', 'continue' or 'skip_file'")
    error_mode = (on_error in ("continue", "skip_file")
                  and fmt in ("csv", "json", "tsv", "psv"))
    if error_mode:
        if not schema:
            raise ValueError(
                f"on_error={on_error!r} requires an explicit schema")
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
    if error_mode or fmt in ("csv", "tsv", "psv", "json", "txt",
                             "xlsx", "xls"):
        # Spark disallows querying only the corrupt-record column of a raw
        # CSV/JSON scan; cache materializes the parse once (documented
        # workaround) — and the load reads the same cache, so no re-parse.
        # Non-error mode caches too whenever the format requires parsing:
        # the accounting groupBy and the final write are otherwise two
        # independent parses of the source glob.  Parquet/ORC/arrow skip
        # the cache — a columnar re-scan is cheaper than the cache build.
        cached = src = src.cache()

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

    # ONE aggregated pass computes every piece of load accounting —
    # per-file good/bad row counts — instead of the previous 4-5
    # separate actions (error count, bad-file list, good-file list,
    # loadable-file list, loaded-row count).  The collect is bounded by
    # the FILE count of this COPY INTO batch (one row per source file),
    # not by row count, so it stays metadata-sized at any data scale.
    consumed_extra: list[str] = []  # skip_file: bad files marked consumed
    bad_expr = (F.col(corrupt_col).isNotNull() if error_mode
                else F.lit(False))
    per_file = {
        r["_src_file"]: (r["n_good"], r["n_bad"])
        for r in src.groupBy("_src_file").agg(
            F.sum(F.when(bad_expr, 0).otherwise(1)).alias("n_good"),
            F.sum(F.when(bad_expr, 1).otherwise(0)).alias("n_bad"),
        ).collect()
    }
    try:
        if error_mode:
            bad = src.where(F.col(corrupt_col).isNotNull())
            n_err = sum(nb for _, nb in per_file.values())
            if n_err:
                errors = bad.select(
                    F.lit(job_id or _new_job_id()).alias("job_id"),
                    F.element_at(F.split("_src_file", "/"), -1)
                    .alias("file_name"),
                    F.col(corrupt_col).alias("raw_record"),
                    F.lit("malformed record").alias("reason"),
                )
                errors.write.mode("append").parquet(
                    os.path.join(target, ERRORS_DIR))
                # back-compat raw-lines sink for the continue mode
                if on_error == "continue":
                    (bad.select(F.col(corrupt_col).alias("raw_record"))
                     .write.mode("append")
                     .parquet(os.path.join(target, "_rejects")))
                bad_files = sorted(
                    f for f, (_, nb) in per_file.items() if nb)
                if on_error == "skip_file":
                    # a file with ANY malformed record skips WHOLE and
                    # is consumed (never retried; corrected files
                    # arrive under a new name — the pipe contract)
                    consumed_extra = bad_files
                    src = src.where(~F.col("_src_file").isin(bad_files))
                    files = sorted(f for f, (ng, nb) in per_file.items()
                                   if not nb and ng)
                else:
                    # continue: good rows of a bad file load, so the
                    # file lands in `files` — EXCEPT an all-corrupt
                    # file, which contributes no good rows and would
                    # otherwise never reach the ledger: each re-run
                    # would re-classify it and append duplicate
                    # _copy_errors records forever
                    src = src.where(F.col(corrupt_col).isNull())
                    files = sorted(f for f, (ng, _) in per_file.items()
                                   if ng)
                    consumed_extra = [f for f in bad_files
                                      if f not in files]
            else:
                src = src.where(F.col(corrupt_col).isNull())
                files = sorted(f for f, (ng, _) in per_file.items()
                               if ng)
            src = src.drop(corrupt_col)
        else:
            files = sorted(f for f, (ng, _) in per_file.items() if ng)
        if not files and not consumed_extra:
            return 0
        n = sum(per_file[f][0] for f in files)
        if files:
            src.drop("_src_file").write.mode("append").parquet(target)
        if files or consumed_extra:
            # the ledger batch is one tiny row per consumed file —
            # metadata by construction — so write it driver-side
            # (pyarrow) instead of paying a Spark job for a KB of data;
            # readers (`spark.read.parquet`) see the same schema
            _append_ledger(ledger_path, files + consumed_extra)
        return n
    finally:
        if cached is not None:
            cached.unpersist()


def _append_ledger(ledger_path: str, file_names: list[str]) -> None:
    """Append (file_name) rows to the loaded-files ledger as one
    driver-written parquet part (the batch is file-count bounded)."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ledger_path, exist_ok=True)
    t = pa.table({"file_name": pa.array(file_names, type=pa.string())})
    pq.write_table(
        t, os.path.join(ledger_path,
                        f"part-ledger-{uuid.uuid4().hex[:12]}.parquet"))


def _new_job_id() -> str:
    import uuid

    return uuid.uuid4().hex[:16]


def read_copy_errors(spark: SparkSession, target: str) -> DataFrame:
    """TABLE(copy_errors('<target>')): per-record load diagnostics from
    every error-mode COPY INTO against the target (the reference's
    copy_errors table function, CopyErrorsMacro.java)."""
    from pyspark.sql.types import StringType, StructField, StructType

    p = os.path.join(target, ERRORS_DIR)
    schema = StructType([
        StructField("job_id", StringType()),
        StructField("file_name", StringType()),
        StructField("raw_record", StringType()),
        StructField("reason", StringType()),
    ])
    if not os.path.exists(p):
        return meta_df(spark, [], schema)
    return spark.read.schema(schema).parquet(p)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a written table, ignoring the COPY INTO ledger sidecar."""
    return spark.read.parquet(path)
