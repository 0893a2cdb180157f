"""Distributed lake-metadata planning: replay Delta logs and scan
Iceberg manifests as DataFrames instead of driver-side Python loops.

Reference: dremio-oss plans big-table metadata DISTRIBUTED — manifest
reads run as a table function inside the plan
(`sabot/op/tablefunction/TableFunctionOperator.java:42`, Iceberg
manifest-scan tasks), never as a coordinator loop.  The pure-Python
resolvers in `sources/delta.py` / `sources/iceberg.py` are fine for
thousands of files, but at millions of files single-threaded JSON/Avro
parsing on the driver becomes the bottleneck — this module is the scale
path, kept result-identical to the Python one (asserted by tests and
`scale_smoke.py`).

Shapes:
- Delta: checkpoint parquet + tail JSON commits read by Spark (one text
  scan, `from_json` with an explicit action schema — no inference pass),
  live set = latest action per path (window), adds only.  O(actions)
  work fully parallel, O(live files) result.
- Iceberg: the manifest LIST (one row per manifest, small) reads on the
  driver; manifest FILES parse in parallel via `mapPartitions` over the
  manifest paths with the same Avro codec the Python path uses.
- Pruning (partition values + min/max stats) is expressed as DataFrame
  filters over the metadata rows, so a 10M-file table prunes with zero
  driver-side per-file Python.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .delta import _LOG_DIR, _commit_files, _last_checkpoint
from ..localframe import meta_df

_DV_TYPE = ("struct<storageType:string,pathOrInlineDv:string,"
            "offset:bigint,sizeInBytes:bigint,cardinality:bigint>")
_ACTION_SCHEMA = (
    f"struct<add:struct<path:string,partitionValues:map<string,string>,"
    f"stats:string,dataChange:boolean,deletionVector:{_DV_TYPE}>,"
    f"remove:struct<path:string>>"
)


def delta_live_files_df(spark: SparkSession, table: str,
                        version: int | None = None) -> DataFrame:
    """The live file set at `version` as a DataFrame
    (path, pv map, stats json string, dv struct) — the distributed
    equivalent of `resolve_snapshot(...).files`.  Same replay semantics:
    checkpoint state plus tail commits, latest action per path wins,
    an add and remove of the same path in one commit resolves to the
    add (the DV re-add case)."""
    from pyspark.sql import Window

    commits = _commit_files(table)
    if not commits:
        raise FileNotFoundError(f"not a Delta table: {table}")
    if version is not None and version not in {v for v, _ in commits}:
        # same contract as resolve_snapshot: a nonexistent version must
        # error, not silently plan the head snapshot
        raise FileNotFoundError(f"no Delta version {version} in {table}")
    max_v = commits[-1][0] if version is None else version
    cp_v = _last_checkpoint(table)
    frames: list[DataFrame] = []
    start = 0
    if cp_v is not None and cp_v <= max_v:
        cp = os.path.join(table, _LOG_DIR,
                          f"{cp_v:020d}.checkpoint.parquet")
        cdf = spark.read.parquet(cp)
        add = cdf.where("add is not null").select("add.*")
        cols = add.columns
        pv = (F.from_json(F.to_json(F.col("partitionValues")),
                          "map<string,string>")
              if "partitionValues" in cols
              else F.lit(None).cast("map<string,string>"))
        dv = (F.from_json(F.to_json(F.col("deletionVector")), _DV_TYPE)
              if "deletionVector" in cols
              else F.lit(None).cast(_DV_TYPE))
        st = (F.col("stats") if "stats" in cols
              else F.lit(None).cast("string"))
        frames.append(add.select(
            F.col("path"), pv.alias("pv"), st.alias("stats"),
            dv.alias("dv"), F.lit(cp_v).alias("_v"),
            F.lit("add").alias("_kind")))
        start = cp_v + 1
    tail = [fp for v, fp in commits if start <= v <= max_v]
    if tail:
        txt = (spark.read.text(tail)
               .withColumn("_v", F.regexp_extract(
                   F.input_file_name(), r"(\d{20})\.json", 1)
                   .cast("long"))
               .where(F.length("value") > 0)
               .select(F.from_json("value", _ACTION_SCHEMA).alias("a"),
                       "_v"))
        frames.append(txt.where("a.add is not null").select(
            F.col("a.add.path").alias("path"),
            F.col("a.add.partitionValues").alias("pv"),
            F.col("a.add.stats").alias("stats"),
            F.col("a.add.deletionVector").alias("dv"),
            "_v", F.lit("add").alias("_kind")))
        frames.append(txt.where("a.remove is not null").select(
            F.col("a.remove.path").alias("path"),
            F.lit(None).cast("map<string,string>").alias("pv"),
            F.lit(None).cast("string").alias("stats"),
            F.lit(None).cast(_DV_TYPE).alias("dv"),
            "_v", F.lit("remove").alias("_kind")))
    if not frames:
        # a version older than the earliest usable state (checkpoint
        # after it, pre-checkpoint commits aged out) must error clearly
        raise FileNotFoundError(
            f"log history for version {max_v} of {table} is not "
            f"replayable (checkpoint at {cp_v} supersedes it)")
    allf = reduce(lambda a, b: a.unionByName(b), frames)
    w = Window.partitionBy("path").orderBy(
        F.col("_v").desc(), F.col("_kind").asc())
    return (allf.withColumn("_rn", F.row_number().over(w))
            .where("_rn = 1 and _kind = 'add'")
            .drop("_rn", "_kind", "_v"))


def _stats_keep_col(mn, mx, v, str_bound=None):
    """Min/max stats check replicating the Python planners exactly:
    prune ONLY when BOTH bounds exist; the Python side dispatches on
    the JSON TYPE of the stored bound (string bounds compare lexically
    against str(v), numeric bounds numerically, and a numeric-bound vs
    string-value mismatch KEEPS the file — the TypeError branch).
    `str_bound` is a Column telling whether the stored bound is a JSON
    string (get_json_object erases the quoting, so callers derive it
    from the raw minValues object); None falls back to parse-based
    detection (numeric when both bounds parse)."""
    both = mn.isNotNull() & mx.isNotNull()
    mn_d, mx_d = mn.try_cast("double"), mx.try_cast("double")
    numeric_stats = mn_d.isNotNull() & mx_d.isNotNull()
    if str_bound is not None:
        numeric_stats = (~str_bound) & numeric_stats
    lex = (mn <= F.lit(str(v))) & (mx >= F.lit(str(v)))
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        # string value: numeric stats can't compare -> keep (TypeError)
        in_range = F.when(numeric_stats, F.lit(True)).otherwise(lex)
    else:
        in_range = F.when(
            numeric_stats,
            (mn_d <= F.lit(float(v))) & (mx_d >= F.lit(float(v)))
        ).otherwise(lex)
    return (~both) | in_range


def _str_bound_col(stats_col, c: str):
    """Whether column `c`'s stored min bound is a JSON STRING — decided
    on the raw minValues object text (quoting survives there), matching
    the Python planners' isinstance(lo, str) dispatch."""
    import re as _re

    obj = F.get_json_object(stats_col, "$.minValues")
    return obj.rlike(f'"{_re.escape(c)}"\\s*:\\s*"')


def _prune_delta_files(df: DataFrame, partition_cols: list[str],
                       equality: dict[str, object]) -> DataFrame:
    """plan_delta_scan's partition-value + min/max-stats pruning as
    DataFrame filters — shared by the standalone distributed planner
    and the engine's in-scan switch, replicating `_pv_eq`'s semantics
    exactly: numeric-tolerant ('2' matches '2.0'), boolean-insensitive
    ('true' matches Python True), string-exact otherwise."""
    for c, v in equality.items():
        if c in partition_cols:
            pv = F.col("pv").getItem(c)
            sv = str(v).lower() if isinstance(v, bool) else str(v)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                df = df.where(pv.cast("double") == F.lit(float(v)))
            else:
                both_num = (pv.try_cast("double").isNotNull()
                            & F.lit(sv).try_cast("double").isNotNull())
                df = df.where(F.when(
                    both_num,
                    pv.try_cast("double") == F.lit(sv).try_cast("double")
                ).otherwise(F.lower(pv) == F.lit(sv)
                            if isinstance(v, bool)
                            else pv == F.lit(sv)))
        mn = F.get_json_object("stats", f"$.minValues.{c}")
        mx = F.get_json_object("stats", f"$.maxValues.{c}")
        df = df.where(_stats_keep_col(mn, mx, v,
                                      _str_bound_col(F.col("stats"), c)))
    return df


def delta_plan_files_distributed(
        spark: SparkSession, table: str, equality: dict[str, object],
        partition_cols: list[str] | None = None,
        version: int | None = None) -> DataFrame:
    """Distributed twin of `plan_delta_scan`'s pruning: partition-value
    and min/max-stats filters applied to the live-file DataFrame.
    Returns the surviving (path, pv, stats, dv) rows; the caller builds
    the multi-path scan from them (file-list-sized, like the
    reference's split generation)."""
    if partition_cols is None:
        partition_cols = _delta_partition_cols(table, version)
    df = delta_live_files_df(spark, table, version)
    return _prune_delta_files(df, partition_cols, equality)


def _delta_partition_cols(table: str,
                          version: int | None = None) -> list[str]:
    """Partition columns from the metaData action at `version` (default
    head) — a cheap driver-side lookup (substring-gated line scan of
    commits, one parquet column from the checkpoint), NOT an O(files)
    replay."""
    from .delta import _latest_metadata_action

    return list(_latest_metadata_action(table, version)
                .get("partitionColumns") or [])


def iceberg_manifest_entries_df(spark: SparkSession, table: str,
                                snapshot_id: int | None = None
                                ) -> DataFrame:
    """All manifest entries of a snapshot as a DataFrame
    (manifest_path, status, file_path, content, partition json,
    stats json) — manifests parse in PARALLEL on executors
    (mapPartitions over manifest paths), the reference's distributed
    manifest-scan table function.  The manifest list itself is one row
    per manifest and stays on the driver."""
    from .avro_codec import read_avro_file
    from .iceberg import _local, _snapshot_meta

    # _snapshot_meta owns snapshot resolution (and its error contract:
    # FileNotFoundError for unknown snapshots, not a bare StopIteration)
    snap = _snapshot_meta(table, snapshot_id).snap_rec
    manifests = [_local(mf["manifest_path"], table)
                 for mf in read_avro_file(_local(snap["manifest-list"],
                                                 table))]
    schema_s = ("manifest_path string, status int, file_path string, "
                "content int, partition string, stats string, "
                "equality_ids string")
    if not manifests:
        return meta_df(spark, [], schema_s)
    n_slices = min(len(manifests), 64)

    def parse(paths):
        from dremio_oss_spark.sources.avro_codec import (
            read_avro_file as rd)

        for p in paths:
            for e in rd(p):
                d = e["data_file"]
                eq = d.get("equality_ids")
                yield (p, int(e["status"]), d["file_path"],
                       int(d.get("content") or 0),
                       json.dumps(d.get("partition") or {}),
                       d.get("stats_json"),
                       json.dumps(list(eq)) if eq is not None else None)

    rdd = spark.sparkContext.parallelize(manifests, n_slices) \
        .mapPartitions(parse)
    return spark.createDataFrame(rdd, schema_s)


def iceberg_live_files_df(spark: SparkSession, table: str,
                          snapshot_id: int | None = None) -> DataFrame:
    """Live DATA files of a snapshot (existing/added entries, content=0)
    — distributed twin of `resolve_snapshot(...).files`."""
    from .iceberg import _STATUS_DELETED

    df = iceberg_manifest_entries_df(spark, table, snapshot_id)
    return (df.where(F.col("status") != F.lit(int(_STATUS_DELETED)))
            .where(F.col("content") == 0)
            .select("file_path", "partition", "stats"))


def _prune_iceberg_entries(df: DataFrame, spec_fields: list[dict],
                           default_spec_id: int,
                           equality: dict[str, object]) -> DataFrame:
    """The transform/spec-evolution/stats pruning rules as DataFrame
    filters over (file_path, partition, stats) rows — shared by the
    standalone distributed planner and the engine's in-scan switch."""
    from .iceberg import transform_value

    required: dict[str, object] = {}
    for pf in spec_fields:
        if pf["source"] in equality:
            required[pf["name"]] = transform_value(
                pf, equality[pf["source"]])
    ident = {pf["name"] for pf in spec_fields
             if pf["transform"] == "identity"}

    pv = F.from_json("partition", "map<string,string>")
    df = df.withColumn("__pv", pv)

    def pv_eq(key: str, v) -> "F.Column":
        # numeric-tolerant like _pv_eq: compare as doubles when BOTH
        # sides parse ('2' matches '2.0'), else string-exact
        col = F.col("__pv").getItem(key)
        lit = F.lit(str(v))
        both_num = (col.try_cast("double").isNotNull()
                    & lit.try_cast("double").isNotNull())
        return F.when(both_num,
                      col.try_cast("double") == lit.try_cast("double")
                      ).otherwise(col == lit)

    is_current = (F.coalesce(F.col("__pv").getItem("__spec_id"),
                             F.lit("0")).cast("int")
                  == F.lit(int(default_spec_id)))
    for k, v in required.items():
        # current-spec files prune on every transformed field; files
        # written under an OLDER spec only on identity fields (their
        # hidden-transform math differs — same soundness rule as the
        # Python planner)
        cond = pv_eq(k, v)
        if k not in ident:
            cond = (~is_current) | cond
        df = df.where(cond)
    for c, v in equality.items():
        mn = F.get_json_object("stats", f"$.minValues.{c}")
        mx = F.get_json_object("stats", f"$.maxValues.{c}")
        df = df.where(_stats_keep_col(mn, mx, v,
                                      _str_bound_col(F.col("stats"), c)))
    return df.drop("__pv")


def iceberg_plan_files_distributed(
        spark: SparkSession, table: str, equality: dict[str, object],
        snapshot_id: int | None = None) -> DataFrame:
    """Distributed twin of `plan_iceberg_scan`'s pruning: the same
    transform/spec-evolution/stats rules applied as DataFrame filters
    over the parallel manifest scan.  Returns surviving
    (file_path, partition, stats) rows.  Spec context comes from the
    metadata JSON only (`_snapshot_meta`) — no driver-side manifest
    replay anywhere on this path."""
    from .iceberg import _snapshot_meta

    sm = _snapshot_meta(table, snapshot_id)
    df = iceberg_live_files_df(spark, table, sm.sid)
    return _prune_iceberg_entries(df, sm.spec_fields,
                                  sm.default_spec_id, equality)
