"""Delta Lake table reader — transaction-log parsing, no delta jars.

Reference: dremio-oss reads Delta tables by parsing the table's own
transaction log rather than embedding delta-core
(`exec/store/deltalake/DeltaLakeFormatPlugin.java`,
`DeltaLakeScanPrel.java:86`, log parsing in
`exec/store/deltalake/DeltaMetadataFetchJob.java`).  Same approach here:

- `_delta_log/NNNN.json` commits hold `protocol` / `metaData` / `add` /
  `remove` actions (public Delta protocol, delta.io PROTOCOL.md);
- an optional parquet checkpoint (`_last_checkpoint`) compacts actions
  up to some version;
- the live file set at version V = adds minus removes, replayed in
  order; the schema is `metaData.schemaString`, which IS a Spark
  StructType JSON — no translation needed.

Scale: the log is table *metadata* (MBs for PB-scale tables) and every
Delta reader materializes it at plan time; the data files themselves are
read by Spark's parquet source with the usual pushdown/pruning.
Partition values are reconstructed per `add.partitionValues`, grouped so
one `spark.read` happens per distinct partition tuple (Delta's
dir-layout is not guaranteed hive-style, so basePath inference is not
relied on).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"


def is_delta_table(path: str) -> bool:
    return os.path.isdir(os.path.join(path, _LOG_DIR))


def _commit_files(path: str) -> list[tuple[int, str]]:
    """(version, path) of JSON commits, version order."""
    log = os.path.join(path, _LOG_DIR)
    out = []
    for fn in os.listdir(log):
        if fn.endswith(".json") and fn[:-5].isdigit():
            out.append((int(fn[:-5]), os.path.join(log, fn)))
    return sorted(out)


def _last_checkpoint(path: str) -> int | None:
    p = os.path.join(path, _LOG_DIR, "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["version"])


def _checkpoint_actions(spark: SparkSession, path: str, version: int) -> list[dict]:
    """Read a classic single-file checkpoint parquet into action dicts."""
    cp = os.path.join(
        path, _LOG_DIR, f"{version:020d}.checkpoint.parquet"
    )
    rows = spark.read.parquet(cp).toJSON().collect()  # checkpoint is metadata-sized
    return [json.loads(r) for r in rows]


class DeltaSnapshot:
    """Resolved table state at one version: schema + live files."""

    def __init__(self, version: int, schema: StructType | None,
                 partition_cols: list[str],
                 files: dict[str, dict]):
        self.version = version
        self.schema = schema
        self.partition_cols = partition_cols
        self.files = files  # rel path -> partitionValues dict


def resolve_snapshot(spark: SparkSession, path: str,
                     version: int | None = None) -> DeltaSnapshot:
    """Replay the log (checkpoint + JSON commits) up to `version`."""
    commits = _commit_files(path)
    if not commits:
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR} commits): {path}")
    max_v = commits[-1][0] if version is None else version
    known = {v for v, _ in commits}
    if version is not None and version not in known:
        raise FileNotFoundError(f"no Delta version {version} in {path}")

    actions: list[dict] = []
    cp_v = _last_checkpoint(path)
    start_v = 0
    if cp_v is not None and cp_v <= max_v:
        actions.extend(_checkpoint_actions(spark, path, cp_v))
        start_v = cp_v + 1
    for v, fp in commits:
        if start_v <= v <= max_v:
            with open(fp) as f:
                actions.extend(json.loads(ln) for ln in f if ln.strip())

    schema: StructType | None = None
    partition_cols: list[str] = []
    files: dict[str, dict] = {}
    for a in actions:
        if a.get("metaData"):
            md = a["metaData"]
            schema = StructType.fromJson(json.loads(md["schemaString"]))
            partition_cols = list(md.get("partitionColumns") or [])
        elif a.get("add"):
            ad = a["add"]
            files[ad["path"]] = ad.get("partitionValues") or {}
        elif a.get("remove"):
            files.pop(a["remove"]["path"], None)
    return DeltaSnapshot(max_v, schema, partition_cols, files)


def read_delta(spark: SparkSession, path: str,
               version: int | None = None) -> DataFrame:
    """SELECT * FROM delta table [VERSION AS OF n].

    One spark.read per distinct partition-value tuple (partition columns
    live in the log, not the files), unioned by name; unpartitioned
    tables are a single multi-file read.  Filters/projections push into
    each parquet scan as usual.
    """
    snap = resolve_snapshot(spark, path, version)
    if not snap.files:
        if snap.schema is None:
            raise ValueError(f"Delta table {path} has no schema action")
        return spark.createDataFrame([], snap.schema)

    data_fields = [
        f for f in (snap.schema.fields if snap.schema else [])
        if f.name not in snap.partition_cols
    ]
    data_schema = StructType(data_fields) if data_fields else None

    if not snap.partition_cols:
        paths = [os.path.join(path, p) for p in snap.files]
        r = spark.read
        if data_schema is not None:
            r = r.schema(data_schema)
        return r.parquet(*paths)

    by_part: dict[tuple, list[str]] = {}
    for rel, pv in snap.files.items():
        key = tuple(pv.get(c) for c in snap.partition_cols)
        by_part.setdefault(key, []).append(os.path.join(path, rel))
    parts: list[DataFrame] = []
    ptypes = {
        f.name: f.dataType.simpleString()
        for f in (snap.schema.fields if snap.schema else [])
    }
    for key, paths in sorted(by_part.items()):
        r = spark.read
        if data_schema is not None:
            r = r.schema(data_schema)
        df = r.parquet(*paths)
        for c, v in zip(snap.partition_cols, key):
            # partitionValues are strings in the log; cast to the
            # declared type (null encoded as missing/None)
            df = df.withColumn(
                c, F.lit(v).cast(ptypes.get(c, "string"))
            )
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delta_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY: one row per commit (version + commitInfo)."""
    out = []
    for v, fp in _commit_files(path):
        info = {}
        with open(fp) as f:
            for ln in f:
                a = json.loads(ln) if ln.strip() else {}
                if a.get("commitInfo"):
                    info = a["commitInfo"]
                    break
        out.append({"version": v, "operation": info.get("operation"),
                    "timestamp": info.get("timestamp")})
    return out
