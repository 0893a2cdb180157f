"""Hive-metastore-style catalog — partition registry + plan-time pruning.

Reference: dremio-oss `plugins/hive2` / `plugins/hive3` — tables live in
a metastore that maps partition VALUES to storage LOCATIONS; the planner
asks the metastore for partitions surviving the query's partition
predicate (`HivePartitionPruning` via `PruneScanRule`) and only then
builds scans over the surviving locations.  Glue (`plugins/awsglue`) is
the same catalog protocol with a different transport.

No metastore service exists in this container, so the catalog is an
in-process registry; the part that matters for the engine — pruning
happens against partition METADATA before any data file is opened, and
the scan is assembled from the surviving locations only — is real and
asserted (`last_scanned` / `last_pruned`).

Scale: a metastore answers partition listings from its own store (here a
dict; in Hive an RDBMS) — pruning cost is proportional to partition
count, never to data size.  The per-partition reads are plain parquet
scans with normal pushdown; partition columns are attached from catalog
values, as Hive's serde does (values are not stored in the files).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HiveMetastore:
    """Table -> (partition values -> location) registry."""

    def __init__(self):
        self._tables: dict[str, dict] = {}
        self.last_scanned = 0
        self.last_pruned = 0

    def create_table(self, name: str,
                     partition_cols: list[str] | None = None) -> None:
        self._tables[name] = {
            "partition_cols": list(partition_cols or []),
            "partitions": [],  # (values dict, location)
            "location": None,
        }

    def set_location(self, name: str, location: str) -> None:
        """Unpartitioned table: a single storage location."""
        self._tables[name]["location"] = location

    def add_partition(self, name: str, values: dict[str, str],
                      location: str) -> None:
        t = self._tables[name]
        missing = set(t["partition_cols"]) - set(values)
        if missing:
            raise ValueError(f"partition values missing {missing}")
        t["partitions"].append((dict(values), location))

    def table(self, name: str) -> dict:
        return self._tables[name]

    def prune(self, name: str,
              predicate: Callable[[dict], bool] | None) -> list[tuple[dict, str]]:
        """Partition listing with pushdown: the predicate runs over
        catalog metadata only."""
        parts = self.table(name)["partitions"]
        kept = [p for p in parts if predicate is None or predicate(p[0])]
        self.last_scanned = len(kept)
        self.last_pruned = len(parts) - len(kept)
        return kept


def read_hive_table(spark: SparkSession, ms: HiveMetastore, name: str,
                    partition_filter: Callable[[dict], bool] | None = None
                    ) -> DataFrame:
    """Scan a metastore table: prune partitions in the catalog, then read
    only surviving locations; partition columns come from catalog values."""
    t = ms.table(name)
    if not t["partition_cols"]:
        return spark.read.parquet(t["location"])
    kept = ms.prune(name, partition_filter)
    if not kept:
        # zero surviving partitions is a normal query outcome: an EMPTY
        # frame with the table's schema, not an error
        any_loc = t["partitions"][0][1] if t["partitions"] else None
        if any_loc is None:
            raise ValueError(f"{name} has no partitions to infer a "
                             "schema from")
        probe = spark.read.parquet(any_loc)
        for c in t["partition_cols"]:
            probe = probe.withColumn(c, F.lit(None).cast("string"))
        return probe.limit(0)
    parts: list[DataFrame] = []
    for values, location in sorted(kept, key=lambda kv: str(kv[0])):
        df = spark.read.parquet(location)
        for c in t["partition_cols"]:
            df = df.withColumn(c, F.lit(values[c]))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
