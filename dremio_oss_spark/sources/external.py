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


def _expr_cols(expr: str) -> list[str]:
    """Column identifiers referenced by a simple aggregate expression
    ('sum(x)', 'median(v)') — enough for the degrade-to-scan projection."""
    import re

    out = []
    for tok in re.findall(r"[A-Za-z_]\w*", expr):
        if tok.lower() not in {"sum", "count", "min", "max", "avg",
                               "stddev", "median", "distinct", "case",
                               "when", "then", "else", "end", "and",
                               "or", "not", "null", "as", "cast",
                               "decimal", "double", "bigint", "int",
                               "integer", "float", "varchar", "string",
                               "date", "timestamp", "boolean"}:
            out.append(tok)
    return out


class ExternalSource:
    """A named external engine reachable by SQL passthrough."""

    def __init__(self, spark: SparkSession, name: str,
                 attach: dict[str, str], dialect=None):
        """attach: table name -> parquet path registered in the external DB
        (stands in for the remote catalog).  `dialect` is the source's
        ARP descriptor (defaults to the DuckDB dialect)."""
        import duckdb

        from .arp import DUCKDB_DIALECT

        self.spark = spark
        self.name = name
        self.dialect = dialect or DUCKDB_DIALECT
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
        The generated SQL is rendered through the source's ARP dialect
        (`sources/arp.py` — quoting, LIMIT style, function map) and
        recorded on `self.last_pushed_sql` so tests (and EXPLAIN-style
        tooling) can assert what was shipped.  An aggregate the dialect
        does NOT support degrades the pushdown to project+filter and
        Spark runs the aggregation locally (the ARP split:
        `self.last_pushdown_level` records "aggregate" vs "scan").
        """
        if (aggregate is not None
                and not self.dialect.agg_supported(aggregate[1])):
            keys, measures = aggregate
            need = list(dict.fromkeys(
                keys + [c for e in measures.values()
                        for c in _expr_cols(e)]))
            sql = self.dialect.render(table, need, predicate, None)
            self.last_pushed_sql = sql
            self.last_pushdown_level = "scan"
            df = self.external_query(sql)
            from pyspark.sql import functions as F

            return df.groupBy(*keys).agg(*[
                F.expr(expr).alias(alias)
                for alias, expr in measures.items()])
        sql = self.dialect.render(table, columns, predicate, aggregate)
        self.last_pushed_sql = sql
        self.last_pushdown_level = (
            "aggregate" if aggregate is not None else "scan")
        return self.external_query(sql)

    def read_partitioned(self, table: str, partition_column: str,
                         lower: int, upper: int, num_partitions: int,
                         columns: list[str] | None = None,
                         predicate: str | None = None) -> DataFrame:
        """`spark.read.jdbc(partitionColumn, lowerBound, upperBound,
        numPartitions)`-style parallel range read: the key range splits
        into strides and each stride ships as its own remote query, so
        no single resultset exceeds a slice — the pattern for LARGE
        external tables (the single-query `read()` path is for
        dimension-sized results).  Boundary semantics mirror Spark's
        JDBC source: the first slice is unbounded below, the last
        unbounded above, so rows outside [lower, upper] still arrive
        exactly once.  The per-slice SQL ships through the ARP dialect
        and is recorded on `last_partition_queries`."""
        import math

        num_partitions = max(1, num_partitions)
        stride = math.ceil(max(1, upper - lower + 1) / num_partitions)
        out = None
        sqls: list[str] = []
        for i in range(num_partitions):
            lo = lower + i * stride
            hi = lo + stride - 1
            if num_partitions == 1:
                pred = None
            elif i == 0:
                pred = (f"({partition_column} <= {hi} "
                        f"or {partition_column} is null)")
            elif i == num_partitions - 1:
                pred = f"{partition_column} >= {lo}"
            else:
                pred = f"{partition_column} between {lo} and {hi}"
            if predicate:
                pred = (f"({predicate})" if pred is None
                        else f"{pred} and ({predicate})")
            sql = self.dialect.render(table, columns, pred, None)
            sqls.append(sql)
            part = self.external_query(sql)
            out = part if out is None else out.unionByName(part)
        self.last_partition_queries = sqls
        return out

    def close(self) -> None:
        self._con.close()
