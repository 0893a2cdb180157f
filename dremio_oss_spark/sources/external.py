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
    ('sum(x)', 'median(v)') — enough for the degrade-to-scan projection.
    String literals are stripped first so their CONTENTS are never
    mistaken for columns (`case when status = 'F' ...` must not
    project a column named F)."""
    import re

    expr = re.sub(r"'(?:[^']|'')*'", " ", expr)
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
    """A named external engine reachable by SQL passthrough.

    Execution path is capability-gated (the reference's JDBC storage
    plugin only activates when its driver is present): when `jdbc_url`
    is given AND the driver class loads in the Spark JVM, every rendered
    query ships over **real JDBC** (`spark.read.format('jdbc')` with the
    `query` pushdown option — Spark executes the statement remotely and
    streams the resultset); otherwise execution degrades to the
    in-process DuckDB emulation.  `last_execution_path` records which
    path ran ("jdbc" or "emulated[:reason]") so tests and EXPLAIN-style
    tooling can assert the wiring, mirroring how `last_pushed_sql`
    records what was shipped."""

    def __init__(self, spark: SparkSession, name: str,
                 attach: dict[str, str], dialect=None,
                 jdbc_url: str | None = None,
                 jdbc_driver: str | None = None,
                 jdbc_table_map: dict[str, str] | None = None):
        """attach: table name -> parquet path registered in the external DB
        (stands in for the remote catalog).  `dialect` is the source's
        ARP descriptor (defaults to the DuckDB dialect).

        jdbc_url/jdbc_driver: remote endpoint + driver class; the real
        path activates only if the class resolves in the JVM.
        jdbc_table_map: SQL fragment substituted for each attached table
        name in shipped statements (a remote engine has its own catalog;
        for a DuckDB endpoint the attached parquet becomes
        `read_parquet('<path>')` automatically)."""
        import duckdb

        from .arp import DUCKDB_DIALECT

        self.spark = spark
        self.name = name
        self.dialect = dialect or DUCKDB_DIALECT
        self.jdbc_url = jdbc_url
        self.jdbc_driver = jdbc_driver
        self.last_execution_path: str | None = None
        if jdbc_table_map is None and jdbc_url \
                and jdbc_url.startswith("jdbc:duckdb"):
            # alias each substitution back to the table name so
            # table-qualified column references (orders.o_custkey)
            # still resolve on the remote side
            jdbc_table_map = {
                t: f"read_parquet('{p}') as {t}"
                for t, p in attach.items()}
        self._jdbc_table_map = jdbc_table_map or {}
        self._jdbc_ok = False
        if jdbc_url:
            if not jdbc_driver:
                self._gate_reason = "no-driver-class"
            else:
                try:
                    # Spark's Utils.classForName resolves through the
                    # session's mutable classloader (spark.jars /
                    # --jars), which plain java.lang.Class.forName over
                    # py4j does not see
                    spark._jvm.org.apache.spark.util.Utils.classForName(
                        jdbc_driver, True, False)
                    self._jdbc_ok = True
                    self._gate_reason = None
                except Exception:  # noqa: BLE001 — class not on classpath
                    self._gate_reason = "driver-missing"
        else:
            self._gate_reason = "no-url"
        self._con = duckdb.connect()
        for t, p in attach.items():
            self._con.execute(
                f"create view {t} as select * from read_parquet('{p}')"
            )

    def _remote_sql(self, sql: str) -> str:
        """Rewrite attached table names to the remote catalog's form.
        String literals are protected (a WHERE value that happens to
        equal a table name must not be rewritten), and qualified column
        references (t.col) are left alone — the substitution fragment
        aliases itself back to the table name so they still resolve."""
        import re

        kw = {"where", "group", "order", "join", "on", "left", "right",
              "inner", "cross", "full", "union", "limit", "having",
              "as", "using", "and", "or", "when", "then", "select",
              "from", "natural", "except", "intersect", "window"}
        parts = re.split(r"('(?:[^']|'')*')", sql)  # literal-aware split
        for i, seg in enumerate(parts):
            if i % 2 == 1:  # inside a quoted literal
                continue
            for t, frag in self._jdbc_table_map.items():
                # a user alias after the table ref (`from orders o`)
                # must SUPPRESS the fragment's self-alias — emitting
                # `... as orders o` double-aliases and every RDBMS
                # rejects it.  The fragment's trailing `as <t>` is
                # recognized and dropped when the query supplies one.
                m_self = re.fullmatch(
                    rf"(.*?)\s+as\s+{re.escape(t)}", frag, re.I | re.S)
                base = m_self.group(1) if m_self else frag

                def repl(m, f=frag, b=base):
                    tail = m.group("alias")
                    if tail and tail.lower() not in kw:
                        return f"{b} {m.group('full_alias')}"
                    return f + (m.group("full_alias") or "")

                seg = re.sub(
                    rf'(?:(?<![\w./]){re.escape(t)}|"{re.escape(t)}")'
                    rf'(?![\w."])'
                    rf'(?P<full_alias>\s+(?:as\s+)?'
                    rf'(?P<alias>[A-Za-z_]\w*))?',
                    repl, seg)
            parts[i] = seg
        return "".join(parts)

    def external_query(self, sql: str) -> DataFrame:
        """table(<source>.external_query('<sql>')): run remotely, scan the
        result.  Real JDBC when the driver gate passed; emulated
        otherwise (DuckDB -> Arrow table -> Spark)."""
        if self._jdbc_ok:
            self.last_execution_path = "jdbc"
            return (self.spark.read.format("jdbc")
                    .option("url", self.jdbc_url)
                    .option("driver", self.jdbc_driver)
                    .option("query", self._remote_sql(sql))
                    .load())
        self.last_execution_path = (
            "emulated" if self._gate_reason in (None, "no-url")
            else f"emulated:{self._gate_reason}")
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
        and is recorded on `last_partition_queries`.

        On the real-JDBC path this maps to Spark's native partitioned
        JDBC scan (partitionColumn/lowerBound/upperBound/numPartitions —
        one remote connection PER SLICE, fully parallel executors, the
        same unbounded-first/last-slice semantics)."""
        import math

        num_partitions = max(1, num_partitions)
        if self._jdbc_ok:
            # Spark's partitioned JDBC scan needs the partition column
            # in the subquery's schema; add it when the projection
            # doesn't carry it and drop it again after the load
            cols = columns
            added_part_col = (columns is not None
                              and partition_column not in columns)
            if added_part_col:
                cols = list(columns) + [partition_column]
            base = self.dialect.render(table, cols, predicate, None)
            self.last_execution_path = "jdbc"
            self.last_partition_queries = [base]
            df = (self.spark.read.format("jdbc")
                  .option("url", self.jdbc_url)
                  .option("driver", self.jdbc_driver)
                  .option("dbtable", f"({self._remote_sql(base)}) arp_sub")
                  .option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower))
                  .option("upperBound", str(upper))
                  .option("numPartitions", str(num_partitions))
                  .load())
            return df.drop(partition_column) if added_part_col else df
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
