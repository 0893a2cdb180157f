"""ANALYZE TABLE statistics: per-column rowcount/nulls/ndv/min/max.

Reference: dremio-oss `exec/store/sys/statistics/StatisticsService.java`
(ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS; HLL for ndv, t-digest
for histograms) feeding the cost model (`exec/planner/cost/DremioCost.java:23`,
RelMdDistinctRowCount).

Spark-first: one distributed aggregation computes every column's stats in
a single pass (no per-column scans).  `ndv_approx` is HLL
(approx_count_distinct) exactly like the reference; `ndv_exact` is also
emitted at test scale for oracle comparison.  For catalog tables the same
numbers would flow into Spark CBO via ANALYZE TABLE; here they land in a
stats DataFrame/store the engine's sys.statistics view serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def analyze_table(df: DataFrame, columns: list[str] | None = None,
                  exact_ndv: bool = True) -> DataFrame:
    """One row per analyzed column: n_rows, n_nulls, ndv(+exact), min, max.

    Single aggregation pass over the table — all columns' accumulators run
    in the same stage (the reference likewise batches all requested
    columns into one ANALYZE job).

    `exact_ndv=False` (the ENGINE's ANALYZE path) skips the per-column
    exact-distinct branches — the reference stores HLL NDV only; the
    exact pass exists for oracle comparison at test scale and would be
    one extra shuffle per column at 100 TB.  ndv_exact then mirrors the
    HLL estimate so the output schema stays stable.
    """
    cols = columns or df.columns
    # a single-file table arrives as ONE input split; fan out first so
    # partial aggregation parallelizes (on a real lake the scan is
    # already wide and this repartition is unnecessary but harmless)
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    df = df.repartition(n_part)
    # TWO plan shapes, deliberately:
    # 1. everything non-distinct (count/nulls/HLL-ndv/min/max for ALL
    #    columns) in ONE single-pass aggregate — no Expand;
    # 2. exact NDV as one narrow two-phase distinct per column, unioned
    #    into a single job.  Multiple count_distinct in one agg would
    #    Expand the FULL row width x (n_cols+1); per-column branches
    #    each scan (column-pruned) and shuffle only their own values.
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
            F.approx_count_distinct(c).alias(f"_ndv_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    base_df = df.agg(*aggs)
    row = base_df.collect()[0]
    if exact_ndv:
        ndv_branches = [
            df.groupBy().agg(F.count_distinct(c).alias("ndvx")).select(
                F.lit(c).alias("c"), "ndvx"
            )
            for c in cols
        ]
        ndv_df = ndv_branches[0]
        for b in ndv_branches[1:]:
            ndv_df = ndv_df.unionByName(b)
        ndvx = {r["c"]: r["ndvx"] for r in ndv_df.collect()}
    else:
        ndvx = {c: row[f"_ndv_{c}"] for c in cols}
    out = [
        (
            c,
            row["_n_rows"],
            row[f"_nulls_{c}"],
            row[f"_ndv_{c}"],
            ndvx[c],
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column_name string, n_rows bigint, n_nulls bigint, "
        "ndv_approx bigint, ndv_exact bigint, min_value string, max_value string",
    )


# percentiles the reference's t-digest histograms serve to the planner
# (range-predicate selectivity needs tails + quartiles)
DEFAULT_PERCENTILES = (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def analyze_histogram(df: DataFrame, columns: list[str] | None = None,
                      percentiles: tuple[float, ...] = DEFAULT_PERCENTILES,
                      accuracy: int = 1_000_000) -> DataFrame:
    """Quantile histogram per numeric/temporal column — the engine-side
    analog of the reference's t-digest column histograms
    (`exec/expr/fn/tdigest/TDigest.java:32`, collected by
    `StatisticsService.java` and consumed for range-predicate
    selectivity in `RelMdDistinctRowCount.java`).

    Spark-first: `percentile_approx` IS Spark's mergeable quantile
    sketch (Greenwald-Khanna; same role as t-digest — bounded-memory,
    partial-aggregable, so the sketch merges across 1000 executors
    without a global sort).  All requested columns run in ONE
    aggregation pass.  At `accuracy` >= the row count the result is
    exact (== DuckDB quantile_disc), which is what the oracle checks;
    at 100 TB the same plan degrades gracefully to approximate.

    Returns long-format rows: (column_name, percentile, value)."""
    num_kinds = ("int", "bigint", "smallint", "tinyint", "double",
                 "float", "decimal")
    temporal_kinds = ("date", "timestamp")
    cols: list[str] = []
    exprs: dict[str, str] = {}
    for f in df.schema.fields:
        if columns is not None and f.name not in columns:
            continue
        kind = f.dataType.simpleString()
        if kind.startswith(num_kinds):
            cols.append(f.name)
            exprs[f.name] = f"cast({f.name} as double)"
        elif kind.startswith(temporal_kinds):
            # temporal histograms sketch epoch micros (the reference's
            # t-digest likewise stores temporal values numerically);
            # NTZ/date route through timestamp_ltz — double can't hold
            # them directly
            cols.append(f.name)
            exprs[f.name] = (f"cast(unix_micros(cast({f.name} as "
                             "timestamp_ltz)) as double)")
    if not cols:
        return df.sparkSession.createDataFrame(
            [], "column_name string, percentile double, value double")
    pct = list(percentiles)
    pct_sql = ", ".join(repr(p) for p in pct)
    aggs = [
        F.expr(f"percentile_approx({exprs[c]}, "
               f"array({pct_sql}), {accuracy})").alias(c)
        for c in cols
    ]
    row = df.agg(*aggs).collect()[0]
    out = [
        (c, float(p), None if row[c] is None else float(row[c][i]))
        for c in cols
        for i, p in enumerate(pct)
    ]
    return df.sparkSession.createDataFrame(
        out, "column_name string, percentile double, value double")
