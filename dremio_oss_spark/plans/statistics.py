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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..localframe import meta_df

# percentiles the reference's t-digest histograms serve to the planner
# (range-predicate selectivity needs tails + quartiles)
DEFAULT_PERCENTILES = (0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)

_STATS_SCHEMA = (
    "column_name string, n_rows bigint, n_nulls bigint, "
    "ndv_approx bigint, ndv_exact bigint, min_value string, "
    "max_value string"
)
_HIST_SCHEMA = "column_name string, percentile double, value double"


def _parse_bytes(v: str) -> int:
    """Spark size conf ('134217728', '128m', '128MB') -> bytes."""
    s = v.strip().lower()
    for suf, mult in (("kb", 1 << 10), ("k", 1 << 10), ("mb", 1 << 20),
                      ("m", 1 << 20), ("gb", 1 << 30), ("g", 1 << 30),
                      ("b", 1)):
        if s.endswith(suf):
            return int(float(s[:-len(suf)])) * mult
    return int(s)


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition ONLY a narrow input (single-file test fixture) so
    the partial aggregation parallelizes.  A real lake scan is already
    wider than the core count — repartitioning there would shuffle the
    ENTIRE table before a partial aggregate that is already parallel
    per input split (at 100 TB: a 100 TB shuffle for nothing), so wide
    inputs pass through untouched and the aggregate's map side runs on
    the scan partitions directly."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # decide width WITHOUT materializing the RDD lineage
    # (df.rdd.getNumPartitions() builds the whole RDD DAG just to count
    # splits — driver-side planning cost paid on every ANALYZE of a
    # wide lake scan).  Reproduce Spark's own split arithmetic
    # (FilePartition.maxSplitBytes: bytesPerCore over openCost-adjusted
    # totals) from the resolved file list instead — file COUNT alone is
    # no proxy in either direction, since bin-packing merges small
    # files (300 x 1 MB -> a few splits) and splitting divides large
    # ones (3 x 10 GB -> hundreds).  Stat cost is capped: more than 10k
    # files IS a wide lake scan.
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file relation (VALUES, view)
        files = []
    if len(files) > 10_000:
        return df
    spark = df.sparkSession
    max_pb = _parse_bytes(spark.conf.get(
        "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)))
    open_cost = _parse_bytes(spark.conf.get(
        "spark.sql.files.openCostInBytes", str(4 * 1024 * 1024)))
    parallelism = int(spark.conf.get(
        "spark.sql.files.minPartitionNum",
        str(spark.sparkContext.defaultParallelism)))
    adjusted = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else f
        try:
            adjusted += os.path.getsize(p) + open_cost
        except OSError:  # remote FS path: assume a full split per file
            adjusted += max_pb
    bytes_per_core = adjusted // max(parallelism, 1)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    est_splits = (adjusted + max_split - 1) // max(max_split, 1)
    if est_splits < n_part:
        return df.repartition(n_part)
    return df


def _stats_aggs(cols: list[str]) -> list:
    """Accumulators for the non-distinct stats of ALL columns — one
    single-pass aggregate, no Expand (multiple count_distinct in one
    agg would Expand the full row width x (n_cols+1))."""
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .alias(f"_nulls_{c}"),
            F.approx_count_distinct(c).alias(f"_ndv_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    return aggs


# cast-to-string is injective for these types (JVM rendering
# round-trips numerics; dates/timestamps format canonically), so
# per-column string distinctness == native distinctness.  Exact names
# plus the parameterized prefixes — a bare prefix match would route
# e.g. `interval ...` down this path via the "int" prefix.
_NDV_STRINGABLE_EXACT = frozenset({
    "int", "bigint", "smallint", "tinyint", "double", "float",
    "string", "date", "timestamp", "timestamp_ntz", "boolean"})
_NDV_STRINGABLE_PARAM = ("decimal(", "varchar(", "char(")


def _ndv_stringable(simple: str) -> bool:
    return (simple in _NDV_STRINGABLE_EXACT
            or simple.startswith(_NDV_STRINGABLE_PARAM))


def _exact_ndv(df: DataFrame, cols: list[str]) -> dict:
    """Exact NDV for ALL columns in one pass: explode each row to
    narrow (column_index, value-as-string) pairs, then a two-shuffle
    distinct-count grouped by column index.  The previous shape — one
    two-phase distinct per column, unioned — read the table k times and
    ran k+1 AQE stages (9 jobs for 4 columns); this is ONE scan of just
    the analyzed columns and one action regardless of k.  The exploded
    exchange is k×N narrow rows — the same total bytes the k separate
    shuffles carried.  Columns whose type does not render injectively
    to string (binary, arrays, maps) keep the per-column branch."""
    stringable = [
        c for c in cols
        if _ndv_stringable(df.schema[c].dataType.simpleString())
    ]
    out: dict = {}
    if stringable:
        def _as_str(c: str):
            # float/double: normalize signed zero first — native
            # distinct aggregation folds -0.0 into 0.0, but the string
            # renderings '0.0'/'-0.0' differ (+0.0 preserves NaN and
            # every other value; float->double->string stays injective)
            t = df.schema[c].dataType.simpleString()
            col = F.col(c) + F.lit(0.0) if t in ("float", "double") \
                else F.col(c)
            return col.cast("string")

        pairs = df.select(F.posexplode(F.array(
            *[_as_str(c) for c in stringable]
        )).alias("_i", "_v"))
        ndv = (pairs.groupBy("_i")
               .agg(F.count_distinct("_v").alias("ndvx")))
        got = {r["_i"]: r["ndvx"] for r in ndv.collect()}
        # a column of ALL nulls produces no non-null pairs -> ndv 0
        out.update({c: int(got.get(i, 0))
                    for i, c in enumerate(stringable)})
    rest = [c for c in cols if c not in out]
    if rest:
        branches = [
            df.groupBy().agg(F.count_distinct(c).alias("ndvx")).select(
                F.lit(c).alias("c"), "ndvx")
            for c in rest
        ]
        ndv_df = branches[0]
        for b in branches[1:]:
            ndv_df = ndv_df.unionByName(b)
        out.update({r["c"]: r["ndvx"] for r in ndv_df.collect()})
    return out


def _hist_exprs(df: DataFrame,
                columns: list[str] | None) -> tuple[list[str], dict]:
    """Numeric/temporal columns eligible for quantile histograms and
    their double-valued sketch inputs (temporal sketches epoch micros —
    the reference's t-digest likewise stores temporal values
    numerically; NTZ/date route through timestamp_ltz)."""
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
            cols.append(f.name)
            exprs[f.name] = (f"cast(unix_micros(cast({f.name} as "
                             "timestamp_ltz)) as double)")
    return cols, exprs


def _quantile_impl(df: DataFrame) -> str:
    """`spark.dremio.stats.quantile.impl`: `exact` (default) or
    `sketch`.  Exact is the DISTRIBUTED selection below — it returns
    the true quantile_disc value at ANY row count and is independent of
    input partitioning.  `sketch` keeps the single-agg Greenwald-Khanna
    path (percentile_approx): the knob for extreme-NDV columns at
    100 TB, where the exact path's per-column sorted prefix-sum over
    the distinct-value table is the classic hard case and a bounded-
    memory mergeable sketch is the right trade."""
    try:
        return (df.sparkSession.conf.get(
            "spark.dremio.stats.quantile.impl", "exact") or "exact").lower()
    except Exception:  # noqa: BLE001
        return "exact"


def _exact_quantiles(df: DataFrame, hcols: list[str], hexprs: dict,
                     pct: list[float]) -> dict:
    """Exact per-column quantiles in ONE distributed job, reproducing
    DuckDB's quantile_disc selection rule bit-for-bit: the answer for
    percentile q over n non-null values is the smallest value whose
    cumulative count >= clamp(ceil(q*n), 1, n) — validated against
    DuckDB across n in [1, 600572] with heavy ties (the ceil runs in
    IEEE double exactly like both engines' native arithmetic, so even
    the float edge cases — e.g. 0.1*100000 rounding UP — agree).

    Shape (guide §2): explode the analyzed columns to narrow
    (col_idx, value) pairs — ONE column-pruned scan for all columns —
    pre-aggregate to distinct (col_idx, value, count) rows (map-side
    partial combines the ties, so the shuffle carries at most the
    distinct-value table, not the corpus), then a per-column ordered
    prefix sum picks every percentile's row with a rank-window filter.
    No driver state, no G-K accumulator: the result is EXACT at any
    scale and — unlike percentile_approx at accuracy >= n, which is
    only rank-exact-ish and provably partition-DEPENDENT (measured:
    the same sf0.1 column yields 1952.46 on a 3-split scan and
    1952.85 fanned to 32) — deterministic under any partitioning.

    Decade measurement (r15, sf5 ≈ 30M rows, 3 columns, local[32]/8g):
    this exact path runs 28.1 s cold / 11.2 s warm, while the G-K
    sketch path (`quantile.impl=sketch`, accuracy=1e6) OOM-thrashes
    the 8 GB heap and never finishes — 32 concurrent ObjectHashAgg
    partials each retaining up to 1e6 samples x 3 columns.  The exact
    selection is therefore the right DEFAULT at scale too; the sketch
    escape hatch remains for the extreme-NDV regime but its accuracy
    knob must be sized to memory (retained samples ~ accuracy per
    partial per column), not left at the oracle-exactness setting.

    Returns {col: [value_or_None per percentile]} (a column with zero
    non-null rows yields all Nones, like the sketch path)."""
    from pyspark.sql.window import Window

    vals = (df.select(F.posexplode(F.array(
        *[F.expr(hexprs[c]) for c in hcols])).alias("_i", "_v"))
        .where(F.col("_v").isNotNull()))
    vc = vals.groupBy("_i", "_v").agg(F.count(F.lit(1)).alias("_c"))
    wcum = (Window.partitionBy("_i").orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy("_i")
    pidx = F.posexplode(F.array(*[F.lit(float(p)) for p in pct]))
    sel = (
        vc.withColumn("_cum", F.sum("_c").over(wcum))
        .withColumn("_n", F.sum("_c").over(wall))
        .select("_i", "_v", "_c", "_cum", "_n", pidx.alias("_j", "_p"))
        .withColumn("_r", F.least(
            F.col("_n"),
            F.greatest(F.lit(1).cast("long"),
                       F.ceil(F.col("_p") * F.col("_n")))))
        .where((F.col("_cum") >= F.col("_r"))
               & (F.col("_cum") - F.col("_c") < F.col("_r")))
        .select("_i", "_j", "_v")
    )
    got = {(r["_i"], r["_j"]): r["_v"] for r in sel.collect()}
    return {c: [got.get((i, j)) for j in range(len(pct))]
            for i, c in enumerate(hcols)}


def _decode_stats(row, cols: list[str], ndvx: dict) -> list[tuple]:
    return [
        (c, row["_n_rows"], row[f"_nulls_{c}"], row[f"_ndv_{c}"],
         ndvx[c], row[f"_min_{c}"], row[f"_max_{c}"])
        for c in cols
    ]


def analyze_full(df: DataFrame, columns: list[str] | None = None,
                 exact_ndv: bool = True,
                 percentiles: tuple[float, ...] = DEFAULT_PERCENTILES,
                 accuracy: int = 1_000_000
                 ) -> tuple[DataFrame, DataFrame]:
    """The engine's ANALYZE: column stats in ONE aggregation job plus
    (by default) ONE distributed exact-quantile job for the histograms
    — never a scan per artifact (the reference likewise batches a
    single ANALYZE statement's work, StatisticsService.java).

    Histogram quantiles default to the EXACT distributed selection
    (`_exact_quantiles` — bit-identical to DuckDB quantile_disc at any
    row count, partition-independent).  Under
    `spark.dremio.stats.quantile.impl=sketch` the old single-agg path
    runs instead: percentile_approx IS Spark's mergeable quantile
    sketch (Greenwald-Khanna; same role as t-digest — bounded memory,
    partial-aggregable, merges across 1000 executors without a global
    sort), the right trade for extreme-NDV columns at 100 TB.
    Measured motivation for the switch (sf0.1 lineitem, 3 columns,
    warm): the G-K accumulators at accuracy=1e6 cost 4.6 s on the
    fanned agg (their reduce-side merge is SEQUENTIAL in retained
    samples — 1.57/1.70/2.06/2.97/4.57 s at 3/4/8/16/32 partials) and
    were still only approximately rank-exact at 600k rows.
    Returns (stats_df, histogram_df)."""
    spark = df.sparkSession
    cols = columns or df.columns
    df = _fan_out(df)
    aggs = _stats_aggs(cols)
    hcols, hexprs = _hist_exprs(df, columns)
    pct = list(percentiles)
    exact_q = hcols and pct and _quantile_impl(df) == "exact"
    if hcols and pct and not exact_q:
        pct_sql = ", ".join(repr(p) for p in pct)
        aggs += [
            F.expr(f"percentile_approx({hexprs[c]}, "
                   f"array({pct_sql}), {accuracy})").alias(f"_pct_{c}")
            for c in hcols
        ]
    # the stats aggregation, the exact-quantile selection, and the
    # exact-NDV pass are INDEPENDENT jobs over the same frame: submit
    # them concurrently (guide §2.6 — actions are only sequential
    # because driver code calls them sequentially) so each job's
    # stage tail back-fills the others' idle slots.  Job COUNT is
    # unchanged; only the dead time between actions goes.
    # inheritable_thread_target propagates the job group/description.
    concurrent = str(spark.conf.get(
        "spark.dremio.stats.concurrentAnalyze", "true")).lower() == "true"
    if concurrent:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_row = pool.submit(inheritable_thread_target(
                lambda: df.agg(*aggs).collect()[0]))
            f_q = (pool.submit(inheritable_thread_target(
                       lambda: _exact_quantiles(df, hcols, hexprs, pct)))
                   if exact_q else None)
            f_ndv = (pool.submit(inheritable_thread_target(
                         lambda: _exact_ndv(df, cols)))
                     if exact_ndv else None)
            row = f_row.result()
            qvals = f_q.result() if f_q is not None else None
            ndvx = (f_ndv.result() if f_ndv is not None
                    else {c: row[f"_ndv_{c}"] for c in cols})
    else:
        row = df.agg(*aggs).collect()[0]
        qvals = _exact_quantiles(df, hcols, hexprs, pct) if exact_q else None
        ndvx = (_exact_ndv(df, cols) if exact_ndv
                else {c: row[f"_ndv_{c}"] for c in cols})
    stats_df = meta_df(spark,
        _decode_stats(row, cols, ndvx), _STATS_SCHEMA)
    if exact_q:
        hist_rows = [
            (c, float(p),
             None if qvals[c][i] is None else float(qvals[c][i]))
            for c in hcols
            for i, p in enumerate(pct)
        ]
    else:
        hist_rows = [
            (c, float(p),
             None if row[f"_pct_{c}"] is None else float(row[f"_pct_{c}"][i]))
            for c in hcols
            for i, p in enumerate(pct)
        ] if pct else []
    hist_df = meta_df(spark, hist_rows, _HIST_SCHEMA)
    return stats_df, hist_df


def analyze_table(df: DataFrame, columns: list[str] | None = None,
                  exact_ndv: bool = True) -> DataFrame:
    """One row per analyzed column: n_rows, n_nulls, ndv(+exact), min,
    max — a single aggregation pass over the table.

    `exact_ndv=False` (the ENGINE's ANALYZE path) skips the per-column
    exact-distinct branches — the reference stores HLL NDV only; the
    exact pass exists for oracle comparison at test scale and would be
    one extra shuffle per column at 100 TB.  ndv_exact then mirrors the
    HLL estimate so the output schema stays stable."""
    stats_df, _ = analyze_full(df, columns, exact_ndv=exact_ndv,
                               percentiles=())
    return stats_df


def analyze_histogram(df: DataFrame, columns: list[str] | None = None,
                      percentiles: tuple[float, ...] = DEFAULT_PERCENTILES,
                      accuracy: int = 1_000_000) -> DataFrame:
    """Quantile histogram per numeric/temporal column — the engine-side
    analog of the reference's t-digest column histograms
    (`exec/expr/fn/tdigest/TDigest.java:32`, collected by
    `StatisticsService.java` and consumed for range-predicate
    selectivity in `RelMdDistinctRowCount.java`).

    All requested columns run in ONE aggregation pass.  At `accuracy`
    >= the row count the result is exact (== DuckDB quantile_disc),
    which is what the oracle checks; at 100 TB the same plan degrades
    gracefully to approximate.

    Returns long-format rows: (column_name, percentile, value)."""
    spark = df.sparkSession
    cols, exprs = _hist_exprs(df, columns)
    if not cols:
        return meta_df(spark, [], _HIST_SCHEMA)
    pct = list(percentiles)
    if _quantile_impl(df) == "exact":
        qvals = _exact_quantiles(df, cols, exprs, pct)
        out = [
            (c, float(p),
             None if qvals[c][i] is None else float(qvals[c][i]))
            for c in cols
            for i, p in enumerate(pct)
        ]
        return meta_df(spark, out, _HIST_SCHEMA)
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
    return meta_df(spark, out, _HIST_SCHEMA)
