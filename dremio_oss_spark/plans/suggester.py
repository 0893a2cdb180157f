"""Reflection recommendation from workload shape + column statistics.

Reference: dremio-oss `services/accelerator/.../reflection/analysis/
ReflectionSuggester.java:56-74` — ranks candidate AGGREGATE reflections
for a dataset from its column statistics (low-cardinality columns become
dimensions, aggregated numerics become measures), fed by
`ReflectionAnalyzer` (gathers stats) and surfaced as recommendations the
user turns into `ALTER ... CREATE AGGREGATE REFLECTION` DDL.

Spark-first shape: the ENGINE records every aggregate-shaped SELECT it
plans (dataset, GROUP BY dims, measure calls, whether a reflection
already answered it) — recording is a regex over the statement text,
zero planning cost.  `suggest()` folds that log per dataset, drops
dimensions whose ANALYZE-known NDV is too high to roll up usefully (the
reference's cardinality cut), estimates the rollup reduction from the
stats store (rows / Π ndv(dims), capped at rows) and emits ranked,
replayable DDL.  Everything is metadata-sized: the workload log holds
parsed shapes, never results, so a million-query workload folds on the
driver in milliseconds.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from dataclasses import dataclass

# dimension is useful when its NDV is at most this fraction of the row
# count (ReflectionSuggester's low-cardinality cut)
MAX_DIM_NDV_RATIO = 0.2

_AGG_FNS = ("sum", "count", "avg", "min", "max",
            "approx_count_distinct", "count_distinct", "ndv")


@dataclass(frozen=True)
class AggWorkloadRecord:
    """One aggregate-shaped statement the engine planned."""

    dataset: str
    dims: tuple[str, ...]
    measures: tuple[tuple[str, str], ...]  # (fn, column|*)
    accelerated: bool


_SHAPE_RE = re.compile(
    r"\s*select\s+(.+?)\s+from\s+([\w.]+)"
    r"(?:\s+where\s+.+?)?(?:\s+group\s+by\s+(.+?))"
    r"(?:\s+order\s+by\s+.+?)?(?:\s+limit\s+\d+)?\s*;?\s*$",
    re.I | re.S)

_MEASURE_RE = re.compile(
    rf"\b({'|'.join(_AGG_FNS)})\s*\(\s*(?:distinct\s+)?(\w+|\*)\s*\)",
    re.I)


def parse_agg_shape(query: str) -> AggWorkloadRecord | None:
    """Statement text -> workload record, or None when the query isn't
    a single-table GROUP BY aggregate (joins/subqueries don't feed the
    per-dataset suggester; the reference's analyzer is likewise
    per-dataset)."""
    m = _SHAPE_RE.match(query)
    if m is None:
        return None
    sel, table, gb = m.group(1), m.group(2), m.group(3)
    if table.startswith("__") or table.lower().startswith(
            ("sys.", "information_schema.")):
        return None
    dims = tuple(d.strip() for d in gb.split(","))
    if not all(re.fullmatch(r"\w+", d) for d in dims):
        return None
    measures = tuple(
        (fn.lower().replace("count_distinct", "ndv")
         .replace("approx_count_distinct", "ndv"),
         col)
        for fn, col in _MEASURE_RE.findall(sel))
    if not measures:
        return None
    return AggWorkloadRecord(table, dims, measures, False)


def suggest(records: list[AggWorkloadRecord],
            stats: dict[str, dict] | None = None,
            max_dim_ndv_ratio: float = MAX_DIM_NDV_RATIO,
            top: int = 10) -> list[dict]:
    """Rank candidate aggregate reflections.

    One candidate per dataset: the union of grouped-by dimensions and
    aggregated measures across its UNACCELERATED aggregate queries —
    one rollup that answers the whole observed workload (extra dims
    only grow the cell count; `covers()` needs supersets).  Dimensions
    whose ANALYZE NDV exceeds `max_dim_ndv_ratio * rows` are dropped
    (and reported) — a rollup keyed by a near-unique column is as big
    as the base table.  Score = miss-count x log10(estimated rollup
    reduction); without stats the reduction defaults to 1 (frequency
    ranking only, refined after ANALYZE)."""
    import math

    by_ds: dict[str, list[AggWorkloadRecord]] = defaultdict(list)
    for r in records:
        if not r.accelerated:
            by_ds[r.dataset].append(r)
    out: list[dict] = []
    for ds, recs in by_ds.items():
        dim_freq: Counter = Counter()
        meas: set[tuple[str, str]] = set()
        for r in recs:
            dim_freq.update(r.dims)
            meas.update(r.measures)
        col_stats = {}
        ent = (stats or {}).get(ds)
        n_rows = None
        if ent:
            for c in ent["columns"]:
                # (name, n_rows, n_nulls, ndv_approx, ndv_exact, ...)
                col_stats[c[0]] = int(c[3])
                n_rows = int(c[1])
        kept, dropped = [], []
        for d, _ in dim_freq.most_common():
            ndv = col_stats.get(d)
            if (ndv is not None and n_rows
                    and ndv > max_dim_ndv_ratio * n_rows):
                dropped.append(d)
            else:
                kept.append(d)
        if not kept:
            continue
        est_groups = None
        if n_rows and all(d in col_stats for d in kept):
            prod = 1
            for d in kept:
                prod *= max(1, col_stats[d])
            est_groups = min(prod, n_rows)
        reduction = (n_rows / est_groups
                     if est_groups and n_rows else None)
        score = len(recs) * (1.0 + (math.log10(reduction)
                                    if reduction and reduction > 1
                                    else 0.0))
        # measure DDL: count(*) and avg ride the implicit count(*)
        # partial plus sum; ndv -> APPROXIMATE COUNT DISTINCT
        fn_by_col: dict[str, set[str]] = defaultdict(set)
        for fn, col in meas:
            if col == "*":
                continue  # implicit count(*) partial
            if fn == "avg":
                fn_by_col[col].update(("SUM", "COUNT"))
            elif fn == "ndv":
                fn_by_col[col].add("APPROXIMATE COUNT DISTINCT")
            else:
                fn_by_col[col].add(fn.upper())
        meas_sql = ", ".join(
            f"{c} ({', '.join(sorted(fns))})"
            for c, fns in sorted(fn_by_col.items()))
        safe_ds = re.sub(r"\W", "_", ds)
        name = f"refl_suggested_{safe_ds}"
        ddl = (f"ALTER DATASET {ds} CREATE AGGREGATE REFLECTION {name} "
               f"USING DIMENSIONS ({', '.join(kept)})"
               + (f" MEASURES ({meas_sql})" if meas_sql
                  else " MEASURES ()"))
        out.append({
            "dataset": ds,
            "reflection_name": name,
            "dimensions": ", ".join(kept),
            "dropped_high_ndv": ", ".join(dropped),
            "measures": meas_sql,
            "query_count": len(recs),
            "estimated_reduction": reduction,
            "score": score,
            "ddl": ddl,
        })
    out.sort(key=lambda s: -s["score"])
    return out[:top]
