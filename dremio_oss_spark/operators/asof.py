"""As-of (point-in-time) join — the canonical time-series lookup.

For each left row, find the single right row with the same key whose
timestamp is the latest at-or-before (backward) / earliest at-or-after
(forward) the left timestamp.  Dremio expresses this as a correlated
subquery or window rewrite (range-condition NLJ would be the naive plan:
`sabot/op/join/nlje/NLJEOperator.java:64`); engines with native support
(DuckDB ASOF JOIN, pandas merge_asof) special-case it.  Spark lacks a
native operator, so we use the scalable union+window formulation:

  1. tag right rows 0 and left rows 1, union them on the key/ts schema;
  2. one window per key ordered by (ts, tag): `last(value, ignorenulls)`
     over ROWS UNBOUNDED PRECEDING..CURRENT fills each left row with the
     most recent right value at-or-before it (right sorts first at equal
     ts, giving inclusive `>=` semantics);
  3. keep the left rows.

Cost: ONE shuffle on the join key (same as the equi-join Spark would do
anyway) + a linear per-partition scan.  No range explosion, no
per-bucket replication, no NLJ — this survives 100 TB because state per
key is O(1) during the window scan and skewed keys parallelize exactly
as well as any window function (salt the key upstream if one user is
pathological).

Determinism contract: if several right rows share (key, ts), which one
wins is tie-dependent — pre-aggregate the right side to one row per
(key, ts) for reproducible output (the query wrappers do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """Return `left` with `right_cols` (and the right `ts`) as-of joined.

    `left` and `right` must both carry the `on` key columns and a `ts`
    column of an orderable type.  Added columns: `<c><suffix>` for each c
    in right_cols plus `<ts><suffix>` (the matched right timestamp); all
    NULL when no right row qualifies (left-outer semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in on + [ts]]

    out_asof = [f"{c}{suffix}" for c in right_cols] + [f"{ts}{suffix}"]
    # the matched right row travels as ONE struct: per-column
    # last(ignorenulls) would back-fill a legitimately-NULL right value
    # from an OLDER right row, pairing the matched timestamp with a
    # stale value (a torn row — DuckDB ASOF returns the matched row's
    # NULL).  The struct itself is non-null on every right row, so the
    # fill picks the whole matched row atomically.
    carried = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"))
    # backward: right first at equal ts so CURRENT ROW sees it (>=);
    # forward: left first so the following-frame scan sees an equal-ts right.
    rtag, ltag = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        *on, F.col(ts), F.lit(rtag).alias("_tag"),
        carried.alias("__asof"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on + [ts]],
    )
    l = left.select(
        *on, F.col(ts), F.lit(ltag).alias("_tag"),
        F.lit(None).cast(r.schema["__asof"].dataType).alias("__asof"),
        *[F.col(c) for c in left.columns if c not in on + [ts]],
    )
    u = r.unionByName(l)

    w = Window.partitionBy(*on).orderBy(ts, "_tag")
    if direction == "backward":
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = F.last("__asof", ignorenulls=True).over(frame)
    else:
        frame = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = F.first("__asof", ignorenulls=True).over(frame)

    filled = u.select(
        *on, ts, "_tag",
        *[c for c in left.columns if c not in on + [ts]],
        fill.alias("__asof"),
    )
    return (filled.where(F.col("_tag") == ltag)
            .select(*on, ts,
                    *[c for c in left.columns if c not in on + [ts]],
                    *[F.col(f"__asof.{a}").alias(a) for a in out_asof]))
