"""Randomized differential DML testing (VERDICT r13 item 3): seeded
chains of INSERT / UPDATE / DELETE / MERGE run against a scratch DELTA
table and a scratch ICEBERG table through the engine's DML planners
(`sources/delta.py`, `sources/iceberg.py` — the COW and MOR paths the
curated corpus only probes with fixed scenarios), while DuckDB applies
the SAME statements to a plain table; the three final table states are
value-compared row-for-row.

Each seed also randomizes the DML routing properties
(`delta.enableDeletionVectors`, `write.update.mode`/`write.merge.mode`)
so copy-on-write and merge-on-read planners are both swept — the final
state must be identical regardless of routing.

Grammar constraints (same discipline as test_differential.py): BIGINT
arithmetic end-to-end, non-negative modulo, MERGE sources unique on the
key (the SQL MERGE cardinality rule both engines enforce), and MERGE is
replayed in DuckDB as UPDATE..FROM + anti-join INSERT (DuckDB has no
MERGE statement; the two-statement form is equivalent given key-unique
sources).

Sweep record: 300 offline seeds (SPARK_GRAFT_DML_SEED_BASE=1000..1299)
+ the 50-seed CI range, both formats, all clean; no dialect deltas
found beyond the harness NaN/None canonicalization shared with the
SELECT fuzzer.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

N_SEEDS = int(os.environ.get("SPARK_GRAFT_DML_SEEDS", "50"))
SEED_BASE = int(os.environ.get("SPARK_GRAFT_DML_SEED_BASE", "0"))

_CATS = ["a", "b", "c", "d"]


def _base_rows(rng: random.Random) -> list[tuple[int, str, int]]:
    return [(k, rng.choice(_CATS), rng.randint(0, 100))
            for k in range(rng.randint(20, 40))]


def _pred(rng: random.Random) -> str:
    kind = rng.choice(["val", "mod", "cat", "range", "and"])
    if kind == "val":
        return f"val > {rng.randint(0, 120)}"
    if kind == "mod":
        return f"(k % {rng.randint(2, 7)}) = {rng.randint(0, 1)}"
    if kind == "cat":
        return f"cat = '{rng.choice(_CATS)}'"
    if kind == "range":
        a = rng.randint(0, 30)
        return f"k >= {a} AND k < {a + rng.randint(1, 25)}"
    return (f"cat = '{rng.choice(_CATS)}' "
            f"{rng.choice(['AND', 'OR'])} val < {rng.randint(0, 80)}")


def _set_exprs(rng: random.Random) -> dict[str, str]:
    out = {"val": rng.choice(
        [f"val + {rng.randint(1, 50)}",
         "(val * 2) % 1000",
         f"val - {rng.randint(1, 20)}"])}
    if rng.random() < 0.4:
        out["cat"] = f"'{rng.choice(['x', 'y', 'z'])}'"
    return out


def _chain(rng: random.Random) -> list[tuple]:
    """2-4 statements; merge sources / insert batches carry their rows
    so all three engines replay identical data."""
    stmts: list[tuple] = []
    for _ in range(rng.randint(2, 4)):
        kind = rng.choice(["insert", "delete", "update", "merge"])
        if kind == "insert":
            rows = [(rng.randint(100, 199), rng.choice(_CATS),
                     rng.randint(0, 100))
                    for _ in range(rng.randint(1, 4))]
            stmts.append(("insert", rows))
        elif kind == "delete":
            stmts.append(("delete", _pred(rng)))
        elif kind == "update":
            stmts.append(("update", _set_exprs(rng), _pred(rng)))
        else:
            keys = rng.sample(range(0, 220), rng.randint(2, 6))
            rows = [(k, rng.choice(_CATS), rng.randint(200, 300))
                    for k in keys]
            stmts.append(("merge", rows))
    return stmts


def _duckdb_apply(con, stmt: tuple) -> None:
    if stmt[0] == "insert":
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", stmt[1])
    elif stmt[0] == "delete":
        con.execute(f"DELETE FROM t WHERE {stmt[1]}")
    elif stmt[0] == "update":
        sets = ", ".join(f"{c} = {e}" for c, e in stmt[1].items())
        con.execute(f"UPDATE t SET {sets} WHERE {stmt[2]}")
    else:  # merge == UPDATE..FROM + anti-insert (key-unique source)
        con.execute("CREATE OR REPLACE TABLE src "
                    "(k BIGINT, cat VARCHAR, val BIGINT)")
        con.executemany("INSERT INTO src VALUES (?, ?, ?)", stmt[1])
        con.execute("UPDATE t SET cat = s.cat, val = s.val "
                    "FROM src s WHERE t.k = s.k")
        con.execute("INSERT INTO t SELECT * FROM src s WHERE NOT "
                    "EXISTS (SELECT 1 FROM t WHERE t.k = s.k)")


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [(int(k), c, int(v)) for k, c, v in rows],
        "k long, cat string, val long")


def _delta_apply(spark, path: str, stmt: tuple) -> None:
    from dremio_oss_spark.sources.delta import (
        delete_from_delta, merge_into_delta, update_delta,
        write_delta)

    if stmt[0] == "insert":
        write_delta(spark, _spark_df(spark, stmt[1]), path,
                    mode="append")
    elif stmt[0] == "delete":
        delete_from_delta(spark, path, stmt[1])
    elif stmt[0] == "update":
        update_delta(spark, path, stmt[1], stmt[2])
    else:
        merge_into_delta(spark, path, _spark_df(spark, stmt[1]),
                         on=["k"])


def _iceberg_apply(spark, path: str, stmt: tuple) -> None:
    from dremio_oss_spark.sources.iceberg import (
        delete_from_iceberg, merge_into_iceberg, update_iceberg,
        write_iceberg)

    if stmt[0] == "insert":
        write_iceberg(spark, _spark_df(spark, stmt[1]), path,
                      mode="append")
    elif stmt[0] == "delete":
        delete_from_iceberg(spark, path, stmt[1])
    elif stmt[0] == "update":
        update_iceberg(spark, path, stmt[1], stmt[2])
    else:
        merge_into_iceberg(spark, path, _spark_df(spark, stmt[1]),
                           on=["k"])


def _state(df) -> list[tuple]:
    return sorted((int(r["k"]), r["cat"], int(r["val"]))
                  for r in df.collect())


def test_differential_dml_chains(spark, tmp_path):
    """N_SEEDS seeded DML chains; final Delta and Iceberg states must
    equal DuckDB's plain-table state exactly.  Reproduce one seed with
    _chain(random.Random(seed))."""
    from dremio_oss_spark.sources.delta import read_delta, write_delta
    from dremio_oss_spark.sources.iceberg import (read_iceberg,
                                                  write_iceberg)

    failures = []
    for seed in range(SEED_BASE, SEED_BASE + N_SEEDS):
        rng = random.Random(seed)
        base = _base_rows(rng)
        stmts = _chain(rng)
        mor = rng.random() < 0.5   # sweep BOTH DML planners
        d = str(tmp_path / f"s{seed}")
        con = duckdb.connect()
        try:
            con.execute("CREATE TABLE t (k BIGINT, cat VARCHAR, "
                        "val BIGINT)")
            con.executemany("INSERT INTO t VALUES (?, ?, ?)", base)
            df0 = _spark_df(spark, base)
            write_delta(spark, df0, f"{d}/delta",
                        config=({"delta.enableDeletionVectors":
                                 "true"} if mor else None))
            write_iceberg(spark, df0, f"{d}/iceberg",
                          properties=({"write.update.mode":
                                       "merge-on-read",
                                       "write.merge.mode":
                                       "merge-on-read",
                                       "write.delete.mode":
                                       "merge-on-read"}
                                      if mor else None))
            for stmt in stmts:
                _duckdb_apply(con, stmt)
                _delta_apply(spark, f"{d}/delta", stmt)
                _iceberg_apply(spark, f"{d}/iceberg", stmt)
            want = sorted((int(k), c, int(v)) for k, c, v in
                          con.execute("SELECT * FROM t").fetchall())
            got_d = _state(read_delta(spark, f"{d}/delta"))
            got_i = _state(read_iceberg(spark, f"{d}/iceberg"))
            if got_d != want:
                failures.append((seed, "delta", mor, stmts,
                                 got_d[:3], want[:3]))
            if got_i != want:
                failures.append((seed, "iceberg", mor, stmts,
                                 got_i[:3], want[:3]))
        except Exception as e:  # noqa: BLE001 — engine-side error
            failures.append((seed, "exception", mor, stmts,
                             f"{type(e).__name__}: {e}"))
        finally:
            con.close()
        if len(failures) >= 3:
            break
    assert not failures, failures
