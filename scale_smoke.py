"""Scaling-curve smoke: measure core operators at 10x input steps.

Generates synthetic corpora fully DISTRIBUTED (spark.range -> columnar
expressions; the driver never materializes a row) at two sizes and runs
the headline pipeline operators at each, reporting wall-clock and the
observed scaling exponent alpha where t ~ n^alpha (alpha ~= 1 is
linear; the LSH/banded designs should stay well under quadratic).

This harness exists to back SCALE.md's claims with measurements — it is
NOT part of the correctness gate (the synthetic corpus here is
deliberately bigger than the driver fixtures and has no DuckDB oracle).

Usage:  python scale_smoke.py [small_n] [big_n]      (default 30k / 300k)
Prints one JSON line per operator with both timings + alpha.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def synth_docs(spark, n: int):
    """n pseudo-documents of ~40 tokens drawn from a 1k-word vocab via
    md5-derived indices; ~3% exact duplicates (same generator seed)."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # duplicate groups: 3% of docs share a seed with a neighbor
        F.when(F.col("id") % 33 == 1, F.col("id") - 1)
        .otherwise(F.col("id")).alias("seed"),
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"),
            (F.abs(F.hash(F.concat_ws(":", F.col("seed"), i))) % 1000)
            .cast("string"),
        ),
    )
    return base.select(
        "doc_id", F.array_join(words, " ").alias("text")
    )


def synth_vecs(spark, n: int, dim: int = 64):
    from pyspark.sql import functions as F

    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: ((F.hash(F.concat_ws(":", F.col("id"), i)) % 1000)
                   / 1000.0).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comps.alias("embedding")
    )


def synth_delta_log(table: str, n_files: int) -> None:
    """A Delta LOG with `n_files` live adds (partitioned, with stats),
    an overwrite of one partition, and a mid-history checkpoint —
    metadata-only (no data files), which is exactly what metadata
    planning consumes."""
    import os

    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "p", "type": "long", "nullable": True, "metadata": {}},
    ]}

    def add(i, version):
        lo, hi = i * 100, i * 100 + 99
        return {"add": {
            "path": f"p={i % 16}/part-{version:05d}-{i:07d}.parquet",
            "partitionValues": {"p": str(i % 16)}, "size": 1,
            "modificationTime": version, "dataChange": True,
            "stats": json.dumps({
                "numRecords": 100, "minValues": {"k": lo},
                "maxValues": {"k": hi}})}}

    half = n_files // 2
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "synth", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["p"], "configuration": {}}}) + "\n")
        for i in range(half):
            f.write(json.dumps(add(i, 0)) + "\n")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        for i in range(half, n_files):
            f.write(json.dumps(add(i, 1)) + "\n")
    # overwrite partition 3: remove its files, add replacements
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        for i in range(n_files):
            if i % 16 == 3:
                f.write(json.dumps({"remove": {
                    "path": f"p=3/part-{0 if i < half else 1:05d}"
                            f"-{i:07d}.parquet",
                    "deletionTimestamp": 2, "dataChange": True}}) + "\n")
        for i in range(200):
            f.write(json.dumps(add(n_files + i, 2)) + "\n")


def metadata_scale_case(spark, n_files: int) -> None:
    """10k+-file planning through the DISTRIBUTED metadata path vs the
    driver-side Python replay: identical live sets and pruning
    survivors, with both wall-clocks reported."""
    import shutil
    import tempfile

    from dremio_oss_spark.sources.delta import _pv_eq, resolve_snapshot
    from dremio_oss_spark.sources.lake_metadata import (
        delta_live_files_df, delta_plan_files_distributed)

    d = tempfile.mkdtemp(prefix="meta_scale_")
    t = os.path.join(d, "synth")
    try:
        synth_delta_log(t, n_files)
        t0 = time.perf_counter()
        snap = resolve_snapshot(spark, t)
        py_live = len(snap.files)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        dist_live = delta_live_files_df(spark, t).count()
        t_dist = time.perf_counter() - t0
        assert dist_live == py_live, (dist_live, py_live)
        eq = {"p": 1, "k": 150}  # survives: exactly the file covering k=150

        # the Python planner's keep-logic over the resolved snapshot
        # (plan_delta_scan itself would build the scan over data files,
        # which this metadata-only fixture doesn't materialize)
        def py_keep(rel):
            pv = snap.files[rel]
            for c, v in eq.items():
                if c in snap.partition_cols and not _pv_eq(pv.get(c), v):
                    return False
                st = snap.stats.get(rel)
                if st:
                    lo = (st.get("minValues") or {}).get(c)
                    hi = (st.get("maxValues") or {}).get(c)
                    if lo is not None and hi is not None \
                            and not (lo <= v <= hi):
                        return False
            return True

        py_kept = sum(1 for rel in snap.files if py_keep(rel))
        dist_kept = delta_plan_files_distributed(spark, t, eq).count()
        assert dist_kept == py_kept, (dist_kept, py_kept)
        print(json.dumps({
            "op": "delta_metadata_planning", "n_files": n_files,
            "live_files": py_live, "pruned_to": py_kept,
            "t_python_s": round(t_py, 2),
            "t_distributed_s": round(t_dist, 2),
            "paths_agree": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def footer_stats_threshold_case(spark, n_files: int = 200) -> None:
    """Write-path stats collection: small commits read the just-written
    parquet FOOTERS on the driver (zero Spark jobs), while a commit
    above `spark.dremio.stats.footerMaxFiles` (default 64) takes the
    distributed one-scan path — driver time must not grow with commit
    size.  Proves the switch by instrumenting the footer fn, and value-
    checks the two paths against each other on the same files."""
    import shutil
    import tempfile

    from dremio_oss_spark.sources import delta as D

    d = tempfile.mkdtemp(prefix="footer_stats_")
    t = os.path.join(d, "t")
    try:
        df = spark.range(n_files * 10).selectExpr(
            "id as k", "cast(id as double) as v")
        D.write_delta(spark, df.repartition(n_files), t)
        snap = D.resolve_snapshot(spark, t)
        staged = list(snap.files.items())
        assert len(staged) > 64, len(staged)
        calls = {"n": 0}
        orig = D._footer_stats

        def probe(*a, **kw):
            calls["n"] += 1
            return orig(*a, **kw)

        D._footer_stats = probe
        try:
            t0 = time.perf_counter()
            big = D._collect_stats(spark, t, staged, df.schema, [])
            t_big = time.perf_counter() - t0
            assert calls["n"] == 0, "large commit took the driver path"
            t0 = time.perf_counter()
            small = D._collect_stats(spark, t, staged[:8], df.schema, [])
            t_small = time.perf_counter() - t0
            assert calls["n"] == 1, "small commit missed the footer path"
        finally:
            D._footer_stats = orig
        for rel in small:
            assert small[rel] == big[rel], (rel, small[rel], big[rel])
        print(json.dumps({
            "op": "footer_stats_threshold", "n_files": len(staged),
            "t_distributed_s": round(t_big, 2),
            "t_footer_8_files_s": round(t_small, 3),
            "paths_agree": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def engine_distributed_plan_case(spark, n_files: int = 120_000) -> None:
    """Round-6 'done' case: `engine.sql` over a 120k-file Delta table
    plans via the DISTRIBUTED metadata path — the Python resolver is
    poisoned to PROVE the path taken — prunes to the same single
    survivor the Python planner would keep ({"p": 1, "k": 150} covers
    exactly one file), and the scan executes end-to-end over that one
    (real) data file."""
    import glob
    import shutil
    import tempfile

    from dremio_oss_spark.engine import Engine
    from dremio_oss_spark.sources import delta as d_mod

    d = tempfile.mkdtemp(prefix="meta_scale_eng_")
    t = os.path.join(d, "synth")
    try:
        synth_delta_log(t, n_files)
        # materialize ONLY the file the pruner should keep (the scan
        # never opens pruned files, so 1 real file suffices for 120k
        # metadata entries — the point of metadata-first planning)
        tmpp = os.path.join(d, "one")
        spark.range(100, 200).selectExpr("id as k") \
            .coalesce(1).write.parquet(tmpp)
        dest = os.path.join(t, "p=1", "part-00000-0000001.parquet")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy(glob.glob(os.path.join(tmpp, "*.parquet"))[0], dest)

        est = d_mod._estimate_delta_file_count(t)
        assert est >= d_mod._DISTRIBUTED_THRESHOLD_DEFAULT, \
            f"estimate {est} under default threshold"
        real_resolve = d_mod.resolve_snapshot

        def boom(*a, **kw):
            raise AssertionError(
                "driver-side Python resolver called above threshold")

        t0 = time.perf_counter()
        d_mod.resolve_snapshot = boom
        try:
            rows = Engine(spark).sql(
                f"select k from '{t}' where p = 1 and k = 150").collect()
        finally:
            d_mod.resolve_snapshot = real_resolve
        dt = time.perf_counter() - t0
        assert [r.k for r in rows] == [150], rows
        print(json.dumps({
            "op": "engine_distributed_metadata_plan", "n_files": n_files,
            "pruned_to": 1, "t_s": round(dt, 2),
            "python_resolver_called": False,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def dv_decode_scale_case(spark, n_files: int = 20_000,
                         per_file: int = 50) -> None:
    """Round-7 case: deletion-vector decode is DISTRIBUTED — the driver
    ships only the (file, descriptor-JSON) rows and executors decode
    the roaring bitmaps via mapInPandas.  20k DVs x 50 positions = 1M
    deleted rows that, under the previous driver-side shape, would all
    have materialized in a Python list before the anti-join."""
    import base64

    from dremio_oss_spark.sources.delta import _dv_rows_df
    from dremio_oss_spark.sources.roaring import encode_rbm_array

    blob = base64.b85encode(
        encode_rbm_array(list(range(0, per_file * 7, 7)))).decode()
    dvs = {f"part-{i:07d}.parquet":
           {"storageType": "i", "pathOrInlineDv": blob}
           for i in range(n_files)}
    t0 = time.perf_counter()
    n = _dv_rows_df(spark, "/unused-for-inline-dvs", dvs).count()
    dt = time.perf_counter() - t0
    assert n == n_files * per_file, n
    print(json.dumps({
        "op": "distributed_dv_decode", "n_dvs": n_files,
        "positions": n, "t_s": round(dt, 2),
        "driver_side_positions": 0,
    }))


def eq_delete_seq_scale_case(spark, n_files: int = 20_000,
                             n_rows: int = 200_000) -> None:
    """Round-7 case: sequence-aware equality deletes at high file count.
    The row→sequence attachment is a (basename → seq) map join over a
    20k-entry synthetic snapshot — driven with the threshold forced to
    0 so the map join runs UNHINTED (the distributed path AQE must
    cost), proving correctness without the broadcast crutch; the delete
    anti-join carries the seq < delete_seq conjunct.  Old files
    (seq 1 < 2) lose their deleted keys; files stamped at the delete's
    own sequence keep theirs."""
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dremio_oss_spark.sources.iceberg import (IcebergSnapshot,
                                                  _apply_equality_deletes)

    tmp = tempfile.mkdtemp()
    schema = T.StructType([T.StructField("k", T.LongType())])
    files = [(f"{tmp}/part-{i:07d}.parquet", {}) for i in range(n_files)]
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit(f"{tmp}/part-"),
                 F.format_string("%07d", (F.col("id") % n_files)
                                 .cast("int")),
                 F.lit(".parquet")).alias("__file"))
    snap = IcebergSnapshot(1, schema, [], files)
    # half the files carry the delete's own sequence: their rows must
    # SURVIVE (seq not strictly lower)
    snap.file_seq = {p: (2 if i % 2 else 1)
                     for i, (p, _) in enumerate(files)}
    dpath = os.path.join(tmp, "eq-del.parquet")
    # stride 5: deleted keys land half in even-index (seq 1, die) and
    # half in odd-index (seq 2, SURVIVE) files, so both sides of the
    # sequence gate are exercised
    spark.range(0, n_rows, 5).select(
        F.col("id").alias("k")).coalesce(1).write.parquet(dpath)
    snap.deletes = [(dpath, ["k"])]
    snap.delete_seq = {dpath: 2}
    prev = spark.conf.get("spark.dremio.lake.metadata.distributedFileThreshold",
                          None)
    spark.conf.set("spark.dremio.lake.metadata.distributedFileThreshold", "0")
    t0 = time.perf_counter()
    try:
        out = _apply_equality_deletes(spark, df, snap)
        n = out.count()
    finally:
        if prev is None:
            spark.conf.unset("spark.dremio.lake.metadata.distributedFileThreshold")
        else:
            spark.conf.set(
                "spark.dremio.lake.metadata.distributedFileThreshold", prev)
    # deleted keys: k % 5 == 0; survive when their file has seq 2
    # (file index = k % n_files, odd index -> seq 2)
    expect = n_rows - sum(1 for k in range(0, n_rows, 5)
                          if (k % n_files) % 2 == 0)
    assert expect != n_rows - (n_rows // 5), "no survivor case"
    assert n == expect, (n, expect)
    print(json.dumps({
        "op": "seq_aware_eq_delete", "n_files": n_files,
        "n_rows": n_rows, "survivors": n,
        "t_s": round(time.perf_counter() - t0, 2),
        "map_join": "unhinted (threshold forced 0)",
    }))


def _mixture(docs):
    from pyspark.sql import functions as F

    from dremio_oss_spark.operators.mixing import weighted_mixture

    tagged = docs.withColumn(
        "source", F.concat(F.lit("s"), (F.col("doc_id") % 8).cast("string")))
    return weighted_mixture(tagged, "source", "doc_id",
                            {"s0": 2.5, "s1": 0.5, "s2": 0.0})


def _packing(docs):
    from pyspark.sql import functions as F

    from dremio_oss_spark.operators.mixing import pack_sequences
    from dremio_oss_spark.operators.text import token_count

    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))
    return pack_sequences(toks, "n_tok", "doc_id", context_len=2048)


def plan_cache_case(spark, n_repeats: int = 30) -> None:
    """Statement plan cache (reference PlanCache.java): the FIRST run of
    a SELECT pays analysis + substitution probing; repeats serve the
    cached plan — planning latency per statement must drop by an order
    of magnitude at BI dashboard-style repetition rates.  Measures
    PLANNING only (engine.sql returns a lazy frame; no collect)."""
    import tempfile

    from dremio_oss_spark.engine import Engine

    d = tempfile.mkdtemp(prefix="plancache_")
    spark.range(200_000).selectExpr(
        "id as k", "id % 13 as d", "cast(id as double) as v"
    ).write.mode("overwrite").parquet(os.path.join(d, "t"))
    spark.read.parquet(os.path.join(d, "t")).createOrReplaceTempView(
        "pc_t")
    eng = Engine(spark)
    eng.sql("ALTER TABLE pc_t CREATE AGGREGATE REFLECTION pc_r "
            "USING DIMENSIONS (d) MEASURES (v (SUM, COUNT))")
    q = "select d, sum(v) s, count(*) n from pc_t group by d having count(*) > 10"
    t0 = time.perf_counter()
    eng.sql(q)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_repeats):
        eng.sql(q)
    t_rep = (time.perf_counter() - t0) / n_repeats
    assert eng.plan_cache_hits >= n_repeats
    assert eng.last_plan_accelerated == "pc_r"
    print(json.dumps({
        "op": "plan_cache", "first_plan_ms": round(t_first * 1000, 1),
        "cached_plan_ms": round(t_rep * 1000, 2),
        "speedup_x": round(t_first / max(t_rep, 1e-9), 1),
        "hits": eng.plan_cache_hits,
    }))
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from pyspark.sql import functions as F

    from dremio_oss_spark.operators import dedup as D
    from dremio_oss_spark.operators import text as T
    from dremio_oss_spark.operators.clustering import kmeans
    from dremio_oss_spark.session import build_spark

    spark = build_spark(app_name="scale-smoke")

    metadata_scale_case(spark, n_files=12_000)
    footer_stats_threshold_case(spark, n_files=200)
    plan_cache_case(spark)
    engine_distributed_plan_case(spark, n_files=120_000)
    dv_decode_scale_case(spark, n_files=20_000)
    eq_delete_seq_scale_case(spark, n_files=20_000)

    ops = {
        "exact_dedup": lambda d, v: D.exact_dedup(d),
        "minhash_lsh": lambda d, v: D.minhash_lsh_dedup(d),
        # production banding config: 60-bit signatures give 15-bit band
        # keys at max_hamming=3 (the fixture queries use the oracle's
        # 16-bit config, whose 2^4..2^6-key bands only suit small
        # corpora — SCALE.md documents the knob)
        "simhash_pairs_60bit": lambda d, v: D.simhash_near_pairs(
            D.simhash(d, bits=60), max_hamming=3, bits=60),
        "text_analysis": lambda d, v: T.with_text_analysis(d, "text"),
        "vocab_top50": lambda d, v: (
            d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok").count().orderBy(F.desc("count")).limit(50)
        ),
        "kmeans_2iter": lambda d, v: kmeans(v, k=8, n_iters=2),
        "weighted_mixture": lambda d, v: _mixture(d),
        "sequence_packing": lambda d, v: _packing(d),
    }

    def force(df) -> float:
        """Full evaluation: noop sink computes every projected column
        (a bare count() would let Catalyst prune the work away)."""
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, fn in ops.items():
        times = {}
        # warmup on a tiny corpus so codegen/python-worker spin-up cost
        # is excluded from both measured runs
        force(fn(synth_docs(spark, 2000), synth_vecs(spark, 1000)))
        for label, n in (("small", small), ("big", big)):
            docs = synth_docs(spark, n)
            vecs = synth_vecs(spark, max(n // 30, 1000))
            times[label] = force(fn(docs, vecs))
        alpha = (math.log(times["big"] / times["small"])
                 / math.log(big / small))
        print(json.dumps({
            "op": name, "n_small": small, "n_big": big,
            "t_small_s": round(times["small"], 2),
            "t_big_s": round(times["big"], 2),
            "alpha": round(alpha, 2),
        }))


if __name__ == "__main__":
    main()
