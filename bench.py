"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Times are wall-clock per query over a warm session (mirrors the reference's
TestTpchDistributed 20 s/query envelope; see BASELINE.md).

Per-query numbers are noisy round-over-round: queries run alphabetically in
ONE shared JVM, so GC/cache pressure from a neighboring family can shift an
individual query by ~2x while the suite total stays stable — compare totals
and per-family rollups, not single queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


_TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem")


def ensure_sf1(spark, src: str, dst: str, copies: int = 10) -> str:
    """Materialize an sf1-scale TPC-H corpus (~6M lineitem) by
    FK-consistent upsampling of the driver's sf0.1 fixture: each of the
    `copies` replicas shifts every key space by copy_index * max_key, so
    copy i's lineitem joins copy i's orders/part/supplier and join
    fan-outs scale linearly.  Dims (region/nation) stay as-is.
    Distributed end-to-end (union of projected scans → parquet); the
    driver never holds a row.  Idempotent: skipped when dst exists."""
    import shutil

    from pyspark.sql import functions as F

    done = os.path.join(dst, "_DONE")
    # corpus layout version + a fingerprint of the SOURCE fixture
    # (path, per-file size+mtime): an upsample of a since-rebuilt
    # fixture no longer serves stale data, and an identical source
    # keeps the skip — the marker proves the corpus current, not
    # merely present.  (Layout version: bump to force rebuild.)
    def _src_fp() -> str:
        parts = [os.path.abspath(src)]
        try:
            for fn in sorted(os.listdir(src)):
                if fn.endswith(".parquet"):
                    p = os.path.join(src, fn)
                    st_ = os.stat(p)
                    mt = st_.st_mtime
                    if os.path.isdir(p):
                        for e in os.scandir(p):
                            s2 = e.stat()
                            mt = max(mt, s2.st_mtime)
                    parts.append(f"{fn}:{st_.st_size}:{mt:.0f}")
        except OSError:
            pass
        return ";".join(parts)

    marker = f"v5-events-upsampled|copies={copies}|{_src_fp()}"
    if os.path.exists(done):
        with open(done) as f:
            if f.read().strip() == marker:
                return dst
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)

    def rd(name):
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    maxes = {
        "ck": rd("customer").agg(F.max("c_custkey")).collect()[0][0] + 1,
        "sk": rd("supplier").agg(F.max("s_suppkey")).collect()[0][0] + 1,
        "pk": rd("part").agg(F.max("p_partkey")).collect()[0][0] + 1,
        "ok": rd("orders").agg(F.max("o_orderkey")).collect()[0][0] + 1,
    }
    shifts = {  # table -> {col: keyspace}
        "customer": {"c_custkey": "ck"},
        "supplier": {"s_suppkey": "sk"},
        "part": {"p_partkey": "pk"},
        "orders": {"o_orderkey": "ok", "o_custkey": "ck"},
        "lineitem": {"l_orderkey": "ok", "l_partkey": "pk",
                     "l_suppkey": "sk"},
    }
    for t in _TPCH_TABLES:
        base = rd(t)
        if t in ("region", "nation"):
            out = base
        else:
            parts = []
            for i in range(copies):
                c = base
                for col, space in shifts[t].items():
                    c = c.withColumn(
                        col, F.col(col) + F.lit(i * maxes[space]))
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(dst, f"{t}.parquet"))

    # LLM-pipeline corpus, one decade up: documents (doc_id shifted;
    # for copies > 0 every WORD gets a copy-index suffix — a per-copy
    # VOCABULARY RENAMING, i.e. an isomorphism of the corpus: token
    # counts, doc lengths, and the within-copy duplicate/near-duplicate
    # structure are preserved EXACTLY, while word n-gram shingle sets
    # are disjoint across copies, so replicas are not artificial
    # near-duplicates of each other and the dedup families scale like
    # 10x organic data) and embeddings (vec_id shifted, vectors reused
    # — ANN/clustering cost scales with row count, not value diversity)
    docs = rd("documents")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dparts = []
    for i in range(copies):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * max_doc))
        if i > 0:
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"_{i}"))),
                    " "))
        dparts.append(c)
    out = dparts[0]
    for p in dparts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet"))

    vecs = rd("embeddings")
    max_vec = vecs.agg(F.max("vec_id")).collect()[0][0] + 1
    vparts = [vecs.withColumn("vec_id",
                              F.col("vec_id") + F.lit(i * max_vec))
              for i in range(copies)]
    out = vparts[0]
    for p in vparts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet"))

    # events, one decade up: event_id and user_id shift per copy (10x
    # users, each keeping their original event sequence and timestamps
    # — per-user session/window structure is preserved exactly, so
    # windowed-aggregation STATE grows 10x, the realistic axis for
    # streaming scale)
    ev = os.path.join(src, "events.parquet")
    if os.path.exists(ev):
        evd = rd("events")
        max_eid = evd.agg(F.max("event_id")).collect()[0][0] + 1
        max_uid = evd.agg(F.max("user_id")).collect()[0][0] + 1
        eparts = [evd.withColumn("event_id",
                                 F.col("event_id") + F.lit(i * max_eid))
                  .withColumn("user_id",
                              F.col("user_id") + F.lit(i * max_uid))
                  for i in range(copies)]
        out = eparts[0]
        for p in eparts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(dst, "events.parquet"))
    with open(done, "w") as f:
        f.write(marker)
    return dst


def _simhash_pairs_60bit(spark, sf_dir: str):
    """Production-width simhash near-pair search (60-bit signature,
    hamming<=3 via 4-band pigeonhole) over a corpus dir — the same
    operator llm_simhash_pairs registers, at the width SCALE.md's
    claims run at (the 16-bit registered form is a DuckDB-oracle
    fixture)."""
    from dremio_oss_spark.operators import dedup as D

    docs = spark.read.parquet(os.path.join(sf_dir,
                                           "documents.parquet"))
    return D.simhash_near_pairs(D.simhash(docs, bits=60),
                                max_hamming=3, bits=60)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dremio_oss_spark.session import build_spark
    import __spark_entry__ as entrymod

    spark = build_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warm the JVM + file-listing caches with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            # count() forces full execution without driver-side
            # materialization (collect would measure pickling, not the query)
            df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # one broken query must not kill the bench
            errors[name] = f"{type(e).__name__}: {e}"[:200]

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # one more decade: the 22 TPC-H queries at sf1 (~6M lineitem),
    # upsampled once into .scratch/sf1 — validates the scaling claims
    # beyond the driver's sf0.1 fixture.  Opt out with SPARK_GRAFT_SF1=0.
    sf1_timings: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == "0.1":
        try:
            here0 = os.path.dirname(os.path.abspath(__file__))
            sf1_dir = ensure_sf1(
                spark, sf_dir, os.path.join(here0, ".scratch", "sf1"))
            # two fixtures pin their ORACLE-scale knobs (16-bit simhash
            # bands = 16 buckets; small shingle-DF caps) that are
            # documented small-corpus configs — at 50k docs they go
            # quadratic by construction.  Their PRODUCTION configs
            # (64-bit bands, DF caps) are measured at 300k docs in
            # scale_smoke.py (alpha ~0.5); skip the fixture forms here.
            sf1_skip = {"llm_simhash_pairs", "llm_ngram_jaccard"}
            # write-path decade: the heaviest lake writers/DML re-run
            # against the 10x corpus (staging + commit protocol under
            # ~600k-row inputs)
            sf1_src = {"src_delta_write", "src_iceberg_write",
                       "src_delta_merge", "src_iceberg_dml",
                       "src_delta_dv", "src_ctas_insert",
                       "src_mor_dml"}
            # acceleration decade: reflection build (one pass over the
            # 10x fact) + transparent rollup answers — shows the
            # build-once/rollup-many economics hold as data grows
            sf1_refl = {"refl_transparent_sql", "refl_transparent_join",
                        "refl_transparent_leftjoin",
                        "refl_transparent_sumdistinct",
                        "refl_transparent_rollup",
                        "refl_transparent_purefn"}
            # relational-operator decade: window functions, grouping
            # sets, distinct-agg expansion, pivot, outer joins over the
            # 10x fact tables — the shuffle-heavy §2.1 shapes
            sf1_op = {"op_window_ranking", "op_grouping_sets",
                      "op_rollup_cube", "op_distinct_aggregates",
                      "op_pivot", "op_limit_offset",
                      "op_full_outer_join"}
            # streaming decade: 10x users -> 10x windowed-agg state
            # (events upsampled user-shifted, timestamps preserved);
            # multimodal decade rides the 10x documents corpus
            sf1_stream = {"stream_tumbling_window",
                          "stream_session_window",
                          "stream_stream_join",
                          "stream_stateful_totals"}
            for name in sorted(q for q in queries
                               if (q.startswith(("tpch_", "llm_", "mm_"))
                                   or q in sf1_src or q in sf1_refl
                                   or q in sf1_op or q in sf1_stream)
                               and q not in sf1_skip):
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf1_dir).count()
                    sf1_timings[f"sf1_{name}"] = round(
                        time.perf_counter() - t0, 3)
                except Exception as e:  # per-query: additive, tolerant
                    errors[f"sf1_{name}"] = f"{type(e).__name__}: {e}"[:200]
            # 60-bit (production-width) simhash pair search at sf1:
            # the registered query's 16-bit knob is an oracle fixture
            # that goes quadratic by construction; the production
            # config is the scale-claim carrier (paired with the sf5
            # row below for the measured exponent)
            try:
                t0 = time.perf_counter()
                _simhash_pairs_60bit(spark, sf1_dir).count()
                sf1_timings["sf1_llm_simhash_pairs_60bit"] = round(
                    time.perf_counter() - t0, 3)
            except Exception as e:
                errors["sf1_llm_simhash_pairs_60bit"] = \
                    f"{type(e).__name__}: {e}"[:200]
        except Exception as e:  # sf1 is additive; never kill the bench
            errors["sf1"] = f"{type(e).__name__}: {e}"[:200]

    # one MORE decade (VERDICT r14 item 4): sf5 (~30M lineitem, ~250k
    # docs) for the hot paths only — the banded dedup family and the
    # shuffle-heavy TPC-H trio.  Built by upsampling sf1 5x with the
    # same FK-consistent key shifts + per-copy vocabulary renaming
    # (ensure_sf1 is scale-agnostic), cached in .scratch/sf5.  These
    # rows back SCALE.md's ~linear claims with a measured second
    # decade; opt out with SPARK_GRAFT_SF5=0.
    sf5_timings: dict[str, float] = {}
    if (os.environ.get("SPARK_GRAFT_SF5", "1") != "0"
            and sf1_timings):
        try:
            sf5_dir = ensure_sf1(
                spark, os.path.join(here0, ".scratch", "sf1"),
                os.path.join(here0, ".scratch", "sf5"), copies=5)
            # stats_histogram at the decade (VERDICT r14 item 5): the
            # ANALYZE exact-quantile selection is the one r14 change
            # whose 100 TB story rests on a conf escape hatch — this
            # row measures its default path at ~30M rows
            for name in ("tpch_q01", "tpch_q09", "tpch_q21",
                         "llm_minhash_lsh", "llm_dedup_clusters",
                         "llm_span_dedup", "stats_histogram"):
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf5_dir).count()
                    sf5_timings[f"sf5_{name}"] = round(
                        time.perf_counter() - t0, 3)
                except Exception as e:
                    errors[f"sf5_{name}"] = \
                        f"{type(e).__name__}: {e}"[:200]
            try:
                t0 = time.perf_counter()
                _simhash_pairs_60bit(spark, sf5_dir).count()
                sf5_timings["sf5_llm_simhash_pairs_60bit"] = round(
                    time.perf_counter() - t0, 3)
            except Exception as e:
                errors["sf5_llm_simhash_pairs_60bit"] = \
                    f"{type(e).__name__}: {e}"[:200]
        except Exception as e:  # sf5 is additive; never kill the bench
            errors["sf5"] = f"{type(e).__name__}: {e}"[:200]

    # full per-query detail to a sidecar file; the printed line must stay
    # small enough to survive the driver's stdout-tail buffer (the r01 line
    # with 114 entries overflowed it and recorded parsed=null)
    detail = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {**timings, **sf1_timings, **sf5_timings},
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        **({"errors": errors} if errors else {}),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # Stage the file THIS run just wrote (BENCH_DETAIL.json) so bench
    # results land in the tree that produced them.  Staging the round
    # artifacts other processes wrote (BENCH_r*/CORRECTNESS_r*) is
    # opt-in via SPARK_GRAFT_STAGE_ARTIFACTS=1 — a measurement script
    # mutating the index with files from unrelated runs is surprising;
    # the normal commit workflow owns those.
    try:
        import subprocess

        arts = [os.path.join(here, "BENCH_DETAIL.json")]
        if os.environ.get("SPARK_GRAFT_STAGE_ARTIFACTS") == "1":
            import glob as _glob

            for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
                arts += _glob.glob(os.path.join(here, pat))
        subprocess.run(["git", "-C", here, "add", "--"] + arts,
                       check=False, capture_output=True, timeout=30)
    except Exception:
        pass

    # compact line: every TPC-H query individually (BASELINE.md's per-query
    # and suite bounds) + rollups for the other families
    compact: dict[str, float] = {}
    groups: dict[str, float] = {}
    for name, t in timings.items():
        if name.startswith("tpch_"):
            compact[name] = round(t, 2)
        else:
            g = name.split("_", 1)[0]
            groups[g] = groups.get(g, 0.0) + t
    for g, t in sorted(groups.items()):
        compact[f"{g}_total"] = round(t, 2)
    compact["tpch_total"] = round(
        sum(t for n, t in timings.items() if n.startswith("tpch_")), 2
    )
    if sf1_timings:
        for fam in ("tpch", "llm", "src", "refl", "op", "stream", "mm"):
            fam_t = [t for n, t in sf1_timings.items()
                     if n.startswith(f"sf1_{fam}_")]
            if fam_t:
                compact[f"sf1_{fam}_total"] = round(sum(fam_t), 2)
                compact[f"sf1_{fam}_max"] = round(max(fam_t), 2)
    if sf5_timings:
        for fam in ("tpch", "llm", "stats"):
            fam_t = [t for n, t in sf5_timings.items()
                     if n.startswith(f"sf5_{fam}_")]
            if fam_t:
                compact[f"sf5_{fam}_total"] = round(sum(fam_t), 2)
                compact[f"sf5_{fam}_max"] = round(max(fam_t), 2)
    line = {
        "metric": "suite_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": compact,
        "sf": float(sf) if sf else sf_dir,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        **({"n_errors": len(errors)} if errors else {}),
    }
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
