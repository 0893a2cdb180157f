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


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    big = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000

    from pyspark.sql import functions as F

    from dremio_oss_spark.operators import dedup as D
    from dremio_oss_spark.operators import text as T
    from dremio_oss_spark.operators.clustering import kmeans
    from dremio_oss_spark.session import build_spark

    spark = build_spark(app_name="scale-smoke")

    ops = {
        "exact_dedup": lambda d, v: D.exact_dedup(d),
        "minhash_lsh": lambda d, v: D.minhash_lsh_dedup(d),
        # production banding config: 64-bit signatures give 16-bit band
        # keys at max_hamming=3 (the fixture queries use the oracle's
        # 16-bit config, whose 2^4..2^6-key bands only suit small
        # corpora — SCALE.md documents the knob)
        "simhash_pairs_64bit": lambda d, v: D.simhash_near_pairs(
            D.simhash(d, bits=64), max_hamming=3, bits=64),
        "text_analysis": lambda d, v: T.with_text_analysis(d, "text"),
        "vocab_top50": lambda d, v: (
            d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
            .groupBy("tok").count().orderBy(F.desc("count")).limit(50)
        ),
        "kmeans_2iter": lambda d, v: kmeans(v, k=8, n_iters=2),
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
