"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a random-hyperplane
LSH-bucketed variant as the scale path.

Cross-engine determinism: dot products and norms accumulate as
DECIMAL(28,12) (exact, associative) so Spark and DuckDB produce identical
doubles; ranking ties break on neighbor id.

Scale design: the brute-force path is a broadcast join of the (small) query
set against the corpus — O(|Q|·N) with no shuffle of the corpus. The LSH
path buckets both sides by hyperplane-sign bits so candidate generation is
an equi-join on the bucket key; recall is tuned by n_planes/n_tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _h64

DEC = "decimal(28,12)"


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact (decimal-accumulated) dot product of two float arrays."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC)
    )
    # the merge lambda must preserve the accumulator type exactly (Spark
    # widens decimal addition to (29,12)), hence the cast-back
    return F.aggregate(
        prods, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC)
    ).cast("double")


def _norm_dec(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(DEC))
    return F.sqrt(
        F.aggregate(sq, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC)).cast(
            "double"
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot_dec(a, b) / (_norm_dec(a) * _norm_dec(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Plan shape at scale: BroadcastNestedLoopJoin(queries) over a single
    full scan of the corpus — no corpus shuffle; the top-k is a per-query
    window over |Q|·N scored rows, pruned by AQE.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "nid", F.round("cos", 6).alias("cos"), F.col("rk").cast("bigint").alias("rk"))
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH (scale path)
def _plane_component(plane: int, i: int) -> Column:
    """Deterministic pseudo-random plane component in [-1000, 1000]."""
    return (_h64(F.lit(f"p{plane}:{i}"), 7) % 2001 - 1000).cast("double")


def lsh_bucket(vec: Column, table: int, n_planes: int, dim: int = 64) -> Column:
    """Bucket id for one hash table: sign bits of dot(vec, plane_j)."""
    bucket = F.lit(0).cast("bigint")
    for j in range(n_planes):
        comps = F.array(
            *[_plane_component(table * n_planes + j, i) for i in range(dim)]
        )
        d = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: (x.cast("double") * c).cast(DEC)),
            F.lit(0).cast(DEC),
            lambda acc, x: (acc + x).cast(DEC),
        ).cast("double")
        bucket = bucket + F.when(d > 0, F.lit(2**j)).otherwise(F.lit(0))
    return bucket


def _bucketed(df: DataFrame, id_alias: str, vec_alias: str, n_tables: int,
              n_planes: int, dim: int, id_col: str, vec_col: str) -> DataFrame:
    """One row per (vector, table) with that table's bucket id."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(vec_col), t, n_planes, dim).alias("bkt"),
            )
            for t in range(n_tables)
        ]
    )
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(buckets).alias("tb"),
    ).select(id_alias, vec_alias, F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 4, n_tables: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only corpus vectors sharing an LSH bucket with the
    query in at least one hash table (OR-amplification for recall).

    Equi-join on (table, bucket) → shuffle-partitioned by a uniform key;
    each bucket holds ~N/2^n_planes vectors, so cost ≈ n_tables·N·|Q|/2^p
    instead of N·|Q|. Recall < 1.0 by construction (asserted against brute
    force in tests/test_llmops.py); tune n_tables up / n_planes down for
    more recall, the reverse for more pruning."""
    q = _bucketed(queries, "qid", "qvec", n_tables, n_planes, dim, id_col, vec_col)
    c = _bucketed(corpus, "nid", "nvec", n_tables, n_planes, dim, id_col, vec_col)
    cands = (
        c.join(F.broadcast(q), ["tbl", "bkt"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "qvec", "nid", "nvec")
        .distinct()
    )
    scored = cands.withColumn("cos", cosine(F.col("qvec"), F.col("nvec")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "nid", F.round("cos", 6).alias("cos"), F.col("rk").cast("bigint").alias("rk"))
    )
