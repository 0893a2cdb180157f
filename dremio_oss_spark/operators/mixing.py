"""Training-data mixture, sampling, and sequence packing: the operators
that sit between a curated corpus and a pretraining dataloader
(weighted_mixture, temperature_mixture, stratified_sample,
pack_sequences).

Not reference-derived (dremio-oss stops at SQL); designed Spark-first
for the 100 TB training-data pipeline the repo extends toward:

- `weighted_mixture`: deterministic per-source up/down-sampling.  Each
  document's copy count is a pure function of (id, weight) — integer
  copies plus an md5-hash Bernoulli for the fraction — so mixtures are
  reproducible run-over-run and stable under corpus growth (adding docs
  never changes another doc's fate, the property rand()-based sampling
  lacks).  Row-local: no shuffle; upsampling is a per-row explode.

- `pack_sequences`: concat-and-chunk packing (the standard pretraining
  layout: documents concatenated in a deterministic order, the token
  stream cut every `context_len` tokens).  Needs a GLOBAL prefix sum of
  token counts, which is the classic distributed-scan trap: a bare
  `Window.orderBy` without partitioning collapses to ONE task.  The
  implementation is the two-phase parallel prefix sum instead —
  range-partition by the order key, per-partition window cumsum, then
  add per-partition offsets (a numPartitions-sized driver collect)
  broadcast back.  O(n log n) fully parallel; the only driver state is
  one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^7: the md5-prefix bucket space used across the repo's deterministic
# hash-based operators (corpus split, curation ledger)
_HASH_SPACE = 268_435_456


def _unit_hash(tag: str, id_col) -> "F.Column":
    """Deterministic u in [0, 1): md5-prefix of 'tag:id', base-16."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{tag}:"), id_col.cast("string"))),
            1, 7), 16, 10).cast("bigint") / F.lit(float(_HASH_SPACE))
    )


def weighted_mixture(df: DataFrame, source_col: str, id_col: str,
                     weights: dict[str, float],
                     default_weight: float = 1.0) -> DataFrame:
    """Resample `df` so each source appears with its target weight:
    weight 0.25 keeps a deterministic quarter of that source, weight
    2.5 emits two copies of every doc plus a deterministic half for the
    third.  Adds `copy_idx` (0-based) per emitted copy."""
    w = F.lit(float(default_weight))
    for name, wt in weights.items():
        w = F.when(F.col(source_col) == name, F.lit(float(wt))).otherwise(w)
    u = _unit_hash("mix", F.col(id_col))
    n_copies = (F.floor(w) + (u < (w - F.floor(w))).cast("bigint")) \
        .cast("int")
    return (df.withColumn("__n_copies", n_copies)
            .where(F.col("__n_copies") > 0)
            .withColumn("copy_idx", F.explode(
                F.sequence(F.lit(0), F.col("__n_copies") - 1)))
            .drop("__n_copies"))


def pack_sequences(df: DataFrame, token_col: str, order_col: str,
                   context_len: int, num_partitions: int = 32) -> DataFrame:
    """Concat-and-chunk packing: documents ordered by `order_col` form
    one token stream cut every `context_len` tokens.  Adds per doc:
    `cum_before` (tokens before it in the stream), `start_chunk`,
    `end_chunk` (chunks it touches — a doc may straddle a boundary),
    `offset_in_chunk`."""
    from pyspark.sql import Window

    part = (df.repartitionByRange(num_partitions, F.col(order_col))
            .withColumn("__pid", F.spark_partition_id()))
    # PIN the partition assignment: RangePartitioner samples bounds with
    # a per-job seed, so without persistence the offsets collect and the
    # final job could place rows in DIFFERENT partitions — offsets would
    # then be added to the wrong local cumsums
    part = part.persist()
    # phase 1: per-partition exclusive running sum
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    part = part.withColumn(
        "__local_before", F.coalesce(F.sum(token_col).over(w), F.lit(0)))
    # phase 2: partition offsets — numPartitions rows to the driver
    # (this action also materializes the pinned partitioning)
    totals = {r["__pid"]: r["t"] for r in
              part.groupBy("__pid").agg(
                  F.sum(token_col).alias("t")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.lit(0)
    for pid, o in offsets.items():
        off = F.when(F.col("__pid") == pid, F.lit(int(o))).otherwise(off)
    cum_before = (F.col("__local_before") + off).cast("bigint")
    L = F.lit(int(context_len))
    return (part
            .withColumn("cum_before", cum_before)
            .withColumn("start_chunk",
                        F.floor(F.col("cum_before") / L).cast("bigint"))
            .withColumn(
                "end_chunk",
                F.floor((F.col("cum_before") + F.col(token_col) - 1) / L)
                .cast("bigint"))
            .withColumn("offset_in_chunk",
                        (F.col("cum_before") % L).cast("bigint"))
            .drop("__pid", "__local_before"))


def stratified_sample(df: DataFrame, strata_cols: list[str],
                      id_col: str, k: int,
                      safety: float = 4.0) -> DataFrame:
    """Deterministic EXACT-k per-stratum sample: for every combination
    of `strata_cols`, keep exactly min(k, stratum size) rows — the rows
    with the k smallest md5 ranks of `id_col` — plus their
    `sample_rank` (1-based).  Fixed-size per-stratum samples are the
    eval-set / ablation-split primitive a mixture weight (a FRACTION,
    `weighted_mixture`) cannot express.

    Determinism: the rank is md5('strat:' || id), a pure function of
    the row — reproducible run-over-run, stable under corpus growth
    (new rows displace at most the largest ranks), and independent of
    partitioning.

    Scale shape — the naive plan (row_number over every stratum) sorts
    WHOLE strata, one task per stratum: with 20 language buckets on
    100 TB that is 20 tasks sorting 5 TB each.  Instead, two phases:

    1. PREFILTER row-locally on a hash cutoff derived from per-stratum
       counts (one metadata-sized groupBy): cutoff ≈ safety*k/n keeps
       ~safety*k candidate rows per stratum — survivor volume scales
       with strata*k, not corpus size.
    2. Window row_number over the SURVIVORS only (k-scale sorts), then
       keep rank <= k.

    The cutoff is probabilistic, so phase 2 VERIFIES coverage: any
    stratum whose survivor count is below min(k, n) (the k-th smallest
    rank landed above the cutoff) gets its cutoff doubled and re-runs —
    the loop is exact-by-assertion, not exact-in-expectation.  At
    safety=4 the first pass covers all strata with overwhelming
    probability (Chernoff: P[Binomial(n, 4k/n) < k] < exp(-k))."""
    from pyspark.sql import Window

    strat = F.concat_ws("\x1f", *[F.col(c) for c in strata_cols])
    rank_hex = F.md5(F.concat(F.lit("strat:"), strat, F.lit(":"),
                              F.col(id_col).cast("string")))
    base = df.withColumn("__rank_hex", rank_hex)
    counts = (base.groupBy(*strata_cols)
              .agg(F.count(F.lit(1)).alias("__n")))

    def _ns_join(left, right, how="inner"):
        """NULL-SAFE strata join: groupBy emits a null-stratum group,
        but a plain equi-join drops its rows (null != null) — here
        that would widen the cutoff FOREVER (zero survivors can never
        satisfy coverage for a stratum the join cannot reach)."""
        r2 = right
        for i, c in enumerate(strata_cols):
            r2 = r2.withColumnRenamed(c, f"__s{i}")
        cond = None
        for i, c in enumerate(strata_cols):
            e = left[c].eqNullSafe(r2[f"__s{i}"])
            cond = e if cond is None else (cond & e)
        return (left.join(F.broadcast(r2), cond, how)
                .drop(*[f"__s{i}" for i in range(len(strata_cols))]))

    mult = float(safety)
    while True:
        # per-stratum cutoff as an md5-prefix threshold: u < mult*k/n
        cut = (counts.withColumn(
            "__cut", F.least(F.lit(1.0),
                             F.lit(mult) * F.lit(float(k)) / F.col("__n"))))
        u = (F.conv(F.substring("__rank_hex", 1, 7), 16, 10)
             .cast("bigint") / F.lit(float(_HASH_SPACE)))
        survivors = _ns_join(base, cut).where(u < F.col("__cut"))
        w = Window.partitionBy(*strata_cols).orderBy("__rank_hex")
        ranked = (survivors
                  .withColumn("sample_rank", F.row_number().over(w))
                  .persist())
        # coverage check: every stratum must retain min(k, n) rows —
        # strata-count sized, never corpus sized.  Anchored on `counts`
        # with a LEFT join so a stratum whose cutoff kept ZERO rows
        # (absent from `ranked` entirely) still reads as short instead
        # of silently vanishing from an inner join
        short = (_ns_join(counts,
                          ranked.groupBy(*strata_cols)
                          .agg(F.count(F.lit(1)).alias("__kept")),
                          how="left")
                 .where(F.coalesce("__kept", F.lit(0))
                        < F.least(F.lit(k), F.col("__n")))
                 .count())
        if short == 0:
            out = (ranked.where(F.col("sample_rank") <= k)
                   .drop("__rank_hex", "__cut", "__n"))
            # materialize while persisted lineage is valid, then free
            out = out.localCheckpoint()
            ranked.unpersist()
            return out
        ranked.unpersist()
        mult *= 2.0


def temperature_mixture(df: DataFrame, stratum_col: str, id_col: str,
                        temperature: float) -> DataFrame:
    """Temperature-based domain rebalancing (the standard multilingual/
    domain sampling policy: sample stratum i with probability
    proportional to n_i^T, T in (0, 1] — T=1 is natural sampling, T→0
    approaches uniform over strata).  The corpus total is preserved in
    expectation: stratum i's resampling weight is

        w_i = (n_i^T / sum_j n_j^T) * N / n_i

    and each row emits floor(w_i) copies plus an md5-Bernoulli for the
    fraction — the same deterministic, row-local scheme as
    `weighted_mixture`, so results are reproducible and adding a doc
    never changes another doc's fate.  Adds `copy_idx` and the realized
    `mix_weight`.

    Scale shape: ONE metadata-sized groupBy for counts; the weight
    table is strata-bounded and broadcast; copy emission is row-local
    explode (no shuffle of the corpus).  Weights round to 6 decimals so
    the fraction threshold is reproducible across engines (the oracle
    recomputes the same closed form)."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum("__n").alias("__tot"),
        F.sum(F.pow(F.col("__n").cast("double"),
                    F.lit(float(temperature)))).alias("__Z"))
    w = (counts.crossJoin(F.broadcast(tot))
         .select(stratum_col,
                 F.round(
                     F.pow(F.col("__n").cast("double"),
                           F.lit(float(temperature)))
                     / F.col("__Z")
                     * F.col("__tot") / F.col("__n").cast("double"),
                     6).alias("mix_weight")))
    u = _unit_hash("temp", F.col(id_col))
    wf = F.col("mix_weight")
    n_copies = (F.floor(wf)
                + (u < F.round(wf - F.floor(wf), 6)).cast("bigint")) \
        .cast("int")
    # NULL-SAFE weight attach: groupBy emits a null-stratum group, but
    # a plain equi-join would drop its rows (null != null) — a corpus
    # with unlabeled documents must not silently lose them
    w = w.withColumnRenamed(stratum_col, "__strat")
    return (df.join(F.broadcast(w),
                    F.col(stratum_col).eqNullSafe(F.col("__strat")))
            .drop("__strat")
            .withColumn("__n_copies", n_copies)
            .where(F.col("__n_copies") > 0)
            .withColumn("copy_idx", F.explode(
                F.sequence(F.lit(0), F.col("__n_copies") - 1)))
            .drop("__n_copies"))


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", chunk_tokens: int = 64,
                    stride: int = 48) -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context
    pretraining prep step: each document becomes sliding windows of
    `chunk_tokens` whitespace tokens advancing by `stride`).  Distinct
    from `pack_sequences` (which concatenates ACROSS documents and cuts
    a global stream): chunking is per-document, preserves provenance
    (`doc_id`, `chunk_idx`), and overlaps windows so no boundary
    context is lost.

    Window rule (the standard overflowing-tokens contract): windows
    start at 0, stride, 2*stride, ... and the LAST window is the first
    one reaching the end — n_chunks = ceil(max(n - chunk_tokens, 0) /
    stride) + 1.  A document shorter than one window emits exactly one
    (short) chunk; no window is ever fully contained in its
    predecessor.

    Scale shape: ROW-LOCAL — split, explode, slice, join are all JVM
    expressions inside whole-stage codegen; zero shuffles, zero Python.
    Output grows by the overlap factor chunk_tokens/stride (bounded,
    chosen by the caller)."""
    if chunk_tokens <= 0 or stride <= 0 or stride > chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = (F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0))
        / F.lit(float(stride))) + 1).cast("int")
    ctoks = F.slice(F.col("__toks"),
                    F.col("chunk_idx") * stride + 1, chunk_tokens)
    return (df
            .withColumn("__toks", toks)
            .withColumn("n_doc_tokens", n.cast("bigint"))
            .withColumn("chunk_idx", F.explode(
                F.sequence(F.lit(0), n_chunks - 1)))
            .withColumn("chunk_text", F.array_join(ctoks, " "))
            .withColumn("chunk_tokens",
                        F.size(ctoks).cast("bigint"))
            .drop("__toks", text_col))


def global_shuffle(df: DataFrame, id_col: str, seed: str = "0",
                   shard_size: int = 1024,
                   num_partitions: int = 32) -> DataFrame:
    """Deterministic global shuffle + shard assignment (the dataloader
    handoff: pretraining wants documents in a reproducible pseudo-random
    order, cut into fixed-size shards).  The order key is
    md5('shuf<seed>:' || id) — a pure function of (seed, id), so the
    permutation is reproducible run-over-run and changes wholesale with
    the seed.  Adds `shuffle_rank` (0-based global position) and
    `shard` (= rank // shard_size).

    Scale shape: the global rank is the same two-phase distributed
    prefix count as `pack_sequences` — range-partition by the hash key,
    per-partition row_number, add broadcast per-partition offsets.  No
    single-task window; driver state is one row per partition.  The
    hash key is near-uniform, so range partitions are balanced with no
    sampling skew."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"shuf{seed}:"),
                         F.col(id_col).cast("string")))
    part = (df.withColumn("__k", key)
            .repartitionByRange(num_partitions, F.col("__k"))
            .withColumn("__pid", F.spark_partition_id()))
    # PIN the partition assignment (RangePartitioner samples bounds per
    # job — same trap as pack_sequences): persist before the offsets
    # collect so the final job reads the identical placement
    part = part.persist()
    w = Window.partitionBy("__pid").orderBy("__k")
    part = part.withColumn("__local_rank",
                           F.row_number().over(w) - F.lit(1))
    counts = {r["__pid"]: r["c"] for r in
              part.groupBy("__pid").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.lit(0)
    for pid, o in offsets.items():
        off = F.when(F.col("__pid") == pid, F.lit(int(o))).otherwise(off)
    return (part
            .withColumn("shuffle_rank",
                        (F.col("__local_rank") + off).cast("bigint"))
            .withColumn("shard",
                        F.floor(F.col("shuffle_rank")
                                / F.lit(int(shard_size))).cast("bigint"))
            .drop("__pid", "__local_rank", "__k"))
