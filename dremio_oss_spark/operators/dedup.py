"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Cross-engine determinism: every hash is derived from md5 (identical in Spark
and DuckDB), so the full LSH pipeline — shingles → minhash signatures → band
buckets → candidate pairs → Jaccard verify — is oracle-checkable, not just
"runs without error".

Scale design (100 TB):
- Everything is explode + groupBy + join: embarrassingly parallel, no
  driver-side collect, no per-row Python.
- MinHash/LSH replaces the O(n²) all-pairs comparison with an inverted-index
  band join: candidates = docs sharing a band bucket. Bucket join keys are
  hashes → uniformly distributed → no skew. At extreme corpus sizes, raise
  bands/rows-per-band to tune recall vs candidate volume.
- The md5-based h64 is for oracle parity at test scale; at production scale
  swap `_h64` for F.xxhash64 (single JVM hash vs 16 md5 calls) — the
  pipeline shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..localframe import meta_df

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def _hash_mode() -> str:
    """`spark.dremio.dedup.hash`: `md5` (default — cross-engine
    deterministic, what the DuckDB oracle replays) or `xxhash64` (the
    production path: ONE JVM hash call instead of an md5+substr+conv
    chain, ~10x less per-row hash CPU at 100 TB).  The switch scopes
    to the PER-SHINGLE minhash base hash (`_hbase`) only — `_h64`
    stays md5 unconditionally because simhash's oracle SQL and the
    similarity planes' hardcoded `_plane_matrix` both replay the md5
    derivation, and those are per-doc/per-plane hashes, not the hot
    path.  Only the hash expression changes — bands, buckets, joins
    and shuffles are identical, so the plan shape carries over
    verbatim."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    try:
        mode = s.conf.get("spark.dremio.dedup.hash", "md5") \
            if s is not None else "md5"
    except Exception:  # noqa: BLE001 — session mid-teardown
        mode = "md5"
    return (mode or "md5").lower()


def _h64(c: Column, seed: int) -> Column:
    """Deterministic 60-bit hash identical in Spark and DuckDB:
    first 15 hex chars of md5(seed || ':' || value).  ALWAYS md5 —
    oracle SQL replays this exact derivation (the xxhash64 conf
    deliberately does not reach here; hot paths that want the one-call
    JVM hash go through _h64_tok)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), c)), 1, 15), 16, 10)
        .cast("bigint")
    )


def _h64_tok(c: Column, seed: int) -> Column:
    """The conf-gated per-token hash for simhash: md5-derived by
    default (DuckDB-replayable — the registered queries' oracles
    replay it), ONE xxhash64 call under
    `spark.dremio.dedup.hash=xxhash64` (the production path: per-token
    is the hot hash in simhash, exactly like minhash's per-shingle
    `_hbase`).  Signed xxhash64 is masked to the same 60-bit-positive
    domain so downstream bit/band arithmetic is mode-independent; the
    plan shape (explode + groupBy + band join) is identical."""
    if _hash_mode() == "xxhash64":
        mask = (1 << 60) - 1
        return F.xxhash64(F.concat(F.lit(f"{seed}:"), c)) \
            .bitwiseAND(F.lit(mask))
    return _h64(c, seed)


def h64_sql(expr: str, seed: int) -> str:
    """DuckDB equivalent of _h64 (see tests/oracle parity)."""
    return (
        f"cast(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 15)) as bigint)"
    )


# universal hashing for minhash lanes: ONE md5 per shingle yields a 28-bit
# base hash; each lane is an affine map (a_i*h + b_i) mod P — pure int64
# arithmetic inside whole-stage codegen (vs n_hashes md5 calls per row).
# Bounds: h < 2^28, a_i < P < 2^30 -> product < 2^58, no int64 overflow in
# either engine.
_P_BASE = 268_435_399  # prime < 2^28
_P_LANE = 1_073_741_789  # prime < 2^30


def lane_params(i: int) -> tuple[int, int]:
    """Deterministic per-lane affine coefficients (shared with the oracle)."""
    return (1_000_003 * i + 12_345) % _P_LANE, (998_244_353 + 7_919 * i) % _P_LANE


def _hbase(c: Column) -> Column:
    if _hash_mode() == "xxhash64":
        # pmod: xxhash64 is signed and the lane affine maps need
        # h in [0, P) exactly like the md5 path
        return F.pmod(F.xxhash64(c), F.lit(_P_BASE)).cast("bigint")
    return (
        F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("bigint") % _P_BASE
    )


def hbase_sql(expr: str) -> str:
    return (
        f"cast(concat('0x', substr(md5({expr}), 1, 7)) as bigint) % {_P_BASE}"
    )


def _lane(h: Column, i: int) -> Column:
    a, b = lane_params(i)
    return (h * F.lit(a) + F.lit(b)) % F.lit(_P_LANE)


def lane_sql(hexpr: str, i: int) -> str:
    a, b = lane_params(i)
    return f"(({hexpr}) * {a} + {b}) % {_P_LANE}"


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: hash-groupBy on normalized content; keeps the min id as
    the canonical representative (one shuffle on the content hash —
    scales linearly, no skew for natural text).  The fingerprint IS
    text.fingerprint — one definition, so a doc's `fp` from
    with_text_analysis always joins against these groups."""
    from .text import fingerprint

    return (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .withColumnRenamed("_fp", "fp")
    )


def shingle_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 3) -> DataFrame:
    """(id, shingle) exploded table of distinct word k-grams.

    Two deliberate plan choices (each worth ~10x here):
    - materialize the token array as a column FIRST: referencing the raw
      `split(...)` expression inside the transform lambda makes Catalyst
      re-evaluate the split per element_at (O(tokens^2) per doc);
    - repartition by id before the explode: a small parquet file arrives
      as one input split, and the tokenize+explode is the expensive pass,
      so fan it out to the session's shuffle width (at 100 TB the scan is
      already wide and AQE will coalesce — the repartition is a no-op
      cost compared to an unparallelized explode).
    """
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    toks = F.col("_toks")
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)]),
    )
    empty = F.array().cast("array<string>")
    shingles = F.when(F.size(toks) >= k, F.array_distinct(grams)).otherwise(empty)
    return (
        df.repartition(n_part, id_col)
        .withColumn("_toks", F.split(F.lower(F.col(text_col)), r"\s+"))
        .select(F.col(id_col).alias("doc_id"), F.explode(shingles).alias("shingle"))
    )


def minhash_signatures(shingles: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """One row per doc with n_hashes minhash values: one md5 per shingle,
    then n_hashes affine lanes (universal hashing) folded in a single
    aggregation pass.  Accepts a pre-hashed index (a `_hb` column, see
    minhash_lsh_dedup's narrowing) and skips the md5 then."""
    based = (shingles if "_hb" in shingles.columns
             else shingles.withColumn("_hb", _hbase(F.col("shingle"))))
    # one parsed expression per lane (lane_sql is the same affine map
    # _lane built through Column ops — identical tree, 1 py4j call
    # instead of ~6 per lane; see simhash's construction-cost note)
    aggs = [F.expr(f"min({lane_sql('_hb', i)}) as mh{i}")
            for i in range(n_hashes)]
    return based.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, n_bands: int = N_BANDS,
                        rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Band the signature and self-join on (band, bucket) → candidate pairs.

    The band bucket is the md5 of the concatenated lane values; the join is
    an equi-join on a uniform key (broadcast-free, skew-free)."""
    # one parsed array(struct(...)) expression — not n_bands x
    # rows_per_band Column-API calls (construction-cost note in simhash)
    entries = ", ".join(
        "struct({b} as band, md5(concat_ws(',', {cols})) as bucket)"
        .format(b=b, cols=", ".join(f"mh{b * rows_per_band + r}"
                                    for r in range(rows_per_band)))
        for b in range(n_bands))
    bands = F.expr(f"array({entries})")
    banded = signatures.select(
        "doc_id", F.explode(bands).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # materialize the banded table once: both sides of the self-join
    # would otherwise re-run the full signature aggregation (the
    # expensive pass over the exploded shingle table).  The banded
    # table is docs x n_bands rows — corpus-metadata sized, far
    # smaller than the shingle index it derives from.
    banded = banded.localCheckpoint()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, shingles: DataFrame,
                   threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard on candidate pairs via the inverted shingle index.

    The index is semi-join pruned to docs that actually appear in a
    candidate pair BEFORE the intersection join: LSH candidates are a
    tiny fraction of the corpus, so this turns a shuffle of the full
    corpus-sized index into a shuffle of the candidates' shingles only
    (the semi join broadcasts the candidate-id set).  Verification cost
    scales with candidate volume, not corpus size."""
    cand_docs = (pairs.select(F.col("id_a").alias("doc_id"))
                 .union(pairs.select(F.col("id_b").alias("doc_id")))
                 .distinct())
    shingles = shingles.join(cand_docs, "doc_id", "left_semi")
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    # join on a 64-bit hash of the shingle, not the string: same pairs
    # (collision-free at any realistic corpus), much narrower shuffle;
    # a pre-hashed index (sh_h column) skips the hashing entirely
    hashed = (shingles.select("doc_id", "sh_h")
              if "sh_h" in shingles.columns
              else shingles.select("doc_id",
                                   F.xxhash64("shingle").alias("sh_h")))
    sa = hashed.select(F.col("doc_id").alias("id_a"), "sh_h")
    sb = hashed.select(F.col("doc_id").alias("id_b"), "sh_h")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh_h"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.5) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band → verify.

    The exploded shingle table feeds four plan branches (signatures,
    sizes, and both sides of the intersection join); materialize it
    once so the tokenize+shingle pass never re-reads the (much wider)
    text corpus per branch — at cluster scale this is the classic
    materialize-the-inverted-index step.  localCheckpoint, NOT a
    columnar cache (r14 #23, measured at the sf5 decade): building the
    MEMORY_AND_DISK columnar cache for the 13M-row index cost ~6 s
    while the whole tokenize+hash compute is 1.5 s — the cache write
    was 4x the work it saved locally; checkpoint's plain block write
    is cheaper on both ends (cold 22.1→20.5 s, warm 10.8→9.8 s,
    identical output).  On a real cluster prefer `checkpoint()` with a
    durable dir (same note as dedup_clusters' label loop).

    Bytes-narrowing (guide §2.3): the persisted index carries
    (doc_id, sh_h, _hb) — three longs — not the shingle STRINGS.  Both
    downstream consumers only ever need the hashes (signatures fold
    `_hb`, the intersection joins on `sh_h`), and every hash is computed
    exactly once, in the same single pass over the exploded shingles
    that fed the old persist — so the stored index and every shuffle
    over it shrink from string-sized to 24 B/row with zero extra hash
    work.  (Measured at the sf5 decade, JVM-isolated: cold 25.9→22.2 s,
    warm 7.9→7.4 s.  A localCheckpoint of the candidate pairs was also
    tried and REJECTED by measurement: ReuseExchange already shares the
    band-join subtree across jaccard_verify's three references within
    the single action, so the eager materialization only added a
    barrier — warm 8.3 s.)
    """
    sh = (shingle_table(df, text_col, id_col)
          .select("doc_id",
                  F.xxhash64("shingle").alias("sh_h"),
                  _hbase(F.col("shingle")).alias("_hb"))
          .localCheckpoint())
    sigs = minhash_signatures(sh)
    cands = lsh_candidate_pairs(sigs)
    return jaccard_verify(cands, sh, threshold)


def dedup_clusters(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.5,
                   max_iter: int = 20) -> DataFrame:
    """Near-dup CLUSTER resolution: connected components over the
    MinHash-LSH pair graph, with canonical-document election.

    Pairs alone don't deduplicate a corpus — A~B and B~C must collapse
    into one cluster {A,B,C} with a single survivor.  This runs
    min-label propagation over the verified pair graph: every doc starts
    labeled with its own id; each round a doc takes the min of its own
    and its neighbors' labels; at fixpoint the label is the min doc_id
    reachable in the component, which doubles as the cluster id and the
    elected canonical member.

    Two execution strategies behind a session-overridable threshold
    (`spark.dremio.dedup.clusters.driverMaxEdges`, default 2M — the
    same switch pattern as the lake-metadata planner): below it the
    verified pair list collects to the driver and an exact union-find
    with path compression resolves components with zero distributed
    rounds (the pair graph is convergence-state sized, orders of
    magnitude smaller than the corpus); above it the distributed
    label-propagation loop below runs, so a pair graph of billions of
    edges never funnels through the driver.

    Scale shape: the loop runs ONLY over vertices that appear in the
    pair graph — an isolated document can never change label, and at
    corpus scale the pair graph is orders of magnitude smaller than the
    corpus, so each round is a shuffle join over O(V_edges), not O(N).
    Isolated docs are unioned back as their own singleton clusters at
    the end (one left join, no iteration).  Each round is one shuffle
    join of the (persisted) edge list against the label table plus a
    groupBy — O(E) per round, and rounds = component diameter, which
    for near-dup clusters is small (dup clusters are dense).  Labels
    are localCheckpoint()ed per round so the loop's lineage stays flat
    (on a real cluster, prefer `checkpoint()` with a durable dir).
    Convergence is detected by the monotone label sum, one scalar agg
    per round — no row-wise diff join.

    Each round combines the neighbor-min gather with POINTER JUMPING
    (label <- label of my label's vertex — the classic PRAM
    shortcutting step, the same doubling that gives Kiveris et al.'s
    large-star/small-star its O(log n) bound): remaining chain lengths
    halve every round, so rounds = O(log diameter) instead of
    O(diameter), and the round count — hence wall-clock — is stable
    run-to-run.  The jump is one extra self-join of the (edge-vertex
    sized) label table; the invariant that a vertex's label is always
    an id inside its own component is preserved, so the fixpoint is
    unchanged: labels constant across every edge ⇒ component minimum.
    """
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    pairs = (minhash_lsh_dedup(df, text_col, id_col, threshold)
             .select("id_a", "id_b")
             .persist(StorageLevel.MEMORY_AND_DISK))
    # Threshold switch (same pattern as the lake-metadata planner's
    # distributedFileThreshold): a pair graph is usually orders of
    # magnitude smaller than the corpus, and below the threshold an
    # exact driver-side union-find with path compression resolves the
    # components in O(E α) with ZERO distributed rounds — the collect
    # is convergence-state sized, not corpus sized.  Above it, the
    # distributed label-propagation loop below runs unchanged, so a
    # 100 TB corpus whose pair graph is billions of edges never
    # funnels through the driver.  The route decision and the edge
    # fetch are ONE action: limit(max+1).collect() short-circuits as
    # soon as the cap is exceeded (a billion-edge graph never gets
    # fully counted just to pick the strategy — the old count() did).
    driver_max = int(spark.conf.get(
        "spark.dremio.dedup.clusters.driverMaxEdges", "2000000"))
    small = None
    if driver_max > 0:
        got = pairs.limit(driver_max + 1).collect()
        if len(got) <= driver_max:
            small = got
    if small is not None:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:   # path compression
                parent[x], x = r, parent[x]
            return r

        # one job, not toLocalIterator's sequential per-partition jobs:
        # the threshold already bounds this at driver_max edges
        for row in small:
            ra, rb = find(row[0]), find(row[1])
            if ra != rb:
                # union by min: smaller id becomes the root, so the
                # component label is the min member id — identical to
                # the propagation fixpoint
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        rows = [(i, find(i)) for i in parent]
        pairs.unpersist()
        idt = df.schema[id_col].dataType.simpleString()
        labels = meta_df(spark, rows, f"id {idt}, label {idt}")
        return _attach_cluster_output(df, labels, id_col)
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"),
                            F.col("id_a").alias("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        # iterate only over vertices with at least one edge
        labels = (
            edges.select(F.col("u").alias("id")).distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint()
        )
        prev_sum = None
        converged = False
        for _ in range(max_iter):
            nbr = (
                edges.join(labels, edges.v == labels.id)
                .groupBy("u").agg(F.min("label").alias("nbr_label"))
            )
            stepped = (
                labels.join(nbr, labels.id == nbr.u, "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"),
                        F.coalesce("nbr_label", F.col("label")),
                    ).alias("label"),
                )
            )
            # pointer jump: adopt my label's own label (chain
            # shortcutting)
            parents = stepped.select(F.col("id").alias("pid"),
                                     F.col("label").alias("plabel"))
            labels = (
                stepped.join(parents, stepped.label == parents.pid,
                             "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"),
                        F.coalesce("plabel", F.col("label")),
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            s = labels.agg(F.sum("label")).collect()[0][0]
            if s == prev_sum:
                converged = True
                break
            prev_sum = s
        if not converged:
            # max_iter is a backstop, not a tuning knob: with pointer
            # jumping, hitting it means a component deeper than
            # 2^max_iter — returning partially-merged clusters would
            # silently under-deduplicate, so fail loudly instead
            raise RuntimeError(
                f"dedup_clusters did not converge in {max_iter} rounds")
    finally:
        # unpersist on every exit (including the non-converged raise):
        # persisted RDD blocks would otherwise leak for the session
        edges.unpersist()
        pairs.unpersist()
    return _attach_cluster_output(df, labels, id_col)


def _attach_cluster_output(df: DataFrame, labels: DataFrame,
                           id_col: str) -> DataFrame:
    """Join resolved component labels back to the corpus: isolated docs
    rejoin as singleton clusters (label = own id), sizes and canonical
    election derive from the label table."""
    all_labels = (
        df.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("label"))
    )
    sizes = all_labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("cluster_size"))
    return all_labels.join(sizes, "label").select(
        F.col("id").alias(id_col),
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# SimHash
SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over distinct tokens: bit_j = sign of Σ ±1 where the
    sign is bit j of the token hash. One explode + one groupBy."""
    if bits > 60:
        # _h64 is 15 hex chars = 60 informative bits; asking for more
        # would silently make the top bits constant-zero, hollowing out
        # the top band's key space (a review finding: the old bits=64
        # config had a 12-bit band masquerading as 16)
        raise ValueError("simhash: bits must be <= 60 (_h64 width)")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    ).withColumn("h", _h64_tok(F.col("tok"), 0))
    # per-bit expressions as ONE parsed SQL string each, not Column-API
    # chains: every Column operator is a py4j round-trip, so the old
    # per-bit when/shiftright/sum chains cost ~10 calls x bits per
    # CONSTRUCTION (~0.6 s at 16 bits, ~4x that for the 60-bit bench
    # forms, re-paid by every sf1/sf5 decade row).  The parsed trees are
    # the identical CaseWhen/ShiftRight/Sum expressions.
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(case when (shiftright(h, {j}) & 1) = 1 "
                   f"then 1 else -1 end) as s{j}")
            for j in range(bits)
        ]
    )
    # bits <= 60: every weight fits in bigint (weights above 2^31 parse
    # as bigint literals exactly like F.lit(2**j) built LongType ones)
    sh_terms = " + ".join(
        f"(case when s{j} > 0 then {2 ** j} else 0 end)"
        for j in range(bits))
    return bit_sums.select(
        "doc_id", F.expr(f"cast({sh_terms} as bigint)").alias("simhash"))


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 2,
                       bits: int = SIMHASH_BITS) -> DataFrame:
    """All pairs within `max_hamming` bits (XOR + popcount), found via a
    banded equi-join — never an all-pairs cross join.

    Pigeonhole: split the signature into (max_hamming + 1) bit bands; a
    pair with ≤ max_hamming differing bits has at least one band with NO
    differing bit, i.e. agrees exactly on that band's key.  Each band is
    an equi-join on a small integer key, so the plan is a plain shuffled
    hash join that scales linearly with docs-per-bucket — the same
    blocking trick as MinHash-LSH banding, and exact (no recall loss)."""
    n_bands = max_hamming + 1
    width = -(-bits // n_bands)  # ceil: top band covers the leftover bits
    mask = (1 << width) - 1

    # single-parse expressions, not per-band Column-API loops (see
    # simhash's construction-cost note — these rebuild per call and the
    # bench decades re-pay them)
    def _bands(col: str) -> Column:
        entries = ", ".join(
            f"struct({b} as band, "
            f"(shiftright({col}, {b * width}) & {mask}) as key)"
            for b in range(n_bands))
        return F.expr(f"array({entries})")

    # A close pair can collide in several bands; emit it exactly once by
    # keeping only the FIRST band where the keys agree (for band b:
    # every earlier band must differ).  Pure codegen'd bit math on the
    # carried signatures — no distinct, so nothing quadratic is ever
    # shuffled: the only shuffles are the banded equi-joins themselves.
    conds = " and ".join(
        f"(band <= {bp} or (shiftright(ha, {bp * width}) & {mask}) != "
        f"(shiftright(hb, {bp * width}) & {mask}))"
        for bp in range(n_bands - 1))
    first_band = F.expr(conds) if conds else F.lit(True)

    # NARROW signatures (the oracle fixture's 16-bit form): the banded
    # key domain is tiny (16 values per band at bits=16/hamming=3), so
    # the doc-level band join degenerates toward all-pairs as the corpus
    # grows.  But the SIGNATURE space is bounded at 2^bits — run the
    # pair search in DISTINCT-signature space (candidate work bounded by
    # min(m, 2^bits)² instead of n²) and expand back to doc ids through
    # two equi-joins whose output IS the result set.  Same pairs, same
    # hammings, each emitted exactly once: equal-sig pairs come from the
    # within-group arm, different-sig pairs from the canonical (ha < hb)
    # sig pair expanded over its two disjoint doc groups.  Wide
    # signatures (the 60-bit production width) keep the direct banded
    # join — there distinct sigs ≈ docs and the extra joins buy nothing.
    try:
        sig_cap = int(sh.sparkSession.conf.get(
            "spark.dremio.dedup.simhash.distinctSigMaxSpace",
            str(1 << 20)))
    except (TypeError, ValueError):
        sig_cap = 1 << 20
    if (1 << bits) <= sig_cap:
        sigs = sh.select("simhash").distinct()
        sb = sigs.select(
            F.col("simhash"), F.explode(_bands("simhash")).alias("bb")
        ).select("simhash", F.col("bb.band").alias("band"),
                 F.col("bb.key").alias("key"))
        pa = sb.select(F.col("simhash").alias("ha"), "band", "key")
        pb = sb.select(F.col("simhash").alias("hb"), "band", "key")
        sig_pairs = (
            pa.join(pb, ["band", "key"])
            .where(F.col("ha") < F.col("hb"))
            .where(first_band)
            .withColumn("hamming",
                        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
            .where(F.col("hamming") <= max_hamming)
            .select("ha", "hb", "hamming")
        )
        da = sh.select(F.col("doc_id").alias("id_x"),
                       F.col("simhash").alias("ha"))
        db = sh.select(F.col("doc_id").alias("id_y"),
                       F.col("simhash").alias("hb"))
        cross = (sig_pairs.join(da, "ha").join(db, "hb")
                 .select(F.least("id_x", "id_y").alias("id_a"),
                         F.greatest("id_x", "id_y").alias("id_b"),
                         "hamming"))
        same = (sh.select(F.col("doc_id").alias("id_a"), "simhash")
                .join(sh.select(F.col("doc_id").alias("id_b"), "simhash"),
                      "simhash")
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        F.lit(0).cast("integer").alias("hamming")))
        return cross.unionByName(same)

    banded = sh.select(
        "doc_id", F.col("simhash"), F.explode(_bands("simhash")).alias("bb")
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.key").alias("key"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"), "band", "key"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(first_band)
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.4,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard near-dups via inverted index (no LSH filter):
    docs sharing ≥1 shingle are scored exactly. The shingle join IS the
    blocking strategy — cost is Σ bucket² over shared shingles.

    `max_doc_freq` caps the inverted-index bucket size: a stopword-ish
    shingle appearing in more than that many docs is dropped from the
    CANDIDATE join only (sizes still count it), turning the worst-case
    Σ df² blowup into Σ min(df, cap)².  Capped pairs lose at most
    (dropped ∩) from n_inter, so reported jaccard is a lower bound —
    exact for every pair that shares any sub-cap shingle's full set.
    Default None keeps the exact semantics (the oracle-checked query
    uses None at test scale; at corpus scale set ~1000)."""
    from pyspark.storagelevel import StorageLevel

    # hashed inverted index feeds sizes + both join sides: persist once
    hashed = (
        shingle_table(df, text_col, id_col, k)
        .select("doc_id", F.xxhash64("shingle").alias("sh_h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = hashed
    if max_doc_freq is not None:
        rare = (
            hashed.groupBy("sh_h")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("sh_h")
        )
        joinable = hashed.join(rare, "sh_h")  # shuffle-free under AQE if small
    sa = joinable.select(F.col("doc_id").alias("id_a"), "sh_h")
    sb = joinable.select(F.col("doc_id").alias("id_b"), "sh_h")
    inter = (
        sa.join(sb, "sh_h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
def decontaminate(train: DataFrame, eval_set: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = 5) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word k-gram with an evaluation set (the standard test-set-overlap
    filter an LLM training pipeline runs before training; no reference
    equivalent — LLM-pipeline extension per the build brief).

    One row per CONTAMINATED training doc: distinct shared k-grams and
    how many eval docs they touch.

    Scale shape: both sides reuse the shingle explode; the join is a
    shingle equi-join where the EVAL side is the small one (eval sets
    are benchmark-sized) — broadcastable, so the training corpus is
    never shuffled; the groupBy aggregates only the hit rows.  Hot
    k-grams are rarer than at k=3 (stopword runs die out by k=5), and a
    document-frequency cap on the eval side bounds worst-case skew the
    same way ngram_jaccard's cap does.
    """
    train_sh = shingle_table(train, text_col, id_col, k)
    eval_sh = (
        shingle_table(eval_set, text_col, id_col, k)
        .withColumnRenamed("doc_id", "eval_id")
    )
    hits = train_sh.join(F.broadcast(eval_sh), "shingle")
    return hits.groupBy("doc_id").agg(
        F.count_distinct("shingle").cast("bigint").alias("n_shared_kgrams"),
        F.count_distinct("eval_id").cast("bigint").alias("n_eval_docs"),
    )


def span_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", k: int = 8) -> DataFrame:
    """EXACT-SUBSTRING (span) dedup — the training-data pass of Lee et
    al., "Deduplicating Training Data Makes Language Models Better"
    (ACL'22): find every k-token span that occurs more than once across
    the corpus, keep the FIRST occurrence (by doc id, then position)
    and mark every later occurrence's token positions for removal.
    Unlike document-level dedup (exact/MinHash above), this removes
    boilerplate repeated INSIDE otherwise-unique documents — the case
    that inflates memorization.

    Spark-first shape (scales to 100 TB):
    - tokenization and span hashing are ROW-LOCAL: the token array
      materializes once per doc, spans hash via md5 inside codegen
      (md5 for DuckDB-oracle parity; swap xxhash64 in production, same
      plan), and only (id, pos, hash) rows explode — k-fold smaller
      than exploding tokens;
    - first-occurrence ranking is ONE shuffle on the span hash
      (uniform — hashes of natural text don't skew);
    - duplicate spans explode to their covered positions and aggregate
      per doc (second shuffle, doc-id keyed), then join back to the
      doc table (third, same key — AQE broadcasts when small).

    Returns one row per input doc:
    (id_col, n_tokens, n_dup_spans, n_tokens_removed)."""
    from pyspark.sql import Window

    toks = F.split(F.regexp_replace(F.trim(F.col(text_col)),
                                    r"\s+", " "), " ")
    base = df.select(F.col(id_col), toks.alias("toks")) \
        .withColumn("n", F.size("toks"))
    spans = (
        base.where(F.col("n") >= k)
        .select(id_col, "toks",
                F.explode(F.sequence(
                    F.lit(1), F.col("n") - F.lit(k) + 1)).alias("p"))
        .select(id_col, "p",
                F.md5(F.concat_ws(
                    " ", F.slice(F.col("toks"), F.col("p"), k)))
                .alias("h"))
    )
    ranked = spans.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("h").orderBy(id_col, "p")))
    dups = ranked.where(F.col("rn") > 1)
    dead = (
        dups.select(id_col,
                    F.explode(F.sequence(
                        F.col("p"), F.col("p") + F.lit(k - 1)))
                    .alias("q"))
        .groupBy(id_col)
        .agg(F.countDistinct("q").alias("n_tokens_removed"))
    )
    ndup = dups.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"))
    return (
        base.select(id_col, F.col("n").cast("long").alias("n_tokens"))
        .join(ndup, id_col, "left")
        .join(dead, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long")
            .alias("n_dup_spans"),
            F.coalesce("n_tokens_removed", F.lit(0)).cast("long")
            .alias("n_tokens_removed"),
        )
    )
