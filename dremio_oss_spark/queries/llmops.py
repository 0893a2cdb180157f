"""Training-data pipeline queries: dedup, similarity search, text analysis.

These go beyond the reference's operator inventory (dremio-oss has no
dedup/ANN/text operators) — they're the large-scale-pipeline extensions the
engine adds, exercised over the driver's `documents` and `embeddings`
tables with full DuckDB oracles wherever the semantics are SQL-expressible.

Every hash in the dedup pipelines derives from md5 (identical across
engines), so even MinHash-LSH candidate generation is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as T
from ..operators.dedup import h64_sql, hbase_sql, lane_sql


# --------------------------------------------------------------------------
# Text analysis
def llm_text_analysis(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return (
        T.with_text_analysis(docs, "text")
        .select(
            "doc_id",
            "n_tokens",
            "n_bpe_tokens",
            "score_en",
            "score_es",
            "score_fr",
            "score_de",
            "lang_pred",
            "n_words",
            "mean_word_len",
            "punct_ratio",
            "stopword_ratio",
            "quality_score",
            "fp",
        )
        .orderBy("doc_id")
    )


_MARKER_PATTERNS = {
    lang: r"\b(" + "|".join(words) + r")\b" for lang, words in T.LANG_MARKERS.items()
}

_SCORE_EXPRS = "\n".join(
    f"       round(len(regexp_extract_all(lower(text), '{pat}')) / n_tok, 6) as score_{lang},"
    for lang, pat in _MARKER_PATTERNS.items()
)

_RAW_SCORE = {
    lang: f"(len(regexp_extract_all(lower(text), '{pat}')) / n_tok)"
    for lang, pat in _MARKER_PATTERNS.items()
}

LLM_TEXT_ANALYSIS_SQL = f"""
with base as (
  select *, cast(len(string_split_regex(lower(text), '\\s+')) as bigint) as n_tok
  from documents
), scored as (
  select doc_id, text, n_tok,
         n_tok as n_tokens,
         cast(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) as bigint) as n_bpe_tokens,
{_SCORE_EXPRS}
         greatest({_RAW_SCORE['en']}, {_RAW_SCORE['es']}, {_RAW_SCORE['fr']}, {_RAW_SCORE['de']}) as mscore,
         cast(length(text) as bigint) as n_chars2,
         n_tok as n_words,
         round((length(text) - n_tok + 1) / n_tok, 6) as mean_word_len,
         round(len(regexp_extract_all(text, '[^\\w\\s]')) / length(text), 6) as punct_ratio,
         round(len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["en"]}')) / n_tok, 6) as stopword_ratio,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) as fp
  from base
)
select doc_id, n_tokens, n_bpe_tokens, score_en, score_es, score_fr, score_de,
       case when mscore is null or mscore = 0 then 'und'
            when {_RAW_SCORE['fr']} = mscore then 'fr'
            when {_RAW_SCORE['es']} = mscore then 'es'
            when {_RAW_SCORE['en']} = mscore then 'en'
            else 'de' end as lang_pred,
       n_words, mean_word_len, punct_ratio, stopword_ratio,
       round(
         (case when n_words between 10 and 100000 then 0.4 else 0.0 end)
         + (case when (length(text) - n_tok + 1) / n_tok between 2 and 12 then 0.3 else 0.0 end)
         + (case when len(regexp_extract_all(text, '[^\\w\\s]')) / length(text) < 0.2 then 0.1 else 0.0 end)
         + (case when len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["en"]}')) / n_tok > 0.05 then 0.2 else 0.0 end)
       , 6) as quality_score,
       fp
from scored
order by doc_id
"""


# --------------------------------------------------------------------------
# Exact dedup
def llm_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_dedup(load(spark, sf, "documents")).orderBy("fp")


LLM_EXACT_DEDUP_SQL = """
select md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) as fp,
       min(doc_id) as canonical_id,
       count(*) as n_copies
from documents
group by 1
order by fp
"""


# --------------------------------------------------------------------------
# Exact-substring (span) dedup — Lee et al., "Deduplicating Training
# Data Makes Language Models Better": duplicated k-token spans ACROSS
# the corpus, first occurrence kept, later occurrences' positions marked
def llm_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return D.span_dedup(load(spark, sf, "documents"), k=8) \
        .orderBy("doc_id")


LLM_SPAN_DEDUP_SQL = """
with d as (
  select doc_id,
         string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ')
           as toks
  from documents
), base as (
  select doc_id, len(toks) as n, toks from d
), spans as (
  select doc_id, t.i as p,
         md5(array_to_string(toks[t.i:t.i+7], ' ')) as h
  from base, unnest(range(1, n - 8 + 2)) as t(i)
  where n >= 8
), ranked as (
  select doc_id, p,
         row_number() over (partition by h order by doc_id, p) as rn
  from spans
), dups as (
  select doc_id, p from ranked where rn > 1
), dead as (
  select doc_id, count(distinct t.q) as n_tokens_removed
  from dups, unnest(range(p, p + 8)) as t(q)
  group by doc_id
), ndup as (
  select doc_id, count(*) as n_dup_spans from dups group by doc_id
)
select b.doc_id,
       cast(b.n as bigint) as n_tokens,
       cast(coalesce(nd.n_dup_spans, 0) as bigint) as n_dup_spans,
       cast(coalesce(de.n_tokens_removed, 0) as bigint)
         as n_tokens_removed
from base b
left join ndup nd using (doc_id)
left join dead de using (doc_id)
order by b.doc_id
"""


# --------------------------------------------------------------------------
# MinHash + LSH near-dup pairs (full pipeline, oracle-checked)
def llm_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return D.minhash_lsh_dedup(load(spark, sf, "documents")).orderBy("id_a", "id_b")


_MH_COLS = ",\n         ".join(
    f"min({lane_sql('hb', i)}) as mh{i}" for i in range(D.N_HASHES)
)
_BAND_SELECTS = "\n  union all\n".join(
    "  select doc_id, {b} as band, md5(concat_ws(',', {cols})) as bucket from sigs".format(
        b=b,
        cols=", ".join(f"mh{b * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)),
    )
    for b in range(D.N_BANDS)
)

_MINHASH_PAIRS_BASE_SQL = f"""
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t from documents
), sh as (
  select doc_id,
         unnest(list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) as shingle
  from toks
  where len(t) >= 3
), shb as (
  select doc_id, shingle, {hbase_sql('shingle')} as hb from sh
), sigs as (
  select doc_id, {_MH_COLS}
  from shb group by doc_id
), banded as (
{_BAND_SELECTS}
), cands as (
  select distinct a.doc_id as id_a, b.doc_id as id_b
  from banded a join banded b
    on a.band = b.band and a.bucket = b.bucket and a.doc_id < b.doc_id
), sizes as (
  select doc_id, count(*) as n_sh from sh group by doc_id
), inter as (
  select c.id_a, c.id_b, count(*) as n_inter
  from cands c
  join sh sa on sa.doc_id = c.id_a
  join sh sb on sb.doc_id = c.id_b and sb.shingle = sa.shingle
  group by c.id_a, c.id_b
)
select i.id_a, i.id_b, i.n_inter,
       round(i.n_inter / (na.n_sh + nb.n_sh - i.n_inter), 6) as jaccard
from inter i
join sizes na on na.doc_id = i.id_a
join sizes nb on nb.doc_id = i.id_b
where i.n_inter / (na.n_sh + nb.n_sh - i.n_inter) >= 0.5
"""

LLM_MINHASH_LSH_SQL = _MINHASH_PAIRS_BASE_SQL + "\norder by id_a, id_b\n"


# --------------------------------------------------------------------------
# Near-dup cluster resolution (connected components + canonical election)
def llm_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Pairs → clusters: min-label propagation over the MinHash-LSH pair
    graph; cluster id = min reachable doc_id = elected canonical."""
    return D.dedup_clusters(load(spark, sf, "documents")).orderBy("doc_id")


# Oracle: transitive closure by recursive CTE over the SAME verified pair
# set, min reachable id per doc — exactly what label propagation fixes to.
LLM_DEDUP_CLUSTERS_SQL = f"""
with recursive pairs as ({_MINHASH_PAIRS_BASE_SQL}),
edges as (
  select id_a as u, id_b as v from pairs
  union all
  select id_b as u, id_a as v from pairs
),
reach(src, dst) as (
  select doc_id, doc_id from documents
  union
  select r.src, e.v from reach r join edges e on e.u = r.dst
),
lab as (
  select src as doc_id, min(dst) as cluster_id from reach group by src
),
sz as (
  select cluster_id, cast(count(*) as bigint) as cluster_size
  from lab group by cluster_id
)
select l.doc_id, l.cluster_id, s.cluster_size,
       l.doc_id = l.cluster_id as is_canonical
from lab l
join sz s on s.cluster_id = l.cluster_id
order by l.doc_id
"""



# --------------------------------------------------------------------------
# SimHash signatures + near pairs
def llm_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return D.simhash(load(spark, sf, "documents")).orderBy("doc_id")


_BIT_SUMS = ",\n         ".join(
    f"sum(case when (h >> {j}) & 1 = 1 then 1 else -1 end) as s{j}"
    for j in range(D.SIMHASH_BITS)
)
_SH_EXPR = " + ".join(
    f"(case when s{j} > 0 then {2**j} else 0 end)" for j in range(D.SIMHASH_BITS)
)

LLM_SIMHASH_SQL = f"""
with toks as (
  select doc_id,
         unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) as tok
  from documents
), h as (
  select doc_id, {h64_sql('tok', 0)} as h from toks
), bits as (
  select doc_id, {_BIT_SUMS}
  from h group by doc_id
)
select doc_id, cast({_SH_EXPR} as bigint) as simhash
from bits
order by doc_id
"""


def llm_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    sh = D.simhash(load(spark, sf, "documents"))
    return D.simhash_near_pairs(sh, max_hamming=3).orderBy("id_a", "id_b")


LLM_SIMHASH_PAIRS_SQL = f"""
with toks as (
  select doc_id,
         unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) as tok
  from documents
), h as (
  select doc_id, {h64_sql('tok', 0)} as h from toks
), bits as (
  select doc_id, {_BIT_SUMS}
  from h group by doc_id
), sig as (
  select doc_id, cast({_SH_EXPR} as bigint) as simhash from bits
)
select a.doc_id as id_a, b.doc_id as id_b,
       bit_count(xor(a.simhash, b.simhash)) as hamming
from sig a join sig b on a.doc_id < b.doc_id
where bit_count(xor(a.simhash, b.simhash)) <= 3
order by id_a, id_b
"""


# --------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index
def llm_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.4).orderBy(
        "id_a", "id_b"
    )


def llm_decontamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 17 == 0 stand in
    for an eval set; every training doc sharing a word 5-gram with it is
    flagged with the shared-gram and eval-doc counts (the test-set
    overlap filter run before LLM training; LLM-pipeline extension, no
    reference equivalent)."""
    docs = load(spark, sf, "documents")
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    return D.decontaminate(tr, ev, k=5).orderBy("doc_id")


LLM_DECONTAMINATION_SQL = """
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t from documents
), sh as (
  select doc_id,
         unnest(list_distinct(list_transform(range(0, greatest(len(t)-4, 0)),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5]))))
           as shingle
  from toks
  where len(t) >= 5
), ev as (
  select doc_id as eval_id, shingle from sh where doc_id % 17 = 0
), tr as (
  select doc_id, shingle from sh where doc_id % 17 <> 0
), hits as (
  select tr.doc_id, tr.shingle, ev.eval_id from tr join ev using (shingle)
)
select doc_id,
       cast(count(distinct shingle) as bigint) as n_shared_kgrams,
       cast(count(distinct eval_id) as bigint) as n_eval_docs
from hits
group by doc_id
order by doc_id
"""


LLM_NGRAM_JACCARD_SQL = """
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t from documents
), sh as (
  select doc_id,
         unnest(list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) as shingle
  from toks
  where len(t) >= 3
), sizes as (
  select doc_id, count(*) as n_sh from sh group by doc_id
), inter as (
  select sa.doc_id as id_a, sb.doc_id as id_b, count(*) as n_inter
  from sh sa join sh sb on sa.shingle = sb.shingle and sa.doc_id < sb.doc_id
  group by 1, 2
)
select i.id_a, i.id_b,
       round(i.n_inter / (na.n_sh + nb.n_sh - i.n_inter), 6) as jaccard
from inter i
join sizes na on na.doc_id = i.id_a
join sizes nb on nb.doc_id = i.id_b
where i.n_inter / (na.n_sh + nb.n_sh - i.n_inter) >= 0.4
order by id_a, id_b
"""


# --------------------------------------------------------------------------
# Similarity search: exact brute-force cosine top-k (oracle-checked)
def llm_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return S.brute_force_topk(emb, queries, k=5).orderBy("qid", "rk")


LLM_COSINE_TOPK_SQL = """
with q as (
  select vec_id as qid, embedding as qv from embeddings where vec_id < 10
), c as (
  select vec_id as nid, embedding as nv from embeddings
), flat as (
  select qid, nid,
         cast(qv[u.i] as double) as a, cast(nv[u.i] as double) as b
  from q, c, unnest(range(1, 65)) as u(i)
  where qid <> nid
), dots as (
  select qid, nid,
         cast(sum(cast(a*b as decimal(28,12))) as double) as d,
         cast(sum(cast(a*a as decimal(28,12))) as double) as na,
         cast(sum(cast(b*b as decimal(28,12))) as double) as nb
  from flat group by qid, nid
), scored as (
  select qid, nid, d / (sqrt(na) * sqrt(nb)) as cos from dots
), ranked as (
  select qid, nid, cos,
         cast(row_number() over (partition by qid order by cos desc, nid) as bigint) as rk
  from scored
)
select qid, nid, round(cos, 6) as cos, rk
from ranked where rk <= 5
order by qid, rk
"""


# ANN via random-hyperplane LSH.  The planes are md5-derived, so the
# whole pipeline — bucketing, candidate join, exact rescore — is
# replicated in the DuckDB oracle below: the correctness gate checks the
# ANN *result*, not just row counts.  Recall vs brute force is still
# asserted in tests/test_llmops.py.
def llm_lsh_ann(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return S.lsh_topk(emb, queries, k=5).orderBy("qid", "rk")


# shared oracle tail: exact decimal rescore + rank of a `cand(qid, nid)` CTE
_ANN_RESCORE_SQL = """
flat as (
  select cand.qid, cand.nid,
         cast(qe.embedding[u.i] as double) as a,
         cast(ne.embedding[u.i] as double) as b
  from cand
  join embeddings qe on qe.vec_id = cand.qid
  join embeddings ne on ne.vec_id = cand.nid,
  unnest(range(1, 65)) as u(i)
), dots as (
  select qid, nid,
         cast(sum(cast(a*b as decimal(28,12))) as double) as d,
         cast(sum(cast(a*a as decimal(28,12))) as double) as na,
         cast(sum(cast(b*b as decimal(28,12))) as double) as nb
  from flat group by qid, nid
), ranked as (
  select qid, nid, d / (sqrt(na) * sqrt(nb)) as cos,
         row_number() over (
           partition by qid
           order by d / (sqrt(na) * sqrt(nb)) desc, nid
         ) as rk
  from dots
)
select qid, nid, round(cos, 6) as cos, cast(rk as bigint) as rk
from ranked where rk <= 5
order by qid, rk
"""

# lsh_topk defaults: 4 tables x 4 planes -> plane ids 0..15, bucket =
# 4 sign bits; plane component = md5-derived int in [-1000, 1000]
# (same derivation as similarity._plane_component, seed 7)
LLM_LSH_ANN_SQL = f"""
with planes as (
  select p.p as p, i.i as i,
         cast(concat('0x', substr(md5(concat('7:p', p.p, ':', i.i)), 1, 15))
              as bigint) % 2001 - 1000 as c
  from range(0, 16) as p(p), range(0, 64) as i(i)
), dots_all as (
  select e.vec_id, pl.p,
         sum(cast(e.embedding[pl.i + 1] as double) * pl.c) as d
  from embeddings e, planes pl
  group by e.vec_id, pl.p
), buckets as (
  select vec_id, p // 4 as tbl,
         cast(sum(case when d > 0 then power(2, p % 4) else 0 end) as bigint) as bkt
  from dots_all group by vec_id, p // 4
), cand as (
  select distinct q.vec_id as qid, c.vec_id as nid
  from (select * from buckets where vec_id < 10) q
  join buckets c using (tbl, bkt)
  where q.vec_id <> c.vec_id
), {_ANN_RESCORE_SQL}
"""


def llm_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (the fifth dedup modality), found
    through the random-hyperplane LSH bucket prefilter — never an
    all-pairs cross join.

    Shape: bucket each vector into 16 hash tables of 2 hyperplanes
    (S._bucketed, one numpy matmul per Arrow batch) → self equi-join on
    (table, bucket) carrying only ids → distinct candidate pairs →
    re-attach vectors → double-math margin prefilter → decimal-exact
    rescore.  The equi-join on small integer keys scales linearly with
    docs-per-bucket; planes-per-table grows with log2(corpus/bucket) at
    production scale.

    Recall at this threshold (cos ≥ 0.35, θ ≤ 69.5°): a qualifying pair
    misses one 2-plane table with prob 1-(1-θ/π)² ≤ 0.623, so misses all
    16 tables with prob ≤ 0.623^16 ≈ 5.2e-4 — and exhaustive check vs the
    exact all-pairs result shows ZERO missed pairs on the sf0.001/0.01/
    0.1 fixtures, so the oracle below stays the plain exact form."""
    # project BEFORE the repartition so every downstream branch (the
    # bucketing UDF and both vector-reattach joins) shares ONE exchange
    # child — ReuseExchange collapses what used to be four scans + four
    # full exchanges into one scan + one exchange (guide §2/§5)
    emb = (load(spark, sf, "embeddings").where(F.col("vec_id") < 300)
           .select("vec_id", "embedding").repartition(16))
    bucketed = S._bucketed(
        emb, "vid", "vec", n_tables=16, n_planes=2, dim=64,
        id_col="vec_id", vec_col="embedding",
    )
    # drop the carried vector and re-shuffle the (vid, tbl, bkt) index on
    # the join key: both self-join sides now sit on byte-identical
    # exchange subtrees, so the Arrow bucketing stage executes ONCE and
    # the join reads the same shuffle twice (the dedup band-join pattern)
    bb = bucketed.select("vid", "tbl", "bkt").repartition("tbl", "bkt")
    a = bb.select(F.col("vid").alias("id_a"), "tbl", "bkt")
    b = bb.select(F.col("vid").alias("id_b"), "tbl", "bkt")
    cand = (
        a.join(b, ["tbl", "bkt"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    # two-stage: double-math prefilter with margin (codegen-cheap), then
    # decimal rescore of the few survivors for oracle-stable values —
    # double-vs-decimal drift is ~1e-12, far inside the 0.01 margin
    return (
        pairs.where(S.cosine_dbl_sql("va", "vb") >= 0.34)
        .withColumn("cos", S.cosine_sql("va", "vb"))
        .where(F.col("cos") >= 0.35)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
        .orderBy("id_a", "id_b")
    )


LLM_EMBEDDING_NEARDUP_SQL = """
with s as (
  select vec_id, embedding from embeddings where vec_id < 300
), flat as (
  select a.vec_id as id_a, b.vec_id as id_b,
         cast(a.embedding[u.i] as double) as x,
         cast(b.embedding[u.i] as double) as y
  from s a, s b, unnest(range(1, 65)) as u(i)
  where a.vec_id < b.vec_id
), d as (
  select id_a, id_b,
         cast(sum(cast(x*y as decimal(28,12))) as double) as d,
         cast(sum(cast(x*x as decimal(28,12))) as double) as na,
         cast(sum(cast(y*y as decimal(28,12))) as double) as nb
  from flat group by id_a, id_b
)
select id_a, id_b, round(d / (sqrt(na) * sqrt(nb)), 6) as cos
from d
where d / (sqrt(na) * sqrt(nb)) >= 0.35
order by id_a, id_b
"""


def llm_ivf_ann(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, k=5).orderBy("qid", "rk")


# ivf_topk defaults: centroids = first 16 vectors by id (deterministic),
# corpus assigned to nearest centroid by cosine, queries probe top-4
# cells, exact rescore inside — all replicated below
LLM_IVF_ANN_SQL = f"""
with cent as (
  select vec_id as cid, embedding from embeddings order by vec_id limit 16
), cflat as (
  select e.vec_id, c.cid,
         cast(e.embedding[u.i] as double) as a,
         cast(c.embedding[u.i] as double) as b
  from embeddings e, cent c, unnest(range(1, 65)) as u(i)
), csim as (
  select vec_id, cid,
         sum(a*b) / (sqrt(sum(a*a)) * sqrt(sum(b*b))) as s
  from cflat group by vec_id, cid
), assigned as (
  select vec_id as nid, cid as cell from (
    select vec_id, cid,
           row_number() over (partition by vec_id order by s desc, cid) as r
    from csim
  ) where r = 1
), probed as (
  select vec_id as qid, cid as cell from (
    select vec_id, cid,
           row_number() over (partition by vec_id order by s desc, cid) as r
    from csim where vec_id < 10
  ) where r <= 4
), cand as (
  select distinct p.qid, a.nid
  from probed p join assigned a using (cell)
  where p.qid <> a.nid
), {_ANN_RESCORE_SQL}
"""


# --------------------------------------------------------------------------
# TF-IDF top terms + BM25 relevance (operators/ranking.py)
def llm_tfidf_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """Per-doc top characteristic term (TF-IDF, ties by term asc) joined
    with the doc's BM25 score against a fixed query term set."""
    from ..operators import ranking as R

    docs = load(spark, sf, "documents")
    top = R.top_terms(docs, k=1).select(
        "doc_id",
        F.col("term").alias("top_term"),
        F.col("tfidf").alias("top_tfidf"),
    )
    scores = R.bm25(docs, ["hash", "value", "table"])
    return top.join(scores, "doc_id").orderBy("doc_id")


# k1=1.2, b=0.75: tf*(k1+1) -> tf*2.2; k1*(1-b+b*dl/avgdl) with the same
# association order as the Python-built column: 1.2*(0.25 + 0.75*dl/avgdl)
LLM_TFIDF_BM25_SQL = """
with toks as (
  select doc_id, unnest(string_split_regex(lower(text), '\\s+')) as term
  from documents
), tf0 as (
  select doc_id, term, cast(count(*) as bigint) as tf
  from toks where term <> '' group by doc_id, term
), nd as (
  select cast(count(distinct doc_id) as double) as n_docs from tf0
), dfreq as (
  select term, cast(count(*) as double) as df from tf0 group by term
), tfidf as (
  select doc_id, term, tf,
         round(tf * (ln((n_docs + 1) / (df + 1)) + 1), 6) as tfidf
  from tf0 join dfreq using (term) cross join nd
), dl as (
  select doc_id, cast(sum(tf) as double) as dl from tf0 group by doc_id
), st as (
  select cast(count(*) as double) as n_docs, avg(dl) as avgdl from dl
), contrib as (
  select doc_id,
         cast(ln(1 + (st.n_docs - df + 0.5) / (df + 0.5))
              * (tf * 2.2)
              / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
              as decimal(18,9)) as c
  from tf0 join dfreq using (term) join dl using (doc_id) cross join st
  where term in ('hash', 'value', 'table')
), bm as (
  select doc_id, round(cast(sum(c) as double), 6) as bm25
  from contrib group by doc_id
), top as (
  select doc_id, term, tfidf
  from tfidf
  qualify row_number() over (partition by doc_id
                             order by tfidf desc, term) = 1
)
select t.doc_id, t.term as top_term, t.tfidf as top_tfidf,
       coalesce(bm.bm25, 0.0) as bm25
from top t
left join bm using (doc_id)
order by t.doc_id
"""


# --------------------------------------------------------------------------
# Deterministic stratified corpus split (train/val/test by content hash)
def llm_corpus_split(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-based 80/10/10 split: bucket = md5('split:'||doc_id) % 100 —
    stable under corpus growth (a doc's split never changes when other
    docs are added/removed), the property shuffles/modulo-on-row-number
    splits lack.  Output is the stratification report per (lang, split)."""
    docs = load(spark, sf, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))), 1, 7),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_chars").cast("bigint").alias("chars_sum"))
        .orderBy("lang", "split")
    )


LLM_CORPUS_SPLIT_SQL = """
with assigned as (
  select lang, n_chars,
         cast(concat('0x', substr(md5(concat('split:',
              cast(doc_id as varchar))), 1, 7)) as bigint) % 100 as bucket
  from documents
)
select lang,
       case when bucket < 80 then 'train'
            when bucket < 90 then 'val'
            else 'test' end as split,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_chars) as bigint) as chars_sum
from assigned
group by lang, split
order by lang, split
"""


def llm_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash winnowing fingerprints per document (MOSS-style;
    operators/text.py winnow_fingerprints has the algorithm + scale
    notes). The oracle replicates the k-gram md5 hash and window-min
    selection arithmetically in SQL."""
    from ..operators.text import winnow_fingerprints

    docs = load(spark, sf, "documents").repartition(16, "doc_id")
    return winnow_fingerprints(docs).orderBy("doc_id")


LLM_WINNOWING_SQL = """
with t as (
  select doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 2048) as s
  from documents
), sized as (
  select doc_id, s, length(s) - 8 + 1 as m from t
  where length(s) - 8 + 1 >= 4
), pos as (
  select doc_id, s, m, unnest(generate_series(1, m)) as p from sized
), h as (
  select doc_id, m, p,
         cast(concat('0x', substr(md5(substr(s, p, 8)), 1, 15)) as bigint) as h
  from pos
), fps as (
  select doc_id, p, m,
         min(h) over (partition by doc_id order by p
                      rows between current row and 3 following) as fp
  from h
)
select doc_id,
       cast(count(distinct fp) as bigint) as n_fps,
       min(fp) as min_fp, max(fp) as max_fp
from fps where p <= m - 4 + 1
group by doc_id
order by doc_id
"""


def llm_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition quality filter (operators/text.py
    repetition_features): duplicate-word / top-word / duplicate-3-gram
    ratios + keep verdict per document."""
    from ..operators.text import repetition_features

    return repetition_features(load(spark, sf, "documents")).orderBy("doc_id")


LLM_REPETITION_SQL = """
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t from documents
), wc as (
  select doc_id, w, count(*) as c
  from (select doc_id, unnest(t) as w from toks) group by doc_id, w
), ws as (
  select doc_id, cast(sum(c) as bigint) as n_words,
         cast(count(*) as bigint) as n_distinct_words,
         cast(max(c) as bigint) as top_word_count
  from wc group by doc_id
), tc as (
  select doc_id, g, count(*) as c
  from (select doc_id,
               unnest(list_transform(range(0, greatest(len(t) - 2, 0)),
                      i -> concat_ws(' ', t[i+1], t[i+2], t[i+3]))) as g
        from toks where len(t) >= 3)
  group by doc_id, g
), ts as (
  select doc_id, cast(sum(c) as bigint) as n_kgrams,
         cast(count(*) as bigint) as n_distinct_kgrams
  from tc group by doc_id
)
select ws.doc_id, ws.n_words,
       round(1 - ws.n_distinct_words / ws.n_words, 6) as dup_word_ratio,
       round(ws.top_word_count / ws.n_words, 6) as top_word_frac,
       round(coalesce(1 - ts.n_distinct_kgrams / ts.n_kgrams, 0.0), 6)
         as dup_kgram_ratio,
       (round(1 - ws.n_distinct_words / ws.n_words, 6) <= 0.7 and
        round(ws.top_word_count / ws.n_words, 6) <= 0.2 and
        round(coalesce(1 - ts.n_distinct_kgrams / ts.n_kgrams, 0.0), 6) <= 0.5)
         as keep
from ws left join ts on ws.doc_id = ts.doc_id
order by ws.doc_id
"""


def llm_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over a deterministically PII-augmented text (the corpus
    fixture has no emails/phones/IPs, so both engines append
    doc_id-derived ones — the regex count+redact machinery is what's
    value-checked, down to md5 of the redacted text)."""
    from ..operators.text import pii_redact

    docs = load(spark, sf, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("-1234 from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return docs.select("doc_id", *pii_redact(synth)).orderBy("doc_id")


from ..operators.text import PII_EMAIL, PII_IPV4, PII_PHONE  # noqa: E402

LLM_PII_SQL = """
with synth as (
  select doc_id,
         concat(text, ' contact user', cast(doc_id as varchar),
                '@example.com or 555-',
                lpad(cast(doc_id % 10000 as varchar), 4, '0'),
                '-1234 from 10.0.', cast(doc_id % 256 as varchar), '.7') as s
  from documents
), red as (
  select doc_id, s,
         regexp_replace(regexp_replace(regexp_replace(s,
             '__EMAIL__', '<EMAIL>', 'g'),
             '__PHONE__', '<PHONE>', 'g'),
             '__IPV4__', '<IP>', 'g') as r
  from synth
)
select doc_id,
       cast(len(regexp_extract_all(s, '__EMAIL__')) as bigint) as n_emails,
       cast(len(regexp_extract_all(s, '__PHONE__')) as bigint) as n_phones,
       cast(len(regexp_extract_all(s, '__IPV4__')) as bigint) as n_ips,
       cast(length(r) as bigint) as redacted_len,
       md5(r) as redacted_fp
from red
order by doc_id
""".replace("__EMAIL__", PII_EMAIL).replace("__PHONE__", PII_PHONE).replace(
    "__IPV4__", PII_IPV4
)


def llm_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end training-data curation in ONE plan: language-ID gate
    (keep predicted English) → quality gate (composite score ≥ 0.5) →
    exact dedup (min-doc_id canonical survivor per fingerprint) →
    hash-stable 80/10/10 split → per-split doc/token report.  The stages
    are the individually-verified operators; this query value-checks
    their COMPOSITION against a single closed-form SQL oracle.

    Scale shape: everything up to the dedup is a pure column pipeline
    over ONE scan (no shuffle); the dedup is a row_number window over
    fp (one shuffle, no second scan or join — the regex-heavy analysis
    columns are computed exactly once per row); the split report is a
    3-group aggregate.  Nothing collects to the driver."""
    from pyspark.sql.window import Window

    docs = load(spark, sf, "documents")
    ana = T.with_text_analysis(docs, "text")
    kept = ana.where((F.col("lang_pred") == "en")
                     & (F.col("quality_score") >= 0.5))
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (kept.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))), 1, 7),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (F.when(bucket < 80, "train").when(bucket < 90, "val")
             .otherwise("test"))
    return (
        deduped.select(split.alias("split"), "n_tokens", "n_bpe_tokens")
        .groupBy("split")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("tokens_sum"),
             F.sum("n_bpe_tokens").cast("bigint").alias("bpe_tokens_sum"))
        .orderBy("split")
    )


def llm_incremental_curation(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental corpus maintenance: curate a base corpus, then fold
    in a NEW batch by deduplicating (a) within the batch and (b) against
    the base survivors' fingerprint ledger (anti-join on fp) — never
    re-processing the base documents.  Because base doc_ids precede the
    batch's, first-occurrence-wins dedup is preserved exactly, so the
    incremental result MUST equal a from-scratch batch curation — the
    oracle is the batch pipeline's closed-form SQL, which makes the
    maintenance identity itself the thing value-checked.

    Scale shape: the new batch is one column pipeline + one fp shuffle;
    the ledger anti-join shuffles on fp (the ledger is a table at corpus
    scale, not a broadcast); base results re-aggregate without a rescan
    in a real deployment (here both sides derive from the same fixture
    scan)."""
    from pyspark.sql.window import Window

    docs = load(spark, sf, "documents")
    mx = docs.agg(F.max("doc_id")).first()[0]  # plan-time scalar
    cut = int(mx * 3 // 5)

    def curate(df: DataFrame) -> DataFrame:
        ana = T.with_text_analysis(df, "text")
        kept = ana.where((F.col("lang_pred") == "en")
                         & (F.col("quality_score") >= 0.5))
        w = Window.partitionBy("fp").orderBy("doc_id")
        return (kept.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1).drop("__rn"))

    base = curate(docs.where(F.col("doc_id") <= cut))
    fresh = (curate(docs.where(F.col("doc_id") > cut))
             .join(base.select("fp"), "fp", "left_anti"))
    merged = base.unionByName(fresh)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))), 1, 7),
            16, 10,
        ).cast("bigint") % 100
    )
    split = (F.when(bucket < 80, "train").when(bucket < 90, "val")
             .otherwise("test"))
    return (
        merged.select(split.alias("split"), "n_tokens", "n_bpe_tokens")
        .groupBy("split")
        .agg(F.count("*").cast("bigint").alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("tokens_sum"),
             F.sum("n_bpe_tokens").cast("bigint").alias("bpe_tokens_sum"))
        .orderBy("split")
    )


LLM_CURATION_SQL = f"""
with base as (
  select *, cast(len(string_split_regex(lower(text), '\\s+')) as bigint) as n_tok
  from documents
), scored as (
  select doc_id, text, n_tok,
         n_tok as n_tokens,
         cast(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) as bigint) as n_bpe_tokens,
         greatest({_RAW_SCORE['en']}, {_RAW_SCORE['es']}, {_RAW_SCORE['fr']}, {_RAW_SCORE['de']}) as mscore,
         round(
           (case when n_tok between 10 and 100000 then 0.4 else 0.0 end)
           + (case when (length(text) - n_tok + 1) / n_tok between 2 and 12 then 0.3 else 0.0 end)
           + (case when len(regexp_extract_all(text, '[^\\w\\s]')) / length(text) < 0.2 then 0.1 else 0.0 end)
           + (case when len(regexp_extract_all(lower(text), '{_MARKER_PATTERNS["en"]}')) / n_tok > 0.05 then 0.2 else 0.0 end)
         , 6) as quality_score,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) as fp
  from base
), flt as (
  -- lang_pred = 'en' per the argmax tie-break order (fr, es, en, de)
  select doc_id, n_tokens, n_bpe_tokens, fp from scored
  where quality_score >= 0.5
    and not (mscore is null or mscore = 0)
    and {_RAW_SCORE['fr']} <> mscore
    and {_RAW_SCORE['es']} <> mscore
    and {_RAW_SCORE['en']} = mscore
), dedup as (
  select * from flt
  qualify row_number() over (partition by fp order by doc_id) = 1
), assigned as (
  select n_tokens, n_bpe_tokens,
         cast(concat('0x', substr(md5(concat('split:',
              cast(doc_id as varchar))), 1, 7)) as bigint) % 100 as bucket
  from dedup
)
select case when bucket < 80 then 'train'
            when bucket < 90 then 'val'
            else 'test' end as split,
       cast(count(*) as bigint) as n_docs,
       cast(sum(n_tokens) as bigint) as tokens_sum,
       cast(sum(n_bpe_tokens) as bigint) as bpe_tokens_sum
from assigned
group by 1
order by split
"""


# --------------------------------------------------------------------------
# Semantic clustering (k-means) + SemDeDup semantic dedup.
# Deterministic Lloyd's: first-K init, 2 unrolled iterations, decimal-exact
# assignment — the ENTIRE algorithm (both iterations, centroid means,
# empty-cluster carry-over) is replicated in the DuckDB oracle, so cluster
# assignments are value-checked, not just counted.
def llm_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import clustering as C

    emb = load(spark, sf, "embeddings")
    return C.kmeans(emb, k=8, n_iters=2).orderBy("vec_id")


# shared CTE block: 2 Lloyd's iterations over `embeddings`, ending in a1 =
# (vec_id, cid, dist).  Arithmetic mirrors clustering.py exactly: float32
# dims cast to double, per-dim squared differences rounded into
# decimal(28,12), exact sums cast back to double; means are
# exact-decimal-sum doubles divided by bigint counts; a cluster with no
# members keeps its previous centroid (coalesce against the c0 grid).
_KMEANS_CTES = """
with v as (
  select vec_id, embedding as ev from embeddings
), c0 as (
  select cast(row_number() over (order by vec_id) - 1 as integer) as cid,
         embedding as cv
  from (select * from embeddings order by vec_id limit 8)
), f0 as (
  select v.vec_id, c0.cid,
         cast(sum(cast((cast(v.ev[u.i] as double) - cast(c0.cv[u.i] as double))
                     * (cast(v.ev[u.i] as double) - cast(c0.cv[u.i] as double))
                       as decimal(28,12))) as double) as dist
  from v, c0, unnest(range(1, 65)) as u(i)
  group by v.vec_id, c0.cid
), a0 as (
  select vec_id, cid from (
    select vec_id, cid,
           row_number() over (partition by vec_id order by dist, cid) as rk
    from f0
  ) where rk = 1
), mean1 as (
  select a0.cid, u.i,
         cast(sum(cast(cast(v.ev[u.i] as double) as decimal(28,12))) as double)
           / count(*) as m
  from a0 join v using (vec_id), unnest(range(1, 65)) as u(i)
  group by a0.cid, u.i
), grid as (
  select c0.cid, u.i, cast(c0.cv[u.i] as double) as c0val
  from c0, unnest(range(1, 65)) as u(i)
), c1 as (
  select g.cid, g.i, coalesce(m.m, g.c0val) as cval
  from grid g left join mean1 m on m.cid = g.cid and m.i = g.i
), f1 as (
  select v.vec_id, c1.cid,
         cast(sum(cast((cast(v.ev[c1.i] as double) - c1.cval)
                     * (cast(v.ev[c1.i] as double) - c1.cval)
                       as decimal(28,12))) as double) as dist
  from v, c1
  group by v.vec_id, c1.cid
), a1 as (
  select vec_id, cid, dist from (
    select vec_id, cid, dist,
           row_number() over (partition by vec_id order by dist, cid) as rk
    from f1
  ) where rk = 1
)
"""

LLM_KMEANS_SQL = (
    _KMEANS_CTES
    + """
select vec_id, cast(cid as bigint) as cluster, round(dist, 6) as dist,
       cast(count(*) over (partition by cid) as bigint) as cluster_n
from a1
order by vec_id
"""
)


def llm_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import clustering as C

    emb = load(spark, sf, "embeddings")
    return C.semdedup(emb, k=8, n_iters=2, threshold=0.5).orderBy("vec_id")


LLM_SEMDEDUP_SQL = (
    _KMEANS_CTES
    + """
, pairs as (
  select x.vec_id as id_a, y.vec_id as id_b
  from a1 x join a1 y on x.cid = y.cid and x.vec_id < y.vec_id
), cosp as (
  select p.id_a, p.id_b,
         cast(sum(cast(cast(va.ev[u.i] as double) * cast(vb.ev[u.i] as double)
                       as decimal(28,12))) as double) as d,
         cast(sum(cast(cast(va.ev[u.i] as double) * cast(va.ev[u.i] as double)
                       as decimal(28,12))) as double) as na,
         cast(sum(cast(cast(vb.ev[u.i] as double) * cast(vb.ev[u.i] as double)
                       as decimal(28,12))) as double) as nb
  from pairs p
  join v va on va.vec_id = p.id_a
  join v vb on vb.vec_id = p.id_b, unnest(range(1, 65)) as u(i)
  group by p.id_a, p.id_b
), near as (
  select id_b as vec_id, min(id_a) as dup_of
  from cosp where d / (sqrt(na) * sqrt(nb)) > 0.5
  group by id_b
)
select a1.vec_id, cast(a1.cid as bigint) as cluster,
       near.dup_of is null as keep, near.dup_of
from a1 left join near on near.vec_id = a1.vec_id
order by a1.vec_id
"""
)


# --------------------------------------------------------------------------
# Vocabulary builder: corpus token frequencies (tokenizer-training prep).
# One explode + one groupBy (single shuffle on the token key); top-k via
# a rank over the global ordering — Spark's TakeOrderedAndProject keeps
# the driver set k-bounded at any corpus size.
def llm_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. ACL'16) over
    the documents corpus: one corpus pass builds the word-frequency
    table, then the merge loop runs on that vocabulary-sized frame.
    ITERATIVE (driver-paced argmax per merge) — outside the SQL-
    expressible fragment, so the driver records the rows-only check;
    exact parity with the sequential reference algorithm is pinned by
    `test_bpe_train_matches_reference_algorithm`."""
    from ..operators.text import bpe_train

    return bpe_train(load(spark, sf, "documents"),
                     n_merges=10).orderBy("rank")


def llm_vocab(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    ).where(F.col("token") != "")
    total = toks.groupBy("token").agg(F.count("*").alias("n_occurrences"))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        total.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= 50)
        .select(
            "rank",
            "token",
            F.col("n_occurrences").cast("bigint").alias("n_occurrences"),
        )
        .orderBy("rank")
    )


LLM_VOCAB_SQL = """
with toks as (
  select unnest(string_split_regex(lower(text), '\\s+')) as token
  from documents
), counts as (
  select token, cast(count(*) as bigint) as n_occurrences
  from toks where token <> ''
  group by token
)
select cast(row_number() over (order by n_occurrences desc, token) as bigint)
         as rank,
       token, n_occurrences
from counts
order by rank
limit 50
"""


def llm_data_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-data mixture: per-source up/down-sampling
    with hash-Bernoulli fractional copies (operators/mixing.py) — the
    data-mixing step of a pretraining pipeline, reproducible
    run-over-run and stable under corpus growth.  Output: per-source
    in/out counts + the realized copy total."""
    from ..operators.mixing import weighted_mixture

    docs = load(spark, sf, "documents")
    mixed = weighted_mixture(
        docs, "source", "doc_id",
        {"src0": 2.5, "src1": 0.5, "src2": 0.0}, default_weight=1.0)
    return (
        docs.groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_in"))
        .join(mixed.groupBy("source").agg(
            F.count("*").cast("bigint").alias("n_out"),
            F.sum(F.col("copy_idx") + 1).cast("bigint")
            .alias("copy_sum")), "source", "left")
        .select("source",
                "n_in",
                F.coalesce("n_out", F.lit(0)).cast("bigint").alias("n_out"),
                F.coalesce("copy_sum", F.lit(0)).cast("bigint")
                .alias("copy_sum"))
        .orderBy("source")
    )


LLM_DATA_MIXTURE_SQL = """
with w as (
  select source,
         case source when 'src0' then 2.5 when 'src1' then 0.5
                     when 'src2' then 0.0 else 1.0 end as wt,
         cast(concat('0x', substr(md5(concat('mix:',
              cast(doc_id as varchar))), 1, 7)) as bigint)
             / 268435456.0 as u
  from documents
), copies as (
  select source,
         cast(floor(wt) as bigint)
         + case when u < wt - floor(wt) then 1 else 0 end as n_copies
  from w
)
select source,
       cast(count(*) as bigint) as n_in,
       cast(sum(n_copies) as bigint) as n_out,
       cast(sum(n_copies * (n_copies + 1) / 2) as bigint) as copy_sum
from copies
group by source
order by source
"""


def llm_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic EXACT-k stratified sampling: per (lang, source)
    stratum keep exactly min(3, n) docs — the 3 smallest md5 ranks —
    via the two-phase prefilter-then-rank plan in operators/mixing.py
    (survivor volume scales with strata*k, never corpus size; coverage
    is verified, so the result is exact, not exact-in-expectation).
    Output: per-stratum kept count, max rank, and the sampled doc-id
    checksum — all arithmetically replicated in the DuckDB oracle, so
    the SELECTION ITSELF is value-checked."""
    from ..operators.mixing import stratified_sample

    docs = load(spark, sf, "documents")
    samp = stratified_sample(docs, ["lang", "source"], "doc_id", k=3)
    return (samp.groupBy("lang", "source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"),
                 F.max("sample_rank").cast("bigint").alias("max_rank"),
                 F.sum("doc_id").cast("bigint").alias("id_sum"))
            .orderBy("lang", "source"))


LLM_STRATIFIED_SAMPLE_SQL = """
with ranked as (
  select lang, source, doc_id,
         row_number() over (
           partition by lang, source
           order by md5('strat:' || lang || chr(31) || source || ':'
                        || cast(doc_id as varchar))
         ) as rnk
  from documents
)
select lang, source,
       cast(count(*) as bigint) as n_kept,
       cast(max(rnk) as bigint) as max_rank,
       cast(sum(doc_id) as bigint) as id_sum
from ranked
where rnk <= 3
group by lang, source
order by lang, source
"""


def llm_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based domain rebalancing (sample stratum i with
    probability proportional to n_i^T — the standard multilingual
    rebalancing policy; T=0.5 here): per-language weights derive from
    one count pass, copies emit row-locally via the md5-Bernoulli
    scheme, corpus total preserved in expectation.  Output: per-lang
    in/out counts + the applied weight — the whole closed form
    (pow/round/md5 threshold) replicated in the DuckDB oracle, so the
    REALIZED resampling is value-checked."""
    from ..operators.mixing import temperature_mixture

    docs = load(spark, sf, "documents")
    mixed = temperature_mixture(docs, "lang", "doc_id", temperature=0.5)
    return (
        docs.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_in"))
        .join(mixed.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_out"),
            F.max("mix_weight").alias("wt")), "lang", "left")
        .select("lang", "n_in",
                F.coalesce("n_out", F.lit(0)).cast("bigint").alias("n_out"),
                F.coalesce("wt", F.lit(0.0)).cast("double").alias("wt"))
        .orderBy("lang"))


LLM_TEMPERATURE_MIXTURE_SQL = """
with c as (
  select lang, count(*) as n from documents group by lang
), t as (
  select sum(n) as big_n, sum(pow(n, 0.5)) as z from c
), w as (
  select lang, n,
         round(pow(n, 0.5) / z * big_n / n, 6) as wt
  from c cross join t
), d as (
  select doc_id, d0.lang, w.wt,
         cast(concat('0x', substr(md5(concat('temp:',
              cast(doc_id as varchar))), 1, 7)) as bigint)
             / 268435456.0 as u
  from documents d0 join w on d0.lang = w.lang
)
select lang,
       cast(count(*) as bigint) as n_in,
       cast(sum(cast(floor(wt) as bigint)
                + case when u < round(wt - floor(wt), 6)
                       then 1 else 0 end) as bigint) as n_out,
       cast(max(wt) as double) as wt
from d
group by lang
order by lang
"""


def llm_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard pretraining
    layout): documents ordered by doc_id form one token stream cut
    every 512 tokens.  The distributed two-phase prefix sum
    (operators/mixing.py pack_sequences) computes each doc's global
    offset without a single-task window.  Output: per-chunk doc count
    and straddle count — value-checked against the oracle's global
    cumulative sum."""
    from ..operators.mixing import pack_sequences
    from ..operators.text import token_count

    docs = load(spark, sf, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tok"))
    packed = pack_sequences(docs, "n_tok", "doc_id", context_len=512,
                            num_partitions=8)
    return (
        packed.groupBy("start_chunk").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("end_chunk") > F.col("start_chunk"))
                  .cast("int")).cast("bigint").alias("n_straddling"),
            F.min("offset_in_chunk").cast("bigint").alias("first_offset"))
        .orderBy("start_chunk")
        .withColumnRenamed("start_chunk", "chunk")
    )


LLM_SEQUENCE_PACKING_SQL = """
with toks as (
  select doc_id,
         cast(len(string_split_regex(lower(text), '\\s+')) as bigint)
             as n_tok
  from documents
), pos as (
  select doc_id, n_tok,
         coalesce(sum(n_tok) over (order by doc_id
             rows between unbounded preceding and 1 preceding), 0)
             as cum_before
  from toks
)
select cast(floor(cum_before / 512) as bigint) as chunk,
       cast(count(*) as bigint) as n_docs,
       cast(sum(case when floor((cum_before + n_tok - 1) / 512)
                     > floor(cum_before / 512) then 1 else 0 end)
            as bigint) as n_straddling,
       cast(min(cum_before % 512) as bigint) as first_offset
from pos
group by 1
order by 1
"""




def llm_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus boilerplate detection: 3-gram shingles whose doc
    frequency exceeds the threshold are boilerplate; per-doc ratio.
    One inverted-index groupBy + join back — no all-pairs."""
    return (T.boilerplate_stats(load(spark, sf, "documents"),
                                df_threshold=25)
            .orderBy("doc_id"))


LLM_BOILERPLATE_SQL = """
with toks as (
  select doc_id, string_split_regex(lower(text), '\\s+') as t from documents
), sh as (
  select doc_id,
         unnest(list_distinct(list_transform(range(0, greatest(len(t)-2, 0)),
                i -> concat_ws(' ', t[i+1], t[i+2], t[i+3])))) as shingle
  from toks
  where len(t) >= 3
), freq as (
  select shingle, count(*) as doc_freq from sh group by shingle
), boiler as (
  select shingle from freq where doc_freq > 25
)
select s.doc_id,
       count(*) as n_shingles,
       count(b.shingle) as n_boiler,
       round(count(b.shingle) / count(*), 6) as boilerplate_ratio
from sh s left join boiler b on s.shingle = b.shingle
group by s.doc_id
order by s.doc_id
"""


def llm_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (operators/mixing.py
    chunk_documents) — the RAG / long-context prep step: each document
    becomes sliding windows of 32 whitespace tokens advancing by 24,
    the last window being the first to reach the end.  Per-chunk text
    is value-checked via md5 against the oracle's list-slice
    arithmetic.  Plan: entirely row-local JVM expressions (split /
    explode / slice) — zero shuffles."""
    from ..operators.mixing import chunk_documents

    docs = load(spark, sf, "documents").select("doc_id", "text")
    return (chunk_documents(docs, chunk_tokens=32, stride=24)
            .select("doc_id",
                    F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
                    "n_doc_tokens", "chunk_tokens",
                    F.md5("chunk_text").alias("chunk_md5"))
            .orderBy("doc_id", "chunk_idx"))


LLM_CHUNKING_SQL = """
with toks as (
  select doc_id, string_split(text, ' ') as t from documents
), n as (
  select doc_id, t, cast(len(t) as bigint) as n_tok from toks
), c as (
  select doc_id, t, n_tok,
         unnest(generate_series(0,
             cast(ceil(greatest(n_tok - 32, 0) / 24.0) as bigint)))
             as chunk_idx
  from n
)
select doc_id,
       cast(chunk_idx as bigint) as chunk_idx,
       n_tok as n_doc_tokens,
       cast(len(t[chunk_idx*24+1 : chunk_idx*24+32]) as bigint)
           as chunk_tokens,
       md5(array_to_string(t[chunk_idx*24+1 : chunk_idx*24+32], ' '))
           as chunk_md5
from c
order by doc_id, chunk_idx
"""


def llm_global_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global shuffle + shard assignment
    (operators/mixing.py global_shuffle) — the dataloader handoff:
    reproducible pseudo-random document order (md5 of seed+id), cut
    into fixed-size shards.  The global rank is a distributed two-phase
    prefix count (range partition -> local row_number -> broadcast
    offsets), no single-task window; the oracle is a plain global
    row_number over the same md5 order, so every rank and shard is
    value-checked."""
    from ..operators.mixing import global_shuffle

    docs = load(spark, sf, "documents").select("doc_id", "lang")
    return (global_shuffle(docs, "doc_id", seed="42", shard_size=64,
                           num_partitions=8)
            .select("doc_id", "lang", "shuffle_rank", "shard")
            .orderBy("doc_id"))


LLM_GLOBAL_SHUFFLE_SQL = """
select doc_id, lang,
       cast(row_number() over (
            order by md5('shuf42:' || cast(doc_id as varchar))) - 1
            as bigint) as shuffle_rank,
       cast(floor((row_number() over (
            order by md5('shuf42:' || cast(doc_id as varchar))) - 1)
            / 64) as bigint) as shard
from documents
order by doc_id
"""


def llm_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-unigram linear quality classifier (operators/text.py
    quality_classifier) — the learned-filter stage after heuristic
    gates: integer weight per hashed token, exact integer doc score,
    keep verdict at mean >= 0.  Entirely row-local JVM (F.aggregate
    over the token array; zero shuffles, zero Python); the oracle
    replays the identical md5-weight arithmetic per token."""
    from ..operators.text import quality_classifier

    docs = load(spark, sf, "documents")
    return (docs.select("doc_id", "lang",
                        *quality_classifier(F.col("text")))
            .orderBy("doc_id"))


LLM_QUALITY_CLASSIFIER_SQL = """
with toks as (
  select doc_id, lang,
         string_split_regex(trim(lower(text)), '\\s+') as t
  from documents
), scored as (
  select doc_id, lang,
         cast(list_sum(list_transform(t, x ->
              cast(concat('0x', substr(md5(concat('qw:', x)), 1, 7))
                   as bigint) % 2001 - 1000)) as bigint) as clf_sum,
         len(t) as n
  from toks
)
select doc_id, lang, clf_sum,
       round(cast(clf_sum as double) / (1000.0 * n), 6) as clf_mean,
       (round(cast(clf_sum as double) / (1000.0 * n), 6) >= 0)
           as clf_keep
from scored
order by doc_id
"""


def llm_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Count-based bigram LM scoring (operators/text.py
    bigram_lm_scores) — the deterministic core of perplexity filtering:
    add-one-smoothed ln p(w_i | w_{i-1}) from corpus counts, mean per
    doc.  Logs quantize to decimal(18,9) before the order-independent
    exact sum (the tfidf/bm25 discipline), so the oracle replays the
    identical arithmetic."""
    from ..operators.text import bigram_lm_scores

    return (bigram_lm_scores(load(spark, sf, "documents"))
            .orderBy("doc_id"))


LLM_BIGRAM_LM_SQL = """
with toks as (
  select doc_id, string_split_regex(trim(lower(text)), '\\s+') as t
  from documents
), uni as (
  select unnest(t) as w from toks
), ucnt as (
  select w, count(*) as cu from uni group by w
), voc as (
  select cast(count(*) as double) as v from ucnt
), bi as (
  select doc_id, t[i] as w1, t[i + 1] as w2
  from toks, unnest(generate_series(1, len(t) - 1)) as g(i)
  where len(t) >= 2
), bcnt as (
  select w1, w2, count(*) as cb from bi group by w1, w2
), scored as (
  select bi.doc_id,
         cast(ln((cb + 1.0) / (cu + 1.0 * v)) as decimal(18,9)) as lp
  from bi
  join bcnt using (w1, w2)
  join ucnt on bi.w1 = ucnt.w
  cross join voc
)
select doc_id,
       cast(count(*) as bigint) as n_bigrams,
       round(cast(sum(lp) / count(*) as double), 6) as mean_logp
from scored
group by doc_id
order by doc_id
"""


LLMOPS_QUERIES = {
    "llm_bigram_lm": llm_bigram_lm,
    "llm_quality_classifier": llm_quality_classifier,
    "llm_chunking": llm_chunking,
    "llm_global_shuffle": llm_global_shuffle,
    "llm_boilerplate": llm_boilerplate,
    "llm_text_analysis": llm_text_analysis,
    "llm_vocab": llm_vocab,
    "llm_kmeans": llm_kmeans,
    "llm_semdedup": llm_semdedup,
    "llm_exact_dedup": llm_exact_dedup,
    "llm_span_dedup": llm_span_dedup,
    "llm_bpe_train": llm_bpe_train,
    "llm_minhash_lsh": llm_minhash_lsh,
    "llm_dedup_clusters": llm_dedup_clusters,
    "llm_simhash": llm_simhash,
    "llm_simhash_pairs": llm_simhash_pairs,
    "llm_ngram_jaccard": llm_ngram_jaccard,
    "llm_decontamination": llm_decontamination,
    "llm_cosine_topk": llm_cosine_topk,
    "llm_lsh_ann": llm_lsh_ann,
    "llm_ivf_ann": llm_ivf_ann,
    "llm_embedding_neardup": llm_embedding_neardup,
    "llm_tfidf_bm25": llm_tfidf_bm25,
    "llm_corpus_split": llm_corpus_split,
    "llm_winnowing": llm_winnowing,
    "llm_repetition_filter": llm_repetition_filter,
    "llm_pii_redaction": llm_pii_redaction,
    "llm_curation_pipeline": llm_curation_pipeline,
    "llm_incremental_curation": llm_incremental_curation,
    "llm_data_mixture": llm_data_mixture,
    "llm_stratified_sample": llm_stratified_sample,
    "llm_temperature_mixture": llm_temperature_mixture,
    "llm_sequence_packing": llm_sequence_packing,
}

LLMOPS_ORACLE = {
    "llm_bigram_lm": LLM_BIGRAM_LM_SQL,
    "llm_quality_classifier": LLM_QUALITY_CLASSIFIER_SQL,
    "llm_chunking": LLM_CHUNKING_SQL,
    "llm_global_shuffle": LLM_GLOBAL_SHUFFLE_SQL,
    "llm_boilerplate": LLM_BOILERPLATE_SQL,
    "llm_text_analysis": LLM_TEXT_ANALYSIS_SQL,
    "llm_vocab": LLM_VOCAB_SQL,
    "llm_kmeans": LLM_KMEANS_SQL,
    "llm_semdedup": LLM_SEMDEDUP_SQL,
    "llm_exact_dedup": LLM_EXACT_DEDUP_SQL,
    "llm_span_dedup": LLM_SPAN_DEDUP_SQL,
    "llm_minhash_lsh": LLM_MINHASH_LSH_SQL,
    "llm_dedup_clusters": LLM_DEDUP_CLUSTERS_SQL,
    "llm_simhash": LLM_SIMHASH_SQL,
    "llm_simhash_pairs": LLM_SIMHASH_PAIRS_SQL,
    "llm_ngram_jaccard": LLM_NGRAM_JACCARD_SQL,
    "llm_decontamination": LLM_DECONTAMINATION_SQL,
    "llm_cosine_topk": LLM_COSINE_TOPK_SQL,
    "llm_embedding_neardup": LLM_EMBEDDING_NEARDUP_SQL,
    "llm_lsh_ann": LLM_LSH_ANN_SQL,
    "llm_ivf_ann": LLM_IVF_ANN_SQL,
    "llm_tfidf_bm25": LLM_TFIDF_BM25_SQL,
    "llm_corpus_split": LLM_CORPUS_SPLIT_SQL,
    "llm_winnowing": LLM_WINNOWING_SQL,
    "llm_repetition_filter": LLM_REPETITION_SQL,
    "llm_pii_redaction": LLM_PII_SQL,
    "llm_curation_pipeline": LLM_CURATION_SQL,
    "llm_incremental_curation": LLM_CURATION_SQL,  # identity: incremental == batch
    "llm_data_mixture": LLM_DATA_MIXTURE_SQL,
    "llm_stratified_sample": LLM_STRATIFIED_SAMPLE_SQL,
    "llm_temperature_mixture": LLM_TEMPERATURE_MIXTURE_SQL,
    "llm_sequence_packing": LLM_SEQUENCE_PACKING_SQL,
}
