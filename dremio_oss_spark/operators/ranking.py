"""Corpus-level term ranking: TF-IDF and BM25.

A training-data pipeline scores documents against queries (relevance
filtering, topical sampling) and surfaces characteristic terms
(near-dup triage, topic drift).  Both are corpus-level aggregations —
document frequencies and length norms are global statistics — expressed
as explode → groupBy → broadcast-join plans:

- tokenize/explode is the same one-shuffle pass the dedup shingler uses;
- per-term document frequency is a groupBy on term (N_terms rows — tiny
  vs the corpus — so the stats join back to term rows is broadcast-able);
- scalar corpus stats (N, avgdl) ride along as a 1-row cross join, never
  a driver collect.

Determinism across engines: every logarithm is computed once per term
row from integer-valued inputs, per-term BM25 contributions accumulate
in decimal(18,9) (order-independent) and only the final score rounds to
6 places — the same discipline as the TPC-H `dsum` pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def term_freqs(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc, term, tf): lowercase whitespace tokens, exploded + counted."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def tfidf(docs: DataFrame, text_col: str = "text",
          id_col: str = "doc_id") -> DataFrame:
    """Smoothed TF-IDF per (doc, term): tf * (ln((N+1)/(df+1)) + 1),
    rounded to 6 places (cross-engine float discipline)."""
    tf = term_freqs(docs, text_col, id_col)
    n = tf.select("doc_id").distinct().groupBy().agg(
        F.count("*").cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
                6,
            ).alias("tfidf"),
        )
    )


def top_terms(docs: DataFrame, k: int = 1, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per doc by TF-IDF (ties: term asc)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (
        tfidf(docs, text_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25(docs: DataFrame, query_terms: list[str], k1: float = 1.2,
         b: float = 0.75, text_col: str = "text",
         id_col: str = "doc_id") -> DataFrame:
    """BM25 score of every document against a fixed term set.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contributions
    accumulate in decimal so the sum is order-independent.  The query
    term set is a literal array (broadcast by construction).
    """
    tf = term_freqs(docs, text_col, id_col)
    dl = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("double").alias("dl"))
    stats = dl.groupBy().agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df"))
    qt = [t.lower() for t in query_terms]
    contrib = (
        tf.where(F.col("term").isin(qt))
        .join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(18,9)").alias("c"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            contrib.groupBy("doc_id").agg(
                F.round(F.sum("c").cast("double"), 6).alias("bm25")),
            "doc_id", "left",
        )
        .select("doc_id", F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )
