"""Ranked retrieval over a document corpus: BM25 scoring.

No reference counterpart (the gem stops at record extraction). BM25 is
the classic lexical retrieval score a data pipeline uses for targeted
corpus search (find documents about X) and for quality-weighted
per-source selection; it extends the repo's TF-IDF top-terms operator
(`corpus.tfidf_top_terms`) with length-normalised term-frequency
saturation.

score(d, q) = sum over query terms t of
    idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  [Robertson-Sparck Jones].

Scale design: the query-term list is tiny and broadcast as literals via
`isin` — the corpus-side explode is filtered to query terms BEFORE the
(doc, term) aggregation, so the shuffle carries only matching tokens,
not the corpus vocabulary. Corpus-level scalars (N, avgdl) come from one
map-side-combinable aggregate cross-joined as a 1-row broadcast. Top-k
uses the same bounded two-phase rank as `corpus.per_source_cap` — no
global single-reducer sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ndr_import_spark.operators.textstats import token_count, tokens


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    salt_buckets: int = 16,
) -> DataFrame:
    """Top-k documents by BM25 score for the query `terms`.

    Returns (id, n_terms_hit, score) with score rounded to 6dp; ranking
    is (rounded score DESC, id ASC) so the cut is deterministic across
    engines and partitionings.
    """
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    lengths = docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("_dl")
    )
    # 1-row corpus stats, broadcast into every row
    stats = lengths.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
        .filter(F.col("_t").isin([t.lower() for t in terms]))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # document frequency per term: (id, term) pairs are distinct already
    df_t = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    scored = (
        tf.join(F.broadcast(df_t), "_t")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * F.col("_tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms_hit"),
            F.round(F.sum("_s"), 6).alias("score"),
        )
    )
    # bounded two-phase top-k: per-salt partial rank, then rank the
    # <= salt_buckets * k survivors (same shape as corpus.per_source_cap)
    salted = scored.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy("_salt").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy().orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
