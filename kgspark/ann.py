"""Approximate-nearest-neighbor search over an embedding column
(task brief §similarity search).

* ``ann_topk`` — brute-force cosine top-k: broadcast the (small) query
  set against the full embedding table; double-precision cosine via the
  Arrow-batched numpy kernel; top-k by ``row_number`` with
  deterministic (cosine desc, neighbor asc) tie-break.  The exact
  baseline every ANN variant is measured against.
* ``ann_ivf`` — IVF-style cell-restricted search: the ``label`` column
  plays the role of the coarse-quantizer cell assignment (a real
  deployment k-means-trains cells and probes nprobe > 1); searching
  only the query's own cell is the classic recall/throughput trade.

Scale shape: queries broadcast (they are the small side); the corpus
scan is embarrassingly parallel; top-k per query is a partial
aggregation (TakeOrdered) — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .link import _cosine_batch


def _scored(queries: DataFrame, corpus: DataFrame, same_label_only: bool) -> DataFrame:
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
    )
    cond = F.col("query_id") != F.col("neighbor_id")
    if same_label_only:
        cond = cond & (F.col("q_label") == F.col("n_label"))
    return (
        c.join(F.broadcast(q), cond)
        .withColumn("cosine", _cosine_batch(F.col("q_emb"), F.col("n_emb")))
    )


def ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Brute-force exact top-k: queries = vec_id < n_queries."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    scored = _scored(queries, embeddings, same_label_only=False)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_ivf(embeddings: DataFrame, n_queries: int = 20, k: int = 3) -> DataFrame:
    """IVF-cell-restricted top-k (cell = label column)."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    scored = _scored(queries, embeddings, same_label_only=True)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
