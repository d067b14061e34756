"""Approximate-nearest-neighbor search over an embedding column
(task brief §similarity search).

* ``ann_topk`` — brute-force cosine top-k: broadcast the (small) query
  set against the full embedding table; double-precision cosine via the
  Arrow-batched numpy kernel; top-k by ``row_number`` with
  deterministic (cosine desc, neighbor asc) tie-break.  The exact
  baseline every ANN variant is measured against.
* ``ann_ivf`` — IVF-style cell-restricted search: the ``label`` column
  plays the role of the coarse-quantizer cell assignment; searching
  only the query's own cell is the classic recall/throughput trade.
* ``ann_ivf_probe`` — the trained form: integer-exact per-cell
  centroids, cells ranked per query by centroid cosine, top-nprobe
  cells searched (oracle-checkable because the quantizer math is pure
  int64).

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


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k WITHOUT funneling every candidate of a
    query onto one reducer: phase 1 takes the top-k within each input
    partition (window over (query_id, partition_id) — local, no global
    shuffle of the full candidate set), phase 2 ranks the ≤ k·P
    survivors per query.  Identical output to a single global window
    (the global top-k is contained in the union of per-partition
    top-ks); matters when the query set is large — the global-window
    plan shuffles |corpus|×|queries| rows to |queries| reducers."""
    local_w = Window.partitionBy("query_id", "_pid").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Brute-force exact top-k: queries = vec_id < n_queries."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    return _topk(_scored(queries, embeddings, same_label_only=False), k)


def ann_ivf(embeddings: DataFrame, n_queries: int = 20, k: int = 3) -> DataFrame:
    """IVF-cell-restricted top-k (cell = label column, nprobe = 1 —
    the query's own cell; see ann_ivf_probe for trained-centroid
    multi-cell probing)."""
    queries = embeddings.filter(F.col("vec_id") < n_queries)
    return _topk(_scored(queries, embeddings, same_label_only=True), k)


def cell_centroids_int(embeddings: DataFrame, scale: int = 1000) -> DataFrame:
    """Coarse-quantizer centroids as INTEGER vectors: per (label, dim),
    sum of round(scale · component) — order-insensitive int64 sums, so
    the centroid (and every cosine derived from it) is bit-identical at
    any parallelism level AND across engines (float summation order is
    not; the DuckDB oracle restates this arithmetic exactly).
    Returns (label, dim, v)."""
    return (
        embeddings.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * scale).cast("bigint")
            ).alias("v")
        )
    )


def assign_cells(embeddings: DataFrame, scale: int = 1000) -> DataFrame:
    """Quantizer ASSIGNMENT step: every vector re-assigned to its
    nearest trained centroid (max integer-exact centroid cosine,
    ties → min label) — one k-means-style Lloyd assignment over the
    integer centroids of ``cell_centroids_int``.  Returns
    (vec_id, cell).  Deterministic on every engine because the whole
    scoring chain is int64."""
    # the centroid table feeds TWO consumers (the per-vector score join
    # and the norm aggregate) — share one materialization (r7)
    cent = cell_centroids_int(embeddings, scale).localCheckpoint(eager=False)
    vdims = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("x").cast("double") * scale).cast("bigint").alias("q"),
    )
    scores = (
        vdims.join(cent, "dim")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q") * F.col("v")).alias("dot"),
            F.sum(F.col("q") * F.col("q")).alias("qq"),
        )
    )
    cnorm = cent.groupBy("label").agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    cell_cos = scores.join(cnorm, "label").select(
        "vec_id",
        "label",
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("qq").cast("double") * F.col("vv").cast("double"))
        ).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("label"))
    return (
        cell_cos.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", F.col("label").alias("cell"))
    )


def ann_ivf_probe(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 3,
    nprobe: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """IVF with a TRAINED coarse quantizer and nprobe > 1: rank cells
    per query by exact integer-arithmetic centroid cosine, search the
    top ``nprobe`` cells, return the per-query top-k.

    The centroid ranking is a broadcast join of the (queries × cells)
    score table — both tiny; only the candidate scan over the probed
    cells touches the corpus.  All quantizer math is int64 (exact,
    order-insensitive), making the cell choice deterministic and
    oracle-checkable; the within-cell scorer is the same Arrow cosine
    kernel as every other ANN path."""
    # shared by the query-score join and the norm aggregate (r7)
    cent = cell_centroids_int(embeddings, scale).localCheckpoint(eager=False)
    qdims = (
        embeddings.filter(F.col("vec_id") < n_queries)
        .select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .select(
            F.col("vec_id").alias("query_id"),
            "dim",
            F.round(F.col("x").cast("double") * scale).cast("bigint").alias("q"),
        )
    )
    # exact int dot/norms per (query, cell); cosine in double from
    # exact integers — identical on every engine
    scores = (
        qdims.join(cent, "dim")
        .groupBy("query_id", "label")
        .agg(
            F.sum(F.col("q") * F.col("v")).alias("dot"),
            F.sum(F.col("q") * F.col("q")).alias("qq"),
        )
    )
    cnorm = cent.groupBy("label").agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    cell_cos = scores.join(cnorm, "label").select(
        "query_id",
        "label",
        (
            F.col("dot").cast("double")
            / F.sqrt(F.col("qq").cast("double") * F.col("vv").cast("double"))
        ).alias("ccos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("label"))
    probed = (
        cell_cos.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", F.col("label").alias("n_label"))
    )
    # Restrict BEFORE scoring: hash-join the corpus to the (tiny) probed
    # cell set first, so the Arrow cosine kernel only ever sees candidate
    # rows from the nprobe cells of each query — the plan is
    # scan → BroadcastHashJoin(probed) → BroadcastHashJoin(queries) →
    # ArrowEvalPython, with NO nested-loop join over the full corpus.
    # (Round-2 verdict: scoring first made the probe save zero compute.)
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
    )
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    candidates = (
        c.join(F.broadcast(probed), "n_label")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = candidates.withColumn(
        "cosine", _cosine_batch(F.col("q_emb"), F.col("n_emb"))
    )
    return _topk(scored, k)


def ann_mips(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Maximum-inner-product top-k (round 6c) — the retrieval scoring
    mode for unnormalized embeddings (cosine ranks direction only; MIPS
    rewards magnitude, the usual two-tower/recommender objective).
    INTEGER-exact: components quantize to the e3 grid and the score is
    Σ q_i·n_i in int64 (scale e6) via native zip_with/aggregate —
    fully JVM-side whole-stage codegen, no Python evaluation at all
    (the cosine path needs a Pandas UDF for its sqrt; the dot product
    does not).  Same broadcast-queries + two-phase top-k shape as
    ann_topk."""
    e3 = "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
    v = embeddings.select("vec_id", F.expr(e3).alias("e3"))
    q = v.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e3").alias("q_e3")
    )
    scored = (
        v.select(F.col("vec_id").alias("neighbor_id"), F.col("e3").alias("n_e3"))
        .join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "dot_e6",
            F.expr(
                "aggregate(zip_with(q_e3, n_e3, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ),
        )
    )
    local_w = Window.partitionBy("query_id", "_pid").orderBy(
        F.desc("dot_e6"), F.asc("neighbor_id")
    )
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= k)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_e6"), F.asc("neighbor_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dot_e6")
    )


def knn_graph(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """k-NN GRAPH BUILD — every vector's top-k same-cell neighbors
    (cell = the label coarse assignment, as in ``ann_ivf``): the input
    structure HNSW/NSW index builds and GraphSAGE samplers consume.

    Scale shape: at graph-build time the "query set" IS the corpus, so
    the broadcast-queries pattern of the search paths is wrong — this
    is a CELL-KEYED SELF-JOIN (both sides shuffle on the cell key;
    block size = cell population, bounded by the quantizer, never
    corpus-global) followed by the two-phase partial top-k.  One Arrow
    cosine kernel evaluation per candidate pair, no vector arrays
    beyond the cell-local join."""
    a = embeddings.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("q_emb"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("cell"),
        F.col("embedding").alias("n_emb"),
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _cosine_batch(F.col("q_emb"), F.col("n_emb")))
    )
    return _topk(scored, k)
