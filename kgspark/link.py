"""Entity-linking stage (SURVEY.md §3.2, operators O16, O21, O22, O33).

Replaces Twine spindle-correlate's per-message SPARQL lookups
(``spindle/correlate/`` `[U~]`) with whole-batch set-oriented linking:

1. **dedup before pairwise** — linking runs over DISTINCT normalized
   mention texts, not mention occurrences.  At 10^12 docs the distinct
   mention-text table is orders of magnitude smaller than the mention
   table; every downstream pairwise cost is paid once per distinct
   text.  Membership is joined back afterwards.
2. **blocking** — inverted-index candidate join on shared tokens
   (equivalent to 1-token LSH bands and *exact*: any pair with
   Jaccard ≥ τ shares ≥ 1 token, so recall vs the all-pairs oracle is
   1.0 by construction).  A true MinHash-LSH banding implementation
   lives in dedup.py (O21) for the near-dup operators where shingle
   sets are large.
3. **scoring** — batched Jaccard (native array exprs, JVM) + batched
   cosine over pseudo-embeddings (Arrow ``pandas_udf``, numpy float64).
   Acceptance: J ≥ JACCARD_TAU OR (J ≥ COSINE_JACCARD_MIN AND
   cos ≥ COSINE_TAU)  — grammar.py is the spec.

Scale notes: the candidate self-join shuffles on ``tok``; hot tokens
are the skew risk → AQE skew-join is on (session.py) and the block for
a token of frequency f yields f(f-1)/2 pairs — the inverted index is
capped per token (``block_cap``) with a logged drop count, the standard
large-scale blocking guard (cap >> any fixture block size, so exact on
fixtures; at 10^12 docs you cap + fall back to MinHash bands for the
monster blocks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exprs as X
from . import grammar as G

# Default per-token block cap — exact on all fixture scales; see module
# docstring for the 10^12-scale rationale.
BLOCK_CAP = 1_000_000


def distinct_norms(mentions: DataFrame, n_embeddings: int) -> DataFrame:
    """Distinct normalized mention texts + their token set + vec id."""
    return (
        mentions.select("norm_text")
        .distinct()
        .select(
            "norm_text",
            F.array_distinct(F.split(F.col("norm_text"), " ")).alias("tokset"),
            X.vec_id_for_norm(F.col("norm_text"), n_embeddings).alias("vec_id"),
        )
    )


def candidate_pairs(norms: DataFrame, block_cap: int = BLOCK_CAP) -> DataFrame:
    """O21 blocking: inverted index on tokens → self equi-join on tok,
    ``a < b`` dedup predicate, DISTINCT pair set."""
    inv = norms.select(
        F.col("norm_text").alias("norm"),
        F.explode("tokset").alias("tok"),
    )
    if block_cap is not None:
        w_cnt = F.count("*").over(Window.partitionBy("tok"))
        inv = inv.withColumn("_bc", w_cnt).filter(F.col("_bc") <= block_cap).drop("_bc")
    a = inv.alias("a")
    b = inv.alias("b")
    return (
        a.join(b, F.col("a.tok") == F.col("b.tok"))
        .filter(F.col("a.norm") < F.col("b.norm"))
        .select(
            F.col("a.norm").alias("norm_a"),
            F.col("b.norm").alias("norm_b"),
        )
        .distinct()
    )


@F.pandas_udf(T.DoubleType())
def _cosine_batch(va: pd.Series, vb: pd.Series) -> pd.Series:
    """O22 batched cosine scorer — Arrow columns of array<float> in,
    float64 numpy math (matches the reference oracle's np.dot exactly)."""
    import numpy as np

    a = np.stack(va.to_numpy())
    b = np.stack(vb.to_numpy())
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    dots = np.einsum("ij,ij->i", a, b)
    na = np.sqrt(np.einsum("ij,ij->i", a, a))
    nb = np.sqrt(np.einsum("ij,ij->i", b, b))
    return pd.Series(dots / (na * nb))


def scored_edges(
    mentions: DataFrame,
    embeddings: DataFrame,
    n_embeddings: int | None = None,
    block_cap: int = BLOCK_CAP,
) -> DataFrame:
    """Accepted sameAs edges between distinct norm texts.

    Returns (norm_a, norm_b, jaccard, cosine) with norm_a < norm_b.
    """
    if n_embeddings is None:
        n_embeddings = embeddings.count()  # parquet metadata count — cheap
    norms = distinct_norms(mentions, n_embeddings)
    cands = candidate_pairs(norms, block_cap=block_cap)

    na = norms.select(
        F.col("norm_text").alias("norm_a"),
        F.col("tokset").alias("tokset_a"),
        F.col("vec_id").alias("vec_a"),
    )
    nb = norms.select(
        F.col("norm_text").alias("norm_b"),
        F.col("tokset").alias("tokset_b"),
        F.col("vec_id").alias("vec_b"),
    )
    emb = embeddings.select("vec_id", "embedding")

    scored = (
        cands.join(na, "norm_a")
        .join(nb, "norm_b")
        # embedding dict is a dimension table → broadcast both probes
        .join(
            F.broadcast(emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))),
            "vec_a",
        )
        .join(
            F.broadcast(emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))),
            "vec_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("tokset_a", "tokset_b")).cast("double")
            / F.size(F.array_union("tokset_a", "tokset_b")),
        )
        # same vec id ⇒ cosine is 1 by definition — avoids float-noise
        # flapping around the exactly-representable 1.0 grid point
        .withColumn(
            "cosine",
            F.when(F.col("vec_a") == F.col("vec_b"), F.lit(1.0)).otherwise(
                _cosine_batch(F.col("emb_a"), F.col("emb_b"))
            ),
        )
    )
    accepted = scored.filter(
        (F.col("jaccard") >= G.JACCARD_TAU)
        | (
            (F.col("jaccard") >= G.COSINE_JACCARD_MIN)
            & (F.col("cosine") >= G.COSINE_TAU)
        )
    )
    return accepted.select("norm_a", "norm_b", "jaccard", "cosine")


def explicit_sameas_edges(triples: DataFrame) -> DataFrame:
    """O16: coref-predicate filter over an existing triple table —
    explicit owl:sameAs / skos:exactMatch assertions become edges."""
    return triples.filter(F.col("p").isin(G.COREF_PREDICATES)).select(
        F.least(F.col("s"), F.col("o")).alias("norm_a"),
        F.greatest(F.col("s"), F.col("o")).alias("norm_b"),
    ).distinct()
