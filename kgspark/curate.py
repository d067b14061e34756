"""Corpus curation — the composed keep/drop decision a large-scale
training-data pipeline actually runs (task brief §training-data ops):

    quality gate  →  language-ID agreement  →  near-dup keeper

Each rule is one of the already-oracle-exact operators (textstats
quality, textstats langid, dedup near-dup clusters); this module only
JOINS their outputs and applies the grammar.py policy, so the composed
decision inherits a full DuckDB oracle (oracle_sql.CURATE_SQL).

Scale shape: three broadcast-light joins on doc_id over per-doc
outputs — the expensive work (profiles, LSH, clustering) happens once
inside the component operators; the decision layer adds no new
shuffle classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import grammar as G
from .dedup import dedup_clusters
from .textstats import langid, text_quality


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    quality_min_e6: int = G.QUALITY_MIN_E6,
    cluster_jaccard_min: float = 0.01,
) -> DataFrame:
    """(doc_id, reason, keep) for every document.

    ``reason`` is the FIRST failing rule (low_quality → lang_mismatch →
    near_duplicate) or 'keep'; ``keep`` is 1/0 (INT for cross-engine
    hash stability).  ``cluster_jaccard_min`` defaults to the contract
    demo threshold (the fixture has no true near-dups; production uses
    G.DEDUP_JACCARD_TAU)."""
    q = text_quality(docs).select("doc_id", "quality_e6")
    lid = langid(spark, docs).select("doc_id", "lang", "predicted_lang")
    cl = dedup_clusters(docs, jaccard_min=cluster_jaccard_min)
    joined = (
        docs.select("doc_id")
        .join(q, "doc_id")
        .join(lid, "doc_id")
        .join(cl, "doc_id", "left")
    )
    reason = (
        F.when(F.col("quality_e6") < quality_min_e6, F.lit("low_quality"))
        .when(F.col("predicted_lang") != F.col("lang"), F.lit("lang_mismatch"))
        .when(
            F.col("keep_doc_id").isNotNull()
            & (F.col("keep_doc_id") != F.col("doc_id")),
            F.lit("near_duplicate"),
        )
        .otherwise(F.lit("keep"))
    )
    return joined.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "keep").cast("int").alias("keep"),
    )
