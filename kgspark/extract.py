"""Extraction stage: interleaved spans → mentions + base triples
(SURVEY.md §3.1 "ingest", operators O9–O15, O27, O29).

Two interchangeable mention extractors, cross-checked in tests:

* ``mentions_df``       — the flagship **vectorized mapInPandas kernel**
  (north_star mandate: pandas/Arrow batch parse; the Twine processor
  analogue), routed through the O44 registry;
* ``mentions_df_native`` — pure JVM ``regexp_extract_all`` +
  ``posexplode`` (whole-stage-codegen path; also what the DuckDB oracle
  mirrors).

Both are deterministic and agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import exprs as X
from . import grammar as G
from .processors import PROCESSORS
from .processors.media import MEDIA_FEATURES_DDL
from .processors.text import MENTIONS_DDL


def text_spans(flat: DataFrame) -> DataFrame:
    return flat.filter(F.col("kind") == "text").select(
        "doc_id", "lang", "source", "span_pos", "text"
    )


def media_spans(flat: DataFrame) -> DataFrame:
    return flat.filter(F.col("kind") == "media").select(
        "doc_id", "span_pos", "media_ref"
    )


def quarantine_spans(flat: DataFrame) -> DataFrame:
    """O15 side output: spans whose kind has no registered processor
    (the MQ-reject analogue, libtwine plugins.c `[U]`)."""
    return flat.filter(~F.col("kind").isin(list(PROCESSORS)))


def mentions_df(flat: DataFrame) -> DataFrame:
    """Arrow-batched mention extraction via the registered text kernel."""
    return text_spans(flat).mapInPandas(PROCESSORS["text"], schema=MENTIONS_DDL)


def media_features_df(flat: DataFrame) -> DataFrame:
    """Arrow-batched media feature extraction via the media kernel."""
    return media_spans(flat).mapInPandas(PROCESSORS["media"], schema=MEDIA_FEATURES_DDL)


def media_features_from(media_span_rows: DataFrame) -> DataFrame:
    """Media kernel over an already-extracted (doc_id, span_pos,
    media_ref) frame — e.g. fixtures.media_spans_direct, which derives
    the media rows arithmetically instead of synthesizing every text
    chunk (r7)."""
    return media_span_rows.select("doc_id", "span_pos", "media_ref").mapInPandas(
        PROCESSORS["media"], schema=MEDIA_FEATURES_DDL
    )


def mentions_df_native(flat: DataFrame) -> DataFrame:
    """JVM-only equivalent (regexp_extract_all + posexplode)."""
    runs = text_spans(flat).select(
        "doc_id",
        "lang",
        "source",
        "span_pos",
        F.expr(
            "regexp_extract_all(concat(' ', text, ' '), '"
            + G.MENTION_PATTERN.replace("\\", "\\\\")
            + "', 1)"
        ).alias("runs"),
    )
    m = runs.select(
        "doc_id",
        "lang",
        "source",
        "span_pos",
        F.posexplode("runs").alias("mention_ord", "mention_text"),
    )
    norm = X.norm_text(F.col("mention_text"))
    return m.select(
        "doc_id",
        "lang",
        "source",
        F.col("span_pos").cast("int").alias("span_pos"),
        F.col("mention_ord").cast("int").alias("mention_ord"),
        "mention_text",
        norm.alias("norm_text"),
        X.mention_iri(F.col("source"), norm).alias("mention_iri"),
    )


def base_quads(flat: DataFrame, mentions: DataFrame) -> DataFrame:
    """Per-document extraction quads ``(doc_id, g, s, p, o)`` — the D3/D4
    named-graph model: every triple extracted from a document lands in
    that document's graph ``g = doc://<id>`` (Twine's unit of storage &
    replacement, ``libtwine/graph.c`` twine_graph `[U~]`).

    Deduplication is PER DOCUMENT (librdf models are set-semantic
    within one parsed payload); the same statement asserted by two
    documents keeps one row per graph.  This makes the stage a pure
    per-doc function — required for per-bucket idempotent resume: each
    output row's bucket is its originating doc's bucket, never a
    constant or a cross-doc aggregate key.
    """
    t_mention = mentions.select(
        "doc_id",
        X.doc_iri(F.col("doc_id")).alias("s"),
        F.lit(G.P_MENTIONS).alias("p"),
        F.col("mention_iri").alias("o"),
    )
    t_type = mentions.select(
        "doc_id",
        F.col("mention_iri").alias("s"),
        F.lit(G.P_TYPE).alias("p"),
        F.lit(G.O_ENTITY_CLASS).alias("o"),
    )
    t_media = flat.filter(F.col("kind") == "media").select(
        "doc_id",
        X.doc_iri(F.col("doc_id")).alias("s"),
        F.lit(G.P_HAS_MEDIA).alias("p"),
        F.col("media_ref").alias("o"),
    )
    t_lang = flat.select("doc_id", "lang").distinct().select(
        "doc_id",
        X.doc_iri(F.col("doc_id")).alias("s"),
        F.lit(G.P_LANGUAGE).alias("p"),
        F.col("lang").alias("o"),
    )
    return (
        t_mention.unionByName(t_type)
        .unionByName(t_media)
        .unionByName(t_lang)
        .dropDuplicates(["doc_id", "s", "p", "o"])
        .select(
            "doc_id",
            X.doc_iri(F.col("doc_id")).alias("g"),
            "s",
            "p",
            "o",
            # D3 term model: extraction objects are IRIs except the
            # plain dc:language literal (no lang tag / datatype here)
            F.when(F.col("p") == G.P_LANGUAGE, F.lit("literal"))
            .otherwise(F.lit("iri"))
            .alias("o_kind"),
            F.lit("").alias("o_lang"),
            F.lit("").alias("o_datatype"),
        )
    )


def base_triples(flat: DataFrame, mentions: DataFrame) -> DataFrame:
    """Graph-agnostic distinct (s,p,o) view of the extraction quads
    (O27; librdf set semantics across the whole batch)."""
    return base_quads(flat, mentions).select("s", "p", "o").dropDuplicates(
        ["s", "p", "o"]
    )
