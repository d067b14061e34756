"""Deterministic interleaved-span synthesis (FIXTURES.md §B).

Builds the `input_hint` table
    (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)
from the driver-provided ``documents`` parquet — a *pure function* of
input rows, so every run and every parallelism level produces identical
bytes (scaling-determinism requirement, BASELINE.json:14).

Twine parity: the interleaved text/media sequence mirrors the GeoNames
alternating-line dump (``geonames/`` processor `[U~]`) and the Anansi
JSON envelope (``anansi/`` bridge `[U~]`) — SURVEY.md D2/O13.

Implementation note: 100% native Spark SQL higher-order functions
(sequence/transform/slice/array_join/flatten) — stays inside
whole-stage codegen; zero Python in this stage.  The identical formulas
are restated in DuckDB SQL by ``__spark_entry__.spans_sql()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import grammar as G

# Shared sub-expressions (Spark SQL dialect). `toks` and `mref` are
# columns prepared by with_spans().
_CHUNK = f"array_join(slice(toks, k*{G.CHUNK_TOKENS}+1, {G.CHUNK_TOKENS}), ' ')"
_OFF = f"if(k = 0, 0, length(array_join(slice(toks, 1, k*{G.CHUNK_TOKENS}), ' ')) + 1)"
_TEXT_SPAN = (
    f"named_struct('kind','text','text',{_CHUNK},'media_ref','','offset',{_OFF})"
)
_MEDIA_SPAN = (
    "named_struct('kind','media','text','','media_ref',mref,"
    f"'offset',{_OFF} + length({_CHUNK}))"
)

SPANS_EXPR = f"""
flatten(transform(
  sequence(0, cast(ceil(size(toks) / {G.CHUNK_TOKENS}.0) as int) - 1),
  k -> if((k + 1) % {G.MEDIA_EVERY} = 0,
          array({_TEXT_SPAN}, {_MEDIA_SPAN}),
          array({_TEXT_SPAN}))
))
"""


def with_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id:int64, text, lang, source, ...) → docs_spans."""
    return (
        documents.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            "lang",
            "source",
            F.split(F.col("text"), " ").alias("toks"),
            F.concat(
                F.lit("media://vec/"),
                (F.col("doc_id") % G.MEDIA_MOD).cast("string"),
            ).alias("mref"),
        )
        .withColumn("spans", F.expr(SPANS_EXPR))
        .select("doc_id", "lang", "source", "spans")
    )


def docs_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_spans(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def flat_spans(spark_or_df, sf_dir: str | None = None) -> DataFrame:
    """posexplode'd span view retaining order (O13/O29): one row per
    span with its position — never explode without position, per the
    span-sequence invariant (BASELINE.json:15)."""
    ds = docs_spans(spark_or_df, sf_dir) if sf_dir is not None else spark_or_df
    return ds.select(
        "doc_id",
        "lang",
        "source",
        F.posexplode("spans").alias("span_pos", "span"),
    ).select(
        "doc_id",
        "lang",
        "source",
        "span_pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
