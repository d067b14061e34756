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

# Shared sub-expressions (Spark SQL dialect). `toks`, `mref` and
# `clens` are columns prepared by with_spans().
_CHUNK = f"array_join(slice(toks, k*{G.CHUNK_TOKENS}+1, {G.CHUNK_TOKENS}), ' ')"
# offset = length(join of the first k·CHUNK tokens with ' ')) + 1
#        = Σ length(tok) + k·CHUNK  — computed as an integer aggregate
# (r7: the old form BUILT the whole prefix string per chunk just to
# measure it — O(doc²) bytes of allocation across a doc's chunks).
# r7 second session: the token-prefix aggregate itself was still
# O(tokens²/CHUNK) per doc (chunk k re-sums the first k·CHUNK token
# lengths); `clens` (per-chunk token-length sums, computed ONCE as a
# hoisted projection — the _tcs rule: a transform referenced from
# another lambda re-evaluates per access) turns each offset into a
# prefix sum over the ~tokens/CHUNK chunk array instead.  Identical
# value: Σ_{j<k} clens[j] = Σ length(tok) over the first k·CHUNK
# tokens.  Measured 0.9 → 0.6 s warm for the sf0.1 synthesis count.
_CLENS = (
    f"transform(sequence(0, cast(ceil(size(toks) / {G.CHUNK_TOKENS}.0) as int) - 1),"
    f" k -> aggregate(slice(toks, k*{G.CHUNK_TOKENS}+1, {G.CHUNK_TOKENS}), 0,"
    f" (a, t) -> a + length(t)))"
)
_OFF = (
    f"if(k = 0, 0, aggregate(slice(clens, 1, k), 0,"
    f" (a, x) -> a + x) + k*{G.CHUNK_TOKENS})"
)
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
        .withColumn("clens", F.expr(_CLENS))
        .withColumn("spans", F.expr(SPANS_EXPR))
        .select("doc_id", "lang", "source", "spans")
    )


def docs_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read + span synthesis.  The fixture is ONE parquet file (= one
    scan task), so without an exchange BELOW the synthesis projection
    the whole span/mention chain of every sf_dir-path consumer runs
    serially (r7 finding: kg_spans_flat 1.2 s → 0.4 s on local[32]);
    pipeline.py does the same for its own document frame."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return with_spans(docs.repartition(n))


def media_spans_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed form of ``extract.media_spans(flat_spans(spark, sf_dir))``
    — the media-span rows WITHOUT synthesizing any text chunk (r7,
    guide §1.2 "don't compute things you throw away"):

    with c = ceil(n_tokens / CHUNK_TOKENS) chunks, a media span follows
    every MEDIA_EVERY-th chunk, so media span i (1-based,
    i ≤ c div MEDIA_EVERY) sits at flattened span position
    (MEDIA_EVERY+1)·i − 1, and every media span of a doc carries the
    same doc-derived ref.  Equality with the explode path is pinned by
    tests/test_spans.py::test_media_spans_direct_equals_exploded."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    c = F.ceil(F.size(F.split("text", " ")) / F.lit(float(G.CHUNK_TOKENS))).cast("int")
    n_media = F.expr(f"CAST(ceil(size(split(text, ' ')) / {G.CHUNK_TOKENS}.0) AS INT) div {G.MEDIA_EVERY}")
    return (
        docs.repartition(n)
        # docs with fewer than MEDIA_EVERY chunks have no media span —
        # filter BEFORE sequence(1, 0) could produce a descending range
        .filter(c >= G.MEDIA_EVERY)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.concat(
                F.lit("media://vec/"),
                (F.col("doc_id") % G.MEDIA_MOD).cast("string"),
            ).alias("media_ref"),
            F.explode(F.sequence(F.lit(1), n_media)).alias("_i"),
        )
        .select(
            "doc_id",
            ((F.lit(G.MEDIA_EVERY + 1) * F.col("_i")) - 1)
            .cast("int")
            .alias("span_pos"),
            "media_ref",
        )
    )


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
