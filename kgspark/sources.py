"""Document sources (SURVEY.md O1/O2/O4).

Twine ingests from AMQP plus file injection (``twine-inject``/CLI
`[U~]`); documents arrive in multiple wire formats.  Here: fixed-schema
readers for parquet / JSON-lines / CSV (never schema inference in the
hot path) and the Anansi-envelope unwrapper (O4): spans of
``kind='envelope'`` carry a JSON body ``{"kind": ..., "text": ...,
"media_ref": ...}`` that is unwrapped natively (``from_json``, no
Python) and re-dispatched to the per-kind processors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
    ]
)


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """O2 multi-format document reader with the fixed schema."""
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    if fmt == "csv":
        return spark.read.schema(DOCUMENTS_SCHEMA).option("header", True).csv(path)
    raise ValueError(f"unknown document format: {fmt}")


def unwrap_envelopes(flat: DataFrame) -> DataFrame:
    """O4 Anansi-bridge analogue: spans with ``kind='envelope'`` hold a
    JSON body; unwrap it into the carried kind/text/media_ref (offset
    preserved) and union back with the pass-through spans.  Malformed
    envelopes become ``kind='envelope_invalid'`` (quarantine picks them
    up, mirroring MQ-reject)."""
    env = flat.filter(F.col("kind") == "envelope").withColumn(
        "_e", F.from_json("text", ENVELOPE_SCHEMA)
    )
    unwrapped = env.select(
        "doc_id",
        "lang",
        "source",
        "span_pos",
        F.coalesce(F.col("_e.kind"), F.lit("envelope_invalid")).alias("kind"),
        F.coalesce(F.col("_e.text"), F.lit("")).alias("text"),
        F.coalesce(F.col("_e.media_ref"), F.lit("")).alias("media_ref"),
        "offset",
    )
    passthrough = flat.filter(F.col("kind") != "envelope")
    return passthrough.unionByName(unwrapped)
