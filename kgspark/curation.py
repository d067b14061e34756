"""PII / content-filter curation (round 6) — the redaction stage of a
training-data pipeline (SURVEY §2 LLM-pipeline operators; the task
brief's curation family).

Twine itself had no PII stage (its corpus was already-published BBC
metadata); this operator covers the gap a training-data consumer of
the same pipeline hits: scrub contact-like strings before export and
report per-source filter rates.

Everything is native Spark expressions (`regexp_replace` /
`regexp_extract_all` chains — whole-stage codegen, zero per-row
Python); rules live in grammar.PII_RULES, shared with the DuckDB
oracle.  Scale shape: embarrassingly parallel per-document map over
the text column — no shuffle at all for the scrub, one map-side
combinable aggregate for the rate metric."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .grammar import PII_RULES


def scrub_expr(col: Column, rules=None) -> Column:
    """Sequential redaction chain — rule order is part of the spec
    (grammar.PII_RULES): each pattern rewrites the PREVIOUS rule's
    output, exactly like the oracle's nested regexp_replace."""
    out = col
    for _kind, pat, repl in (rules or PII_RULES):
        out = F.regexp_replace(out, F.lit(pat), F.lit(repl))
    return out


def count_exprs(col: Column, rules=None) -> list[Column]:
    """Per-rule match counts on the ORIGINAL text (one
    ``n_<kind>`` column per rule) — counts never see another rule's
    replacement tokens, matching the oracle's definition."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        .cast("bigint").alias(f"n_{kind}")
        for kind, pat, _repl in (rules or PII_RULES)
    ]


def scrub_pii(df: DataFrame, text_col: str = "text", rules=None) -> DataFrame:
    """documents(+text) → + clean_text, per-rule counts, n_pii total.

    Pure column map: partition-preserving, no shuffle, safe at any
    corpus size."""
    rules = rules or PII_RULES
    counted = df.select(
        "*",
        *count_exprs(F.col(text_col), rules),
        scrub_expr(F.col(text_col), rules).alias("clean_text"),
    )
    total = None
    for kind, _p, _r in rules:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return counted.withColumn("n_pii", total.cast("bigint"))


def pii_rate_by_source(
    df: DataFrame, text_col: str = "text", rules=None
) -> DataFrame:
    """Per-source curation metric: docs, docs containing any PII,
    total redactions, and hit-rate in e6 fixed-point — one partial+
    final hash aggregate (map-side combinable), linear at 100 TB."""
    s = scrub_pii(df, text_col, rules)
    return (
        s.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("bigint")).alias("n_docs_pii"),
            F.sum("n_pii").alias("n_redactions"),
        )
        .select(
            "source", "n_docs", "n_docs_pii", "n_redactions",
            F.floor(
                F.lit(1e6) * F.col("n_docs_pii").cast("double")
                / F.col("n_docs").cast("double")
            ).cast("bigint").alias("pii_rate_e6"),
        )
    )
