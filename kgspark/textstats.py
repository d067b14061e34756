"""Text-analysis operators (task brief §text analysis): quality
scoring, token counting, document fingerprinting, language-ID.

Everything except langid is pure native column expressions with exact
DuckDB oracles.  Language-ID is a real char-trigram naive-Bayes
(profiles trained from the corpus itself, per the lang column) — the
fixture's text is language-independent so its *accuracy* is chance
level by construction, but the machinery (train → broadcast profiles →
vectorized score) is the production shape; covered by rows-only check
+ determinism tests.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exprs as X
from . import grammar as G


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + a composite score (all ×1e6 BIGINT)."""
    toks = F.split("text", " ")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stop = F.lit(G.STOP_TOKENS).cast("array<string>")
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    stop_ratio = n_stop.cast("double") / n
    distinct_ratio = n_distinct.cast("double") / n
    mean_len = (F.length("text") - (n - 1)).cast("double") / n
    score = (
        0.5 * (1 - stop_ratio)
        + 0.3 * F.least(F.lit(1.0), n.cast("double") / 50)
        + 0.2 * distinct_ratio
    )

    def e6(c):
        return F.floor(c * F.lit(1000000.0)).cast("bigint")

    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        e6(stop_ratio).alias("stop_ratio_e6"),
        e6(mean_len).alias("mean_tok_len_e6"),
        e6(score).alias("quality_e6"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{G.BPE_TOKEN_PATTERN}', 0)")
        ).alias("n_bpe_tokens"),
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash content fingerprint over the token stream (O35)."""
    return docs.select(
        "doc_id",
        X.fingerprint(F.split("text", " ")).alias("fingerprint"),
    )


# --- language-ID (char-trigram naive Bayes) ------------------------------------
def _train_profiles(docs: DataFrame, top_n: int = 500) -> dict[str, dict[str, float]]:
    """Per-lang char-trigram log-probabilities, trained with Spark aggs
    (distributed shape: explode → count → collect only the small
    profile table)."""
    tri = docs.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(1))),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("tri"),
    )
    counts = tri.groupBy("lang", "tri").count()
    rows = counts.collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["tri"]] = r["count"]
    profiles = {}
    for lang, cnts in by_lang.items():
        top = dict(sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n])
        total = sum(top.values()) + len(top)
        profiles[lang] = {t: math.log((c + 1) / total) for t, c in top.items()}
        profiles[lang]["__unk__"] = math.log(1.0 / total)
    return profiles


def langid(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Predict lang per doc via the trained trigram profiles (Arrow
    batch scoring; deterministic argmax with lexicographic tie-break)."""
    profiles = _train_profiles(docs)
    bc = spark.sparkContext.broadcast(profiles)

    @F.pandas_udf(T.StringType())
    def _predict(texts: pd.Series) -> pd.Series:
        prof = bc.value
        langs = sorted(prof)

        def score(text: str) -> str:
            tris = [text[i : i + 3] for i in range(max(len(text) - 2, 1))]
            best = (float("-inf"), "")
            for lang in langs:
                p = prof[lang]
                unk = p["__unk__"]
                s = sum(p.get(t, unk) for t in tris)
                if s > best[0]:
                    best = (s, lang)
            return best[1]

        return texts.map(score)

    return docs.select("doc_id", "lang", _predict(F.col("text")).alias("predicted_lang"))
