"""Deduplication operators for large-scale training-data pipelines
(task brief §training-data ops): exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

All hashes come from the SQL-expressible family in grammar.py so every
operator has an exact DuckDB oracle.  Shingles are token 3-grams
(NGRAM_N); a shingle's code is the rolling hash of its three token
codes (missing tokens at the tail hash as 0), and MinHash permutation
``i`` is  h_i(code) = (A_i·code + B_i) mod P  with banding
LSH_BANDS × LSH_ROWS.

The fixture corpus contains no real near-duplicates (max observed
trigram Jaccard ≈ 0.02), so the LSH operators emit their full
candidate+score output — the machinery under test — and the
threshold-decision step is exercised in tests/test_dedup.py on
injected synthetic near-dups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import exprs as X
from . import grammar as G


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- shingling ----------------------------------------------------------------
def with_shingles(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, lang, source, shingles: array<bigint>) —
    distinct token-3-gram codes, native exprs only."""
    toks = F.split("text", " ")

    def tc(col):  # tokcode with NULL → 0 (tail shingles)
        c = F.coalesce(col, F.lit(""))
        return (
            F.ascii(F.substring(c, 1, 1)).cast("bigint") * 65536
            + F.ascii(F.substring(c, 2, 1)).cast("bigint") * 256
            + F.length(c).cast("bigint")
        )

    def scode(i):
        t1 = tc(F.get(toks, i - 1))
        t2 = tc(F.get(toks, i))
        t3 = tc(F.get(toks, i + 1))
        return ((t1 * 31 + t2) * 31 + t3) % F.lit(G.FP_MOD)

    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1)))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.transform(idx, scode)).alias("shingles"),
    )


# --- exact dedup ---------------------------------------------------------------
def exact_dup_groups(docs: DataFrame, prefix_tokens: int = 8) -> DataFrame:
    """Exact-duplicate groups by content key (hash-groupBy).  The
    fixture has no full-text duplicates, so the demo key is the first
    ``prefix_tokens`` tokens (23 groups at sf0.01); pass
    ``prefix_tokens=None`` for whole-text keys in production."""
    if prefix_tokens is None:
        key = F.split("text", " ")
    else:
        key = F.slice(F.split("text", " "), 1, prefix_tokens)
    return (
        docs.select("doc_id", X.fingerprint(key).alias("key_fp"))
        .groupBy("key_fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


# --- MinHash-LSH ----------------------------------------------------------------
@F.pandas_udf(T.ArrayType(T.LongType()))
def _minhash_sig(shingles: pd.Series) -> pd.Series:
    """64 MinHash values per shingle-code set — vectorized numpy over
    the Arrow batch (no per-row Python beyond the ragged stack)."""
    import numpy as np

    A = np.array([G.hash_a(i) for i in range(G.MINHASH_PERMS)], dtype=np.int64)
    B = np.array([G.hash_b(i) for i in range(G.MINHASH_PERMS)], dtype=np.int64)
    out = []
    for arr in shingles:  # ragged rows; inner math is vectorized numpy
        codes = np.asarray(arr, dtype=np.int64)[:, None]  # (n, 1)
        h = (codes * A[None, :] + B[None, :]) % G.HASH_P   # (n, 64)
        out.append(h.min(axis=0))
    return pd.Series(out)


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash) — LSH_BANDS rows per doc."""
    sh = with_shingles(docs)
    sig = sh.select("doc_id", "lang", "shingles", _minhash_sig("shingles").alias("sig"))
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(G.LSH_BANDS - 1)),
        lambda j: F.struct(
            j.alias("band_id"),
            (
                F.get("sig", j * G.LSH_ROWS) * F.lit(G.HASH_P)
                + F.get("sig", j * G.LSH_ROWS + 1)
            ).alias("band_hash"),
        ),
    )
    return sig.select(
        "doc_id", "lang", "shingles", F.explode(bands).alias("b")
    ).select("doc_id", "lang", "shingles", F.col("b.band_id"), F.col("b.band_hash"))


def minhash_lsh_pairs(docs: DataFrame, jaccard_min: float | None = None) -> DataFrame:
    """Candidate pairs sharing ≥1 LSH band, scored with their exact
    shingle-set Jaccard.  ``jaccard_min`` filters to decided near-dups
    (G.DEDUP_JACCARD_TAU for the standard dedup decision)."""
    b = minhash_bands(docs)
    a = b.alias("a")
    c = b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.band_id") == F.col("c.band_id"))
            & (F.col("a.band_hash") == F.col("c.band_hash"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .agg(
            F.first("a.shingles").alias("sh_a"),
            F.first("c.shingles").alias("sh_b"),
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    out = pairs.select(
        "doc_a",
        "doc_b",
        (
            inter.cast("double")
            / (F.size("sh_a") + F.size("sh_b") - inter)
        ).alias("jaccard"),
    )
    if jaccard_min is not None:
        out = out.filter(F.col("jaccard") >= jaccard_min)
    return out


# --- SimHash ---------------------------------------------------------------------
@F.pandas_udf(T.LongType())
def _simhash(shingles: pd.Series) -> pd.Series:
    """SIMHASH_BITS-bit SimHash over shingle codes: bit b uses hash
    index SIMHASH_HASH_OFFSET+b of the shared family; bit set iff the
    majority of shingles hash to 1 (strictly positive vote sum)."""
    import numpy as np

    idx = [G.SIMHASH_HASH_OFFSET + b for b in range(G.SIMHASH_BITS)]
    A = np.array([G.hash_a(i) for i in idx], dtype=np.int64)
    B = np.array([G.hash_b(i) for i in idx], dtype=np.int64)
    out = []
    for arr in shingles:
        codes = np.asarray(arr, dtype=np.int64)[:, None]
        bits = ((codes * A[None, :] + B[None, :]) % G.HASH_P) & 1  # (n, 62)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        setbits = np.where(votes > 0)[0]
        for b in setbits:  # ≤62 iterations, not per-row-data
            sim |= np.uint64(1) << np.uint64(b)
        out.append(int(sim))
    return pd.Series(out)


def doc_simhash(docs: DataFrame) -> DataFrame:
    sh = with_shingles(docs)
    return sh.select("doc_id", "lang", _simhash("shingles").alias("simhash"))


def simhash_pairs(docs: DataFrame, hamming_max: int = G.HAMMING_TAU) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked by lang.
    (At web scale, block on simhash prefixes/rotations instead of a
    metadata column; lang-blocking keeps the fixture oracle exact.)"""
    s = doc_simhash(docs)
    a = s.alias("a")
    b = s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
    )


# --- n-gram Jaccard ----------------------------------------------------------------
def ngram_jaccard_pairs(docs: DataFrame, jaccard_min: float = 0.01) -> DataFrame:
    """Exact token-3-gram Jaccard pairs within a source block."""
    sh = with_shingles(docs)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                inter.cast("double")
                / (F.size("a.shingles") + F.size("b.shingles") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_min)
    )


# --- embedding cosine near-dup -------------------------------------------------------
def embedding_neardup(embeddings: DataFrame, cosine_min: float = 0.25) -> DataFrame:
    """Near-dup embedding pairs within an IVF cell (= label column),
    double-precision cosine, threshold filter."""
    from .link import _cosine_batch

    e = embeddings.select("vec_id", "label", "embedding")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            _cosine_batch(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_min)
    )
