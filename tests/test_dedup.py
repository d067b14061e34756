"""Dedup operators on planted duplicates (the fixture corpus has no
natural near-dups — max trigram Jaccard ≈ 0.02 — so the decision
thresholds are exercised on injected ones)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import dedup as D
from kgspark import grammar as G


@pytest.fixture(scope="module")
def planted(spark, sf_dir):
    """Fixture docs + exact copies (doc_id+10000) and near-copies with
    the last 2 tokens altered (doc_id+20000) for the first 5 docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("doc_id") < 5)
    exact = base.withColumn("doc_id", F.col("doc_id") + 10000)
    near = base.withColumn("doc_id", F.col("doc_id") + 20000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz yy"))
    )
    return docs.unionByName(exact).unionByName(near)


def test_exact_dup_groups_full_text(spark, planted):
    groups = D.exact_dup_groups(planted, prefix_tokens=None).collect()
    # 5 exact-copy groups (near-copies differ in full text)
    assert len(groups) == 5
    assert all(r["n_docs"] == 2 for r in groups)
    assert all(r["keep_doc_id"] < 5 for r in groups)


def test_minhash_finds_planted_neardups(spark, planted):
    pairs = D.minhash_lsh_pairs(planted, jaccard_min=G.DEDUP_JACCARD_TAU).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for i in range(5):
        assert (i, i + 10000) in found, f"exact copy of {i} missed"
        assert (i, i + 20000) in found, f"near copy of {i} missed"
        assert (i + 10000, i + 20000) in found
    # exact copies score J=1
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert all(j[(i, i + 10000)] == 1.0 for i in range(5))


def test_simhash_planted(spark, planted):
    # short fixture docs (~20-60 shingles) have thin vote margins, so a
    # 2-token edit flips up to ~6 of 62 bits — use hamming_max=8 here
    # (HAMMING_TAU=3 is tuned for long documents)
    pairs = D.simhash_pairs(planted, hamming_max=8).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    for i in range(5):
        assert found.get((i, i + 10000)) == 0, "exact copy must have hamming 0"
        assert (i, i + 20000) in found, "near copy within hamming 8"


def test_ngram_jaccard_planted(spark, planted):
    pairs = D.ngram_jaccard_pairs(planted, jaccard_min=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert all((i, i + 10000) in found for i in range(5))


def test_minhash_banding_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    b = D.minhash_bands(docs)
    assert b.count() == 10 * G.LSH_BANDS
    assert b.groupBy("doc_id").count().filter(
        F.col("count") != G.LSH_BANDS
    ).count() == 0
