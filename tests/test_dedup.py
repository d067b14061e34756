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


def test_dedup_clusters_planted(spark, planted):
    """Decision step at the production threshold: each planted trio
    (original, exact copy, near copy) collapses to one cluster keyed by
    the min doc_id; untouched docs appear in no cluster."""
    out = {r["doc_id"]: r["keep_doc_id"]
           for r in D.dedup_clusters(planted).collect()}
    for i in range(5):
        assert out.get(i) == i
        assert out.get(i + 10000) == i, "exact copy keeps the original"
        assert out.get(i + 20000) == i, "near copy keeps the original"
    # a doc with no near-dup must not appear
    assert 7 not in out


def test_setsim_pairs_hot_key_exact(spark):
    """Hot-key correctness: 60 sets sharing one scorching code (every
    pair qualifies through it) — the salted slim count join must still
    produce the exact brute-force pair set and Jaccard values."""
    import itertools

    rows = []
    for i in range(60):
        # shared hot code 999; two semi-shared codes; one unique code
        rows.append((i, [999, 100 + (i % 3), 200 + (i % 5), 1000 + i]))
    df = spark.createDataFrame(rows, "id long, codes array<bigint>")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in D.setsim_pairs(df, "id", "codes", 0.2).collect()
    }
    sets = {i: set(c) for i, c in rows}
    want = {}
    for a, b in itertools.combinations(range(60), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.2:
            want[(a, b)] = round(j, 9)
    assert got == want and len(want) > 100
