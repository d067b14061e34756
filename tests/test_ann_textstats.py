"""ANN + text-analysis operators."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kgspark import ann as A
from kgspark import textstats as TS


def test_ann_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = A.ann_topk(emb, n_queries=5, k=3).collect()
    rows = emb.collect()
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    want = {}
    for qi, q in enumerate(ids):
        if q >= 5:
            continue
        order = sorted(
            [(float(-sims[qi, j]), int(ids[j])) for j in range(len(ids)) if ids[j] != q]
        )
        want[q] = [n for _, n in order[:3]]
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q, lst in by_q.items():
        assert [n for _, n in sorted(lst)] == want[q]


def test_ann_ivf_subset_of_cell(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = A.ann_ivf(emb, n_queries=5, k=3)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in got.collect():
        assert labels[r["query_id"]] == labels[r["neighbor_id"]]


def test_quality_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = TS.text_quality(docs)
    bad = q.filter(
        (F.col("quality_e6") < 0) | (F.col("quality_e6") > 1000000)
        | (F.col("stop_ratio_e6") < 0) | (F.col("stop_ratio_e6") > 1000000)
        | (F.col("n_distinct") > F.col("n_tokens"))
    ).count()
    assert bad == 0


def test_fingerprint_deterministic_and_sensitive(spark):
    d1 = spark.createDataFrame(
        [(1, "table key order"), (2, "table key order"), (3, "order key table")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in TS.doc_fingerprints(d1).collect()}
    assert fps[1] == fps[2]          # same content → same fp
    assert fps[1] != fps[3]          # rolling hash is order-sensitive


def test_langid_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted((r["doc_id"], r["predicted_lang"]) for r in TS.langid(spark, docs).collect())
    b = sorted((r["doc_id"], r["predicted_lang"]) for r in TS.langid(spark, docs).collect())
    assert a == b
    langs = {p for _, p in a}
    assert langs <= {"en", "es", "de", "fr", "zh"}


def test_langid_accuracy_on_rotation_signal(spark, sf_dir):
    """The grammar.py lang-rotation signal makes accuracy measurable:
    each lang's trigram-code distribution is a distinct Caesar rotation
    of the shared corpus, so the profile scorer must recover the true
    lang for (nearly) every doc."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = TS.langid(spark, docs)
    acc = out.select(
        F.avg((F.col("predicted_lang") == F.col("lang")).cast("double"))
    ).collect()[0][0]
    assert acc >= 0.95, f"langid accuracy {acc:.3f} below 0.95"


def test_curate_corpus_policy(spark, sf_dir):
    """Composed curation decision: keep iff no rule fails, reasons are
    consistent with the component operators."""
    from pyspark.sql import functions as F

    from kgspark import grammar as G
    from kgspark.curate import curate_corpus
    from kgspark.dedup import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = curate_corpus(spark, docs).localCheckpoint()
    assert out.count() == docs.count(), "one decision per document"
    assert out.filter(
        (F.col("keep") == 1) != (F.col("reason") == "keep")
    ).count() == 0
    # low_quality rows really are below the threshold
    q = TS.text_quality(docs).select("doc_id", "quality_e6")
    bad = (
        out.filter(F.col("reason") == "low_quality")
        .join(q, "doc_id")
        .filter(F.col("quality_e6") >= G.QUALITY_MIN_E6)
        .count()
    )
    assert bad == 0
    # near_duplicate rows are exactly the cluster non-keepers that
    # passed the earlier rules
    cl = dedup_clusters(docs, jaccard_min=0.01)
    dups = {r["doc_id"] for r in cl.filter(F.col("doc_id") != F.col("keep_doc_id")).collect()}
    flagged = {r["doc_id"] for r in out.filter(F.col("reason") == "near_duplicate").collect()}
    assert flagged <= dups
