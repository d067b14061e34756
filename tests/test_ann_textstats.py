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
