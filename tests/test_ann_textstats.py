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


def test_ann_mips_is_jvm_only_and_exact(spark, sf_dir):
    """MIPS scoring must stay whole-stage-codegen: the int64 dot via
    zip_with/aggregate needs no Python evaluation (unlike the cosine
    path's Pandas UDF)."""
    from kgspark.ann import ann_mips

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = ann_mips(emb)
    p = df._jdf.queryExecution().executedPlan().toString()
    for bad in ["ArrowEvalPython", "BatchEvalPython", "MapInPandas"]:
        assert bad not in p
    # hand check one query against numpy on the same e3 grid
    import numpy as np

    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    e3 = {k: np.round(1000 * v).astype(np.int64) for k, v in rows.items()}
    got = [(r["neighbor_id"], r["dot_e6"]) for r in
           df.filter("query_id = 3").orderBy("rank").collect()]
    full = sorted(
        ((int(e3[3] @ v), -k) for k, v in e3.items() if k != 3),
        reverse=True,
    )[:5]
    want = [(-nk, d) for d, nk in full]
    assert [g for g in got] == want


def test_retention_cohorts_hand_case(spark, tmp_path):
    import pandas as pd

    # u1 active weeks w, w+1; u2 only w; u3 first seen w+1
    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base, 10, "a", 1.0, "{}"),
        (2, base + pd.Timedelta(days=8), 10, "a", 1.0, "{}"),
        (3, base + pd.Timedelta(days=1), 20, "a", 1.0, "{}"),
        (4, base + pd.Timedelta(days=9), 30, "a", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    import kgspark.queries as QQ

    rows_out = QQ.event_retention_cohorts(spark, str(tmp_path)).collect()
    w0 = min(r["cohort_week"] for r in rows_out)
    out = {(r["cohort_week"] - w0, r["week_offset"], r["n_users"])
           for r in rows_out}
    # cohort w: u10+u20 at offset 0, u10 returns at offset 1;
    # u30 first appears in week w+1 → its own cohort at offset 0
    assert out == {(0, 0, 2), (0, 1, 1), (1, 0, 1)}


def test_term_pmi_hand_case(spark, tmp_path):
    """5 copies of 'x y', 5 of 'p q', 5 of 'x q': c(x,y)=c(p,q)=c(x,q)=5,
    unigrams x=10 y=5 p=5 q=10, N=30, M=15 — pmi_bits for (x,y) =
    bitlen(5)+2·bitlen(30)−bitlen(15)−bitlen(10)−bitlen(5) =
    3+10−4−4−3 = 2; (p,q) symmetric = 2; (x,q) = 3+10−4−4−4 = 1."""
    import pandas as pd

    rows = (
        [("x y", i) for i in range(5)]
        + [("p q", i + 5) for i in range(5)]
        + [("x q", i + 10) for i in range(5)]
    )
    pdf = pd.DataFrame(
        [(d, t, "en", "s", len(t)) for t, d in rows],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")
    import kgspark.queries as QQ

    got = {
        (r["w1"], r["w2"]): (r["c_xy"], r["pmi_bits"])
        for r in QQ.term_pmi(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("x", "y"): (5, 2),
        ("p", "q"): (5, 2),
        ("x", "q"): (5, 1),
    }


def test_srp_buckets_partition_invariant_and_complete(spark, sf_dir):
    """Every vector lands in exactly one bucket (Σ n_vecs = table
    count, Σ sum_vec_id = Σ vec_id) and the histogram is bit-identical
    at different parallelism (map-only signature, no order
    dependence)."""
    import kgspark.queries as QQ

    out = QQ.embedding_srp_buckets(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    assert sum(r["n_vecs"] for r in out) == n
    assert sum(r["sum_vec_id"] for r in out) == n * (n - 1) // 2
    assert all(0 <= r["bucket"] < 2**16 for r in out)


def test_surprisal_heldout_hand_case(spark, tmp_path):
    """Train half = docs 0,2 ('a b'); held doc 1 = 'a b a c': bigram
    (a,b) is in-vocab (bt=2, ut=2 → bitlen(1)=1 bit), (b,a) and (a,c)
    are OOV → n_bigrams=3, n_oov=2, mean over the 1 scored bigram =
    1e6."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(0, "a b", "en", "s", 3), (2, "a b", "en", "s", 3),
         (1, "a b a c", "en", "s", 7)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(f"{tmp_path}/documents.parquet")
    import kgspark.queries as QQ

    rows = QQ.doc_surprisal_heldout(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["n_bigrams"], r["n_oov"], r["avg_surprisal_e6"]) \
        == (1, 3, 2, 1000000)


def test_event_value_histogram_complete_and_bounded(spark, sf_dir):
    import kgspark.queries as QQ

    out = QQ.event_value_histogram(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == n
    assert all(0 <= r["bucket"] <= 15 for r in out)
    assert all(r["lo_e6"] <= r["hi_e6"] for r in out)


def test_kmeans_assign_total_and_range(spark, sf_dir):
    import kgspark.queries as QQ

    out = QQ.embedding_kmeans_assign(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert len(out) == emb.count()            # every vector assigned once
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["assigned_label"] for r in out} <= labels
    assert all(r["dist_e6"] >= 0 for r in out)


def test_vocab_growth_monotone_and_complete(spark, sf_dir):
    import kgspark.queries as QQ

    rows = sorted(
        QQ.vocab_growth(spark, sf_dir).collect(), key=lambda r: r["batch"]
    )
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes) and all(r["new_types"] > 0 for r in rows)
    assert sizes[-1] == sum(r["new_types"] for r in rows)


def test_event_debounce_hand_case(spark, tmp_path):
    """u1 clicks at t=0s, 30s, 90s: the 30s event is suppressed (<60s
    after the previous raw click), the 90s event is kept (60s after
    the 30s RAW anchor — lag semantics, documented); a different type
    at 10s is untouched."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + pd.Timedelta(seconds=30), 1, "click", 1.0, "{}"),
        (3, base + pd.Timedelta(seconds=90), 1, "click", 1.0, "{}"),
        (4, base + pd.Timedelta(seconds=10), 1, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    import kgspark.queries as QQ

    kept = {r["event_id"] for r in QQ.event_debounce(spark, str(tmp_path)).collect()}
    assert kept == {1, 3, 4}


def test_scd2_hand_case(spark, tmp_path):
    """u1: click,click,view,click → three SCD-2 versions; intervals
    tile exactly (valid_to == next valid_from), the open run carries
    valid_to=-1/is_current=1, run counts reflect the collapsed rows."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + pd.Timedelta(seconds=10), 1, "click", 1.0, "{}"),
        (3, base + pd.Timedelta(seconds=20), 1, "view", 1.0, "{}"),
        (4, base + pd.Timedelta(seconds=30), 1, "click", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    import kgspark.queries as QQ

    out = sorted(
        QQ.scd2_user_state(spark, str(tmp_path)).collect(),
        key=lambda r: r["run_id"],
    )
    assert [r["state"] for r in out] == ["click", "view", "click"]
    assert [r["n_events"] for r in out] == [2, 1, 1]
    # tiling: each version's valid_to is the next version's valid_from
    assert out[0]["valid_to_us"] == out[1]["valid_from_us"]
    assert out[1]["valid_to_us"] == out[2]["valid_from_us"]
    assert out[2]["valid_to_us"] == -1 and out[2]["is_current"] == 1
    assert [r["is_current"] for r in out[:2]] == [0, 0]
