"""Plan + determinism gates for the round-3 operators: no accidental
cartesian products, banded/as-of joins keep their scale shape, and
results are invariant to input partitioning."""

from __future__ import annotations

import kgspark.queries as Q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_is_window_not_join(spark, sf_dir):
    """The as-of operator must stay the union+window form: no join
    operator at all between the two event sides (the naive inequality
    join explodes at scale), one partition-by-user window chain."""
    p = _plan(Q.event_asof_join(spark, sf_dir))
    for bad in ["CartesianProduct", "BroadcastNestedLoopJoin",
                "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"]:
        assert bad not in p, f"as-of degenerated into {bad}"
    assert "Window" in p


def test_range_join_is_banded(spark, sf_dir):
    """The interval join must be an equi-join on the grid bucket (hash
    join key), never a nested-loop over the raw inequality."""
    p = _plan(Q.event_range_join(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bgp_match_no_cartesian(spark, sf_dir):
    p = _plan(Q.kg_bgp_match(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_tfidf_dictionary_not_broadcast_hinted(spark, sf_dir):
    """At fixture scale AQE may still choose broadcast; the gate is that
    the LOGICAL plan carries no explicit broadcast hint on the df side
    (open-vocabulary dictionaries must be free to shuffle)."""
    df = Q.top_terms_tfidf(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    # exactly one hint: the 1-row n_docs frame
    assert logical.count("UnresolvedHint") <= 1 or logical.count("hint") <= 1


def test_new_ops_partitioning_invariant(spark, sf_dir):
    """asof / range / kmv / split results are identical at 2 vs 32
    shuffle partitions (no partition-order dependence)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run_all():
        return [
            {tuple(r) for r in Q.event_asof_join(spark, sf_dir).collect()},
            {tuple(r) for r in Q.event_range_join(spark, sf_dir).collect()},
            {tuple(r) for r in Q.distinct_kmv_sketch(spark, sf_dir).collect()},
            {tuple(r) for r in Q.doc_split_assign(spark, sf_dir).collect()},
            {tuple(r) for r in Q.doc_pack_assign(spark, sf_dir).collect()},
        ]

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        lo = run_all()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        hi = run_all()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert lo == hi


def test_bgp_filter_pushed_into_pattern_scans(spark, sf_dir):
    """kg_bgp_filter's FILTER expressions are single-variable column
    predicates — Catalyst must push each below the joins into the one
    pattern scan binding its variable.  Gate: in the optimized plan no
    Filter ABOVE a Join still mentions the rlike/cast predicates."""
    df = Q.kg_bgp_filter(spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    join_depths = [len(l) - len(l.lstrip(" +-:")) for l in lines if "Join" in l]
    assert join_depths, "expected a join chain"
    top_join = min(join_depths)
    for l in lines:
        depth = len(l) - len(l.lstrip(" +-:"))
        if "Filter" in l and depth < top_join:
            assert "rlike" not in l.lower() and "cast" not in l.lower(), (
                f"filter not pushed below the joins: {l.strip()}"
            )


def test_bgp_filter_no_cartesian(spark, sf_dir):
    p = _plan(Q.kg_bgp_filter(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_sameas_closure_rides_cc_not_doubling(spark, sf_dir):
    """The symmetric path compiles to the CC machinery: output is the
    same-label self-join (one equi-join on label), not an iterated
    pair-doubling chain."""
    p = _plan(Q.kg_sameas_closure(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_entity_media_rule_joins_broadcast(spark, sf_dir):
    """Both rule-table joins in kg_entity_media must be broadcast hash
    joins (≤4-row dims); no cartesian anywhere."""
    p = _plan(Q.kg_entity_media(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2, p[:2000]


def test_setsim_hybrid_union_feeds_pair_count(spark, sf_dir):
    """Round-5 hybrid skew handling: the cold (unsalted) and hot
    (salt²) candidate joins UNION before the per-pair count aggregate
    — one Union node above the pair-count HashAggregate pair, no
    cartesian/BNLJ anywhere, and the aggregate is partial+final
    (map-side combine)."""
    from kgspark import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(D.ngram_jaccard_pairs(docs))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Union" in p
    assert p.count("HashAggregate") >= 2


def test_path_seq_no_cartesian(spark, sf_dir):
    p = _plan(Q.kg_sparql_path_seq(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_subquery_aggregate_partial_final(spark, sf_dir):
    p = _plan(Q.kg_sparql_subquery(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2  # partial + final around one shuffle


def test_quota_sample_plans_window_group_limit(spark, sf_dir):
    """rn <= k must keep Spark's WindowGroupLimit (per-partition top-k
    before the full window sort) — the plan property that makes the
    quota sample scale."""
    p = _plan(Q.doc_quota_sample(spark, sf_dir))
    assert "WindowGroupLimit" in p, p[:1500]


def test_pii_scrub_is_shuffle_free_native_map(spark, sf_dir):
    """PII redaction must be a pure per-document column map: no
    Exchange (shuffle) anywhere, no Python evaluation (the regex chain
    is JVM-side whole-stage codegen)."""
    p = _plan(Q.pii_scrub(spark, sf_dir))
    assert "Exchange" not in p, "pii_scrub must not shuffle"
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"pii_scrub fell off the JVM: {bad}"


def test_pii_rule_order_is_sequential(spark):
    """Rule order is part of the spec: a string that is an email AND
    contains an 8+ digit run is consumed by the EARLIER email rule."""
    from kgspark.curation import scrub_pii
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "mail 123456789@example.com and ref 987654321 end")],
        "doc_id long, text string",
    )
    row = scrub_pii(df).select("clean_text", "n_email", "n_idnum").collect()[0]
    assert row["clean_text"] == "mail <EMAIL> and ref <ID> end"
    assert (row["n_email"], row["n_idnum"]) == (1, 2)  # counts on ORIGINAL


def test_repetition_stats_values(spark):
    """Hand-computable repetition metrics: 'a a a b' → top token 3/4,
    dup tokens 2/4; bigrams ('a a','a a','a b') → top 2/3, dup 1/3.
    Single-token doc gets zeroed bigram metrics, not NULL."""
    from kgspark.curation import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4
    assert r1["top_token_e6"] == 750000
    assert r1["dup_token_e6"] == 500000
    assert r1["top_bigram_e6"] == 666666
    assert r1["dup_bigram_e6"] == 333333
    assert r1["rep_flagged"]  # 0.75 > 0.14 threshold
    r2 = rows[2]
    assert (r2["top_bigram_e6"], r2["dup_bigram_e6"]) == (0, 0)
    assert r2["top_token_e6"] == 1000000 and r2["rep_flagged"]


def test_repetition_stats_plan_two_level_agg(spark, sf_dir):
    """The repetition metrics must aggregate (doc, term)->(doc) with
    map-side partial aggregation and never evaluate Python."""
    p = _plan(Q.doc_repetition_stats(spark, sf_dir))
    assert "HashAggregate" in p
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"repetition_stats fell off the JVM: {bad}"


def test_line_dup_stats_detects_shared_paragraph(spark):
    """Two docs sharing an identical 12-token window are flagged; the
    unique doc is not."""
    from kgspark.curation import line_dup_stats
    import kgspark.grammar as G

    boiler = G.BOILER_TEXT
    df = spark.createDataFrame(
        [
            (1, "en", "s", boiler + " unique tail one two"),
            (2, "en", "s", boiler + " other words here now"),
            (3, "en", "s", "completely different text with no shared window"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    rows = {r["doc_id"]: r for r in line_dup_stats(df).collect()}
    assert rows[1]["n_boiler"] == 1 and rows[2]["n_boiler"] == 1
    assert rows[3]["n_boiler"] == 0
    assert rows[1]["boiler_rate_e6"] == 500000  # 1 of 2 windows


def test_bfs_hops_chain_and_horizon(spark):
    """cc.bfs_hops on a 7-node chain seeded at one end: dist = node
    index up to the 4-round horizon; nodes past the horizon are
    absent; a disconnected seedless node never appears."""
    from kgspark.cc import bfs_hops
    import pyspark.sql.functions as F

    chain = [(i, i + 1) for i in range(6)]  # 0-1-2-3-4-5-6
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        (r["node"], r["dist"])
        for r in bfs_hops(edges, seeds, n_rounds=4).collect()
    }
    assert got == {(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)}  # 5,6 past horizon

    # multi-source: min distance wins, frontier union is exact
    seeds2 = spark.createDataFrame([(0,), (6,)], "node long")
    got2 = {
        (r["node"], r["dist"])
        for r in bfs_hops(edges, seeds2, n_rounds=4).collect()
    }
    assert got2 == {
        (0, 0), (6, 0), (1, 1), (5, 1), (2, 2), (4, 2), (3, 3),
    }


def test_doc_resample_is_map_only(spark, sf_dir):
    """Resampling must be a pure map stage: no Exchange, no Python —
    the copy expansion is explode(sequence) over native columns."""
    p = _plan(Q.doc_resample(spark, sf_dir))
    assert "Exchange" not in p, "doc_resample must not shuffle"
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"doc_resample fell off the JVM: {bad}"


def test_doc_resample_weights(spark, sf_dir):
    """Every source's emitted copy count stays within the fractional
    envelope of its weight: floor(w) ≤ copies/doc ≤ ceil(w), and a
    weight-2.0 source emits exactly 2 copies of every doc."""
    import pyspark.sql.functions as F

    rows = (
        Q.doc_resample(spark, sf_dir)
        .groupBy("doc_id", "source", "weight_e6")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert rows
    for r in rows:
        lo, hi = r["weight_e6"] // 1_000_000, -(-r["weight_e6"] // 1_000_000)
        assert max(lo, 1) <= r["n"] <= max(hi, 1), r
        if r["weight_e6"] == 2_000_000:
            assert r["n"] == 2, r


def test_bigram_surprisal_values(spark):
    """Hand-checked corpus: bigram 'a b' occurs 3× of 4 prefix-'a'
    bigrams → bitlen(4 div 3) = 1; 'a c' once → bitlen(4) = 3."""
    import pyspark.sql.functions as F
    from unittest import mock

    docs = spark.createDataFrame(
        [(1, "a b a b x"), (2, "a b a c")],
        "doc_id long, text string",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: docs):
        out = {r["doc_id"]: r for r in Q.doc_bigram_surprisal(spark, "x").collect()}
    # doc 1 bigrams: (a,b),(b,a),(a,b),(b,x) ; doc 2: (a,b),(b,a),(a,c)
    # prefix a: 4 total → 'a b' bt=3 s=bitlen(4//3)=1 ; 'a c' bt=1 s=bitlen(4)=3
    # prefix b: 3 total → 'b a' bt=2 s=bitlen(3//2)=1 ; 'b x' bt=1 s=bitlen(3)=2
    d1 = out[1]
    assert d1["n_bigrams"] == 4
    assert d1["surprisal"] == 2 * 1 + 1 + 2  # 2×(a,b) + (b,a) + (b,x)
    assert d1["avg_surprisal_e6"] == (1_000_000 * 5) // 4
    d2 = out[2]
    assert d2["n_bigrams"] == 3
    assert d2["surprisal"] == 1 + 1 + 3  # (a,b) + (b,a) + (a,c)
    assert d2["avg_surprisal_e6"] == (1_000_000 * 5) // 3


def test_doc_chunk_is_map_only(spark, sf_dir):
    p = _plan(Q.doc_chunk(spark, sf_dir))
    assert "Exchange" not in p, "doc_chunk must not shuffle"
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"doc_chunk fell off the JVM: {bad}"


def test_doc_chunk_boundaries(spark):
    """20 tokens at (C=16, S=12): two chunks — [1..16] and the kept
    partial [13..20]; 16 tokens: exactly one chunk; 1 token: one
    1-token chunk."""
    from unittest import mock

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(1, 21))),
            (2, " ".join(f"u{i}" for i in range(1, 17))),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: docs):
        rows = Q.doc_chunk(spark, "x").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["start_tok"], r["n_tok"]) for r in d1] == [(1, 16), (13, 8)]
    assert d1[1]["chunk_text"].split(" ") == [f"t{i}" for i in range(13, 21)]
    assert [(r["start_tok"], r["n_tok"]) for r in by_doc[2]] == [(1, 16)]
    assert [(r["n_tok"], r["chunk_text"]) for r in by_doc[3]] == [(1, "solo")]


def test_session_stats_single_shuffle(spark, sf_dir):
    """The per-session rollup must reuse the window's user_id hash
    partitioning for the (user_id, session_seq) groupBy — exactly one
    Exchange in the whole plan (plus nothing Python-side)."""
    p = _plan(Q.event_session_stats(spark, sf_dir))
    n_ex = p.count("Exchange hashpartitioning")
    assert n_ex == 1, f"expected 1 shuffle, plan has {n_ex}:\n{p}"
    for bad in ["BatchEvalPython", "ArrowEvalPython", "CartesianProduct"]:
        assert bad not in p


def test_session_stats_gap_rule(spark):
    """3 events 10 min apart = one session; a 31-min gap splits; the
    per-session aggregates line up with the raw rows."""
    from unittest import mock
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, 7, t0, 1.5),
            (2, 7, t0 + dt.timedelta(minutes=10), 2.0),
            (3, 7, t0 + dt.timedelta(minutes=20), 0.25),
            (4, 7, t0 + dt.timedelta(minutes=51, seconds=1), 4.0),
            (5, 8, t0, 1.0),
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: ev):
        rows = {(r["user_id"], r["session_seq"]): r
                for r in Q.event_session_stats(spark, "x").collect()}
    assert set(rows) == {(7, 1), (7, 2), (8, 1)}
    s1 = rows[(7, 1)]
    assert s1["n_events"] == 3
    assert s1["duration_us"] == 20 * 60 * 1_000_000
    assert s1["sum_value_e6"] == 3_750_000
    s2 = rows[(7, 2)]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0
    assert s2["sum_value_e6"] == 4_000_000


def test_ngram_coverage_is_linear(spark, sf_dir):
    """Coverage metric must never enumerate doc pairs: no nested-loop
    join, and the only joins are the df-per-code equi-join."""
    p = _plan(Q.dedup_ngram_coverage(spark, sf_dir))
    for bad in ["CartesianProduct", "BroadcastNestedLoopJoin"]:
        assert bad not in p
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"coverage fell off the JVM: {bad}"


def test_ngram_coverage_values(spark):
    """Two docs sharing one shingle, one doc disjoint: shared shingle
    counts as dup on both sides, disjoint doc has dup_frac 0."""
    from unittest import mock

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "s1"),      # shingles: abc, bcd
            (2, "a b c x", "en", "s1"),      # shingles: abc, bcx
            (3, "p q r", "en", "s2"),        # shingle: pqr
        ],
        "doc_id long, text string, lang string, source string",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: docs):
        out = {r["doc_id"]: r
               for r in Q.dedup_ngram_coverage(spark, "x").collect()}
    assert out[1]["n_shingles"] == 2 and out[1]["n_dup"] == 1
    assert out[1]["dup_frac_e6"] == 500_000
    assert out[2]["n_shingles"] == 2 and out[2]["n_dup"] == 1
    assert out[3]["n_shingles"] == 1 and out[3]["n_dup"] == 0
    assert out[3]["dup_frac_e6"] == 0


def test_embedding_quantize_map_only(spark, sf_dir):
    p = _plan(Q.embedding_quantize(spark, sf_dir))
    assert "Exchange" not in p, "quantization must not shuffle"
    for bad in ["BatchEvalPython", "ArrowEvalPython", "MapInPandas"]:
        assert bad not in p, f"quantization fell off the JVM: {bad}"


def test_embedding_quantize_values(spark):
    """[1.0, -0.5, 0.0] on the e3 grid: maxabs 1000, codes
    [127, -64, 0] (symmetric round-half-up), errsum 500."""
    from unittest import mock

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: emb):
        out = {r["vec_id"]: r
               for r in Q.embedding_quantize(spark, "x").collect()}
    v1 = out[1]
    assert v1["maxabs_e3"] == 1000
    assert v1["q_checksum"] == 127 * 1 + (-64) * 2 + 0 * 3
    assert v1["mean_abs_err_e6"] == (1_000_000 * 500) // (127 * 3 * 1000)
    v2 = out[2]  # zero vector: scale 0, all codes 0, zero error
    assert (v2["maxabs_e3"], v2["mean_abs_err_e6"], v2["q_checksum"]) == (0, 0, 0)


def test_link_prediction_shape_and_cap(spark, sf_dir):
    p = _plan(Q.entity_link_prediction(spark, sf_dir))
    for bad in ["CartesianProduct", "BroadcastNestedLoopJoin"]:
        assert bad not in p


def test_event_funnel_values(spark):
    """Hand funnel: user 1 completes in order; user 2 views BEFORE
    signup (view must not count — strictly-after semantics); user 3
    never signs up (reached 0 even though they purchased)."""
    from unittest import mock
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    ev = spark.createDataFrame(
        [
            (1, ts(0), "signup"), (1, ts(10), "view"), (1, ts(20), "purchase"),
            (2, ts(5), "view"), (2, ts(9), "signup"), (2, ts(30), "purchase"),
            (3, ts(1), "view"), (3, ts(2), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: ev):
        out = {r["user_id"]: r for r in Q.event_funnel(spark, "x").collect()}
    assert out[1]["reached"] == 3
    assert out[2]["reached"] == 1  # view at t5 < signup t9 doesn't count
    assert out[2]["t2_us"] is None
    assert out[3]["reached"] == 0


def test_event_funnel_plan_no_window(spark, sf_dir):
    """Funnel = chained per-user min-aggregates; no full-stream window,
    no nested-loop join."""
    p = _plan(Q.event_funnel(spark, sf_dir))
    for bad in ["CartesianProduct", "BroadcastNestedLoopJoin", "Window"]:
        assert bad not in p, f"funnel plan degenerated: {bad}"


def test_cms_estimates_upper_bound(spark, sf_dir):
    """CMS point estimates are one-sided: estimate >= truth for every
    probed token, and the estimate of a unique heavy hitter in a tiny
    corpus is exact (no collision in 4x512 buckets over ~5 tokens)."""
    out = Q.heavy_hitters_cms(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["overcount"] >= 0
        assert r["cms_count"] >= r["true_count"]


def test_cms_sketch_width_bound(spark):
    """Sketch build must reduce to <= CMS_D * CMS_W counter groups."""
    from unittest import mock
    import kgspark.grammar as G

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c")], "doc_id long, text string"
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: docs):
        out = {r["token"]: r for r in Q.heavy_hitters_cms(spark, "x").collect()}
    assert out["a"]["true_count"] == 4
    assert out["a"]["cms_count"] >= 4
    assert out["a"]["rnk"] == 1
    assert len(out) <= G.CMS_TOP_K


def test_bpe_pairs_values(spark):
    """'ab ab b' -> word freqs {ab:2, b:1}; pairs a>b:2, b>$:3."""
    from unittest import mock

    docs = spark.createDataFrame(
        [(1, "ab ab b")], "doc_id long, text string"
    )
    with mock.patch.object(Q, "_t", lambda s, d, n: docs):
        rows = Q.bpe_merge_pairs(spark, "x").collect()
    by_pair = {(r["lhs"], r["rhs"]): r["cnt"] for r in rows}
    assert by_pair[("b", "$")] == 3
    assert by_pair[("a", "b")] == 2
    top = min(rows, key=lambda r: r["rnk"])
    assert (top["lhs"], top["rhs"]) == ("b", "$")


def test_sparql_ask_describe(spark, sf_dir):
    asks = {r["q"]: r["ask"] for r in Q.kg_sparql_ask(spark, sf_dir).collect()}
    assert asks == {"commerce_scored": 1, "nosuch": 0}
    d = Q.kg_sparql_describe(spark, sf_dir)
    assert d.columns == ["s", "p", "o"]
    assert "CartesianProduct" not in _plan(d)


def test_link_adamic_plan_and_weights(spark, sf_dir):
    p = _plan(Q.entity_link_adamic(spark, sf_dir))
    for bad in ["CartesianProduct", "BroadcastNestedLoopJoin"]:
        assert bad not in p


def test_link_adamic_values(spark, tmp_path):
    # bipartite graph a-z1, a-z2, a-z3, b-z1, b-z2 (deg: a=3, b=2,
    # z1=z2=2, z3=1): pair (a,b) via hinges z1,z2 → cn=2,
    # w(z)=1e6 DIV bitlen(2)=500000 each → aa=1000000,
    # jac_e6 = 2e6 DIV (3+2-2) = 666666; the mirror pair (z1,z2) via
    # hinges a,b → w(a)=1e6 DIV bitlen(3)=500000 too, jac denominator
    # 2+2-2 → 1000000
    import pandas as pd

    docs = pd.DataFrame({"entity_a": ["a", "a", "a"],
                         "entity_b": ["z1", "z2", "z3"]})
    more = pd.DataFrame({"entity_a": ["b", "b"], "entity_b": ["z1", "z2"]})
    coocc = pd.concat([docs, more], ignore_index=True)
    import kgspark.queries as QQ
    from unittest import mock

    cdf = spark.createDataFrame(coocc)
    with mock.patch.object(QQ, "kg_entity_cooccurrence",
                           lambda s, d: cdf):
        out = {tuple(r) for r in
               QQ.entity_link_adamic(spark, "unused").collect()}
    assert out == {("a", "b", 2, 1000000, 666666),
                   ("z1", "z2", 2, 1000000, 1000000)}


def test_bpe_vocab_merges_hand_case(spark, tmp_path):
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1, 2], "text": ["ab ab ab cd", "ab cd cd"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [11, 8],
    }).to_parquet(f"{tmp_path}/documents.parquet")
    out = [tuple(r) for r in
           Q.bpe_vocab_merges(spark, str(tmp_path)).collect()]
    # wf: ab=4, cd=3 → r1 (a,b)=4 beats (b,$)=4 on lhs; r2 merged
    # symbol 'ab' pairs with '$'; r3 (c,d)=3 beats (d,$)=3 on lhs
    assert out == [(1, "a", "b", 4), (2, "ab", "$", 4), (3, "c", "d", 3)]


def test_bpe_vocab_merges_skips_self_pairs(spark, tmp_path):
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1], "text": ["aa aa aa ab"], "lang": ["en"],
        "source": ["s"], "n_chars": [11],
    }).to_parquet(f"{tmp_path}/documents.parquet")
    out = [tuple(r) for r in
           Q.bpe_vocab_merges(spark, str(tmp_path), rounds=1).collect()]
    # (a,a)=3 is the raw argmax but self-pairs are excluded from
    # SELECTION → (a,$)=3 wins (lhs tie-break vs (a,b)=1 irrelevant)
    assert out == [(1, "a", "$", 3)]


def test_negative_edges_partitioning_invariant_and_clean(spark, sf_dir):
    """Corruption sampling is hash-deterministic: identical output at
    2 vs 32 shuffle partitions; no emitted corrupted pair may be a
    positive edge or touch its own head/tail degenerately."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run():
        return {tuple(r) for r in
                Q.kg_negative_edges(spark, sf_dir).collect()}

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        lo = run()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        hi = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert lo == hi and len(lo) > 0

    pos = {(r["entity_a"], r["entity_b"]) for r in
           Q.kg_entity_cooccurrence(spark, sf_dir)
           .select("entity_a", "entity_b").collect()}
    for a, b, slot, neg in lo:
        assert neg != a and neg != b
        assert (min(a, neg), max(a, neg)) not in pos


def test_mad_outliers_hand_case(spark, tmp_path):
    """values [1..9, 100]: med=5.5 → med_2x=11e6; devs (2x,e6):
    9,7,5,3,1,1,3,5,7,189 → sorted → mad_4x = 2*med(dev_2x) = 2*4e6;
    flag 2*dev > 3*mad_4x → only the 100 (2*189e6 > 24e6)."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    vals = list(range(1, 10)) + [100]
    pdf = pd.DataFrame({
        "event_id": range(10),
        "ts": [base] * 10,
        "user_id": [1] * 10,
        "event_type": ["t"] * 10,
        "value": [float(v) for v in vals],
        "props": ["{}"] * 10,
    })
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    out = [(r["event_id"], r["v_e6"]) for r in
           Q.event_value_outliers(spark, str(tmp_path)).collect()]
    assert out == [(9, 100_000_000)]


def test_session_window_boundary_semantics(spark, tmp_path):
    """An event EXACTLY 30 min after its predecessor still EXTENDS
    the session — session_window closes only strictly beyond
    last + gap (the same boundary as the >30min gap-rule
    sessionizer), pinned here so the oracle can never drift."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [base, base + pd.Timedelta(minutes=30),
               base + pd.Timedelta(minutes=40)],
        "user_id": [7, 7, 7],
        "event_type": ["t"] * 3,
        "value": [1.0, 2.0, 4.0],
        "props": ["{}"] * 3,
    })
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    out = sorted(
        (r["n_events"], r["sum_value_e6"])
        for r in Q.event_session_window_stats(spark, str(tmp_path)).collect()
    )
    # all three merge: the exactly-30-min event extends the session
    assert out == [(3, 7_000_000)]


def test_neighbor_agg_hand_case(spark, sf_dir):
    """Triangle a-b, a-c (deg a=2, b=1, c=1): a's neighbor sums =
    deg(b)+deg(c)=2; b's = deg(a)=2 — checked via mock co-occurrence
    with unit scores."""
    import pandas as pd
    from unittest import mock

    import kgspark.queries as QQ

    coocc = spark.createDataFrame(
        pd.DataFrame({"entity_a": ["a", "a"], "entity_b": ["b", "c"]}))
    attrs = spark.createDataFrame(
        pd.DataFrame({"entity_id": ["a", "b", "c"], "score": [10, 20, 30]}))
    with mock.patch.object(QQ, "kg_entity_cooccurrence", lambda s, d: coocc), \
         mock.patch.object(QQ, "kg_entity_attrs", lambda s, d: attrs):
        out = {r["entity_id"]: (r["n_neighbors"], r["nbr_deg_sum"],
                                r["nbr_score_sum"])
               for r in QQ.entity_neighbor_agg(spark, "x").collect()}
    assert out == {"a": (2, 2, 50), "b": (1, 2, 10), "c": (1, 2, 10)}


def test_bpe_encode_compresses(spark, tmp_path):
    """'ab ab ab cd' + 'ab cd cd' learn (a,b), (ab,$), (c,d): word
    'ab' → 1 symbol ('ab$'), word 'cd' → 2 ('cd','$'); doc 1 =
    3·'ab' + 'cd' → before 3·3+3=12, after 3·1+2=5."""
    import pandas as pd

    pd.DataFrame({
        "doc_id": [1, 2], "text": ["ab ab ab cd", "ab cd cd"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [11, 8],
    }).to_parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: (r["n_syms_before"], r["n_syms_after"])
           for r in Q.bpe_encode_counts(spark, str(tmp_path)).collect()}
    assert out == {1: (12, 5), 2: (9, 5)}


def test_cumulative_users_hand_case(spark, tmp_path):
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = []
    # u1 day0, u2 day0, u1 again day1, u3 day2
    for i, (u, d) in enumerate([(1, 0), (2, 0), (1, 1), (3, 2)]):
        rows.append((i, base + pd.Timedelta(days=d), u, "t", 1.0, "{}"))
    pdf = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmp_path}/events.parquet")
    out = [(r["new_users"], r["cum_users"]) for r in
           Q.event_cumulative_users(spark, str(tmp_path))
           .orderBy("day").collect()]
    assert out == [(2, 2), (1, 3)]  # day1 adds nobody new → no row


def test_label_index_partitioning_invariant(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def run():
        return {tuple(r) for r in Q.kg_label_index(spark, sf_dir).collect()}

    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        lo = run()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        hi = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert lo == hi and len(lo) > 0


def test_top_neighbors_plans_window_group_limit(spark, sf_dir):
    """rn <= 3 per entity must compile to WindowGroupLimit (partial
    top-k before the exchange) — the property that bounds the shuffle
    to k rows per entity at any scale."""
    p = _plan(Q.entity_top_neighbors(spark, sf_dir))
    assert "WindowGroupLimit" in p, p[:1500]


def test_incremental_dedup_subset_and_planted_pair(spark, sf_dir):
    """The incremental pair set == the full LSH pair set restricted to
    pairs touching the new batch (no pair lost by incrementality, no
    old×old pair leaked), and a planted near-dup crossing the
    new/old boundary is found tagged new-old."""
    from kgspark import dedup as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inc = {
        (r["doc_a"], r["doc_b"]): r["pair_kind"]
        for r in D.minhash_incremental_pairs(docs).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(docs).collect()
    }
    want = {
        (a, b) for (a, b) in full if a % 10 == 0 or b % 10 == 0
    }
    assert set(inc) == want
    assert all(
        (k == "new-new") == (a % 10 == 0 and b % 10 == 0)
        for (a, b), k in inc.items()
    )
    # planted: doc 10 (new) duplicated as doc 10001 (old) → found new-old
    import pandas as pd

    src = docs.filter("doc_id = 10").toPandas()
    clone = src.copy()
    clone["doc_id"] = 10001
    planted = spark.createDataFrame(
        pd.concat([docs.toPandas(), clone], ignore_index=True)
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["pair_kind"], r["jaccard_e6"])
        for r in D.minhash_incremental_pairs(planted).collect()
    }
    assert got[(10, 10001)] == ("new-old", 1000000)


def test_neighbor_sample_plans_window_group_limit(spark, sf_dir):
    """Fixed-fanout sampling must keep WindowGroupLimit and pick
    exactly <= 2 deterministic neighbors per entity."""
    df = Q.entity_neighbor_sample(spark, sf_dir)
    p = _plan(df)
    assert "WindowGroupLimit" in p, p[:1500]
    rows = df.collect()
    from collections import Counter

    per = Counter(r["entity_id"] for r in rows)
    assert all(v <= 2 for v in per.values())
    # re-run → bit-identical (hash order, no rand())
    again = {tuple(r) for r in Q.entity_neighbor_sample(spark, sf_dir).collect()}
    assert {tuple(r) for r in rows} == again


def test_tpch_q5_star_join_broadcasts_dims(spark, sf_dir):
    """The 6-table star join must stream the fact table through
    BroadcastHashJoins at fixture scale — no cartesian, no
    BroadcastNestedLoopJoin, >= 4 broadcast joins."""
    p = _plan(Q.tpch_q5(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("BroadcastHashJoin") >= 4, p[:2000]
