"""Spark-side builders for the driver-contract queries
(__spark_entry__.queries()).  Each builder takes (spark, sf_dir) and
returns a DataFrame whose column names/types line up exactly with the
DuckDB oracle SQL in oracle_sql.py / __spark_entry__.oracle_sql().

Cross-engine conventions (see oracle_sql.py): floats become
floor(1e6*x) BIGINT per row *before* any aggregation; timestamps become
unix micros; every computed column is aliased.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cc as cc_mod
from . import exprs as X
from . import extract, fixtures, link
from . import generate as gen
from . import grammar as G


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ensure_utc(spark: SparkSession) -> None:
    """Timestamp-emitting queries interpret the fixture's TIMESTAMP_NTZ
    values as UTC instants (matching DuckDB's epoch_us); pin the session
    zone so the contract is independent of the caller's TZ config."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def e6(col):
    """floor(1e6 * x) as BIGINT — the shared float-output convention."""
    return F.floor(col * F.lit(1000000.0)).cast("bigint")


# --- KG pipeline queries -----------------------------------------------------
def kg_spans_flat(spark, sf_dir):
    return fixtures.flat_spans(spark, sf_dir).select(
        "doc_id", "span_pos", "kind", "text", "media_ref", "offset"
    )


def kg_span_invariant(spark, sf_dir):
    """Per-document span-sequence signature (BASELINE.json:15 invariant):
    md5 over the ordered (kind|text|media_ref|offset) lines."""
    ds = fixtures.docs_spans(spark, sf_dir)
    sig = F.md5(
        F.array_join(
            F.transform(
                "spans",
                lambda s: F.concat_ws(
                    "|", s["kind"], s["text"], s["media_ref"],
                    s["offset"].cast("string"),
                ),
            ),
            "\n",
        )
    )
    return ds.select(
        "doc_id", F.size("spans").alias("n_spans"), sig.alias("sig")
    )


def kg_mentions(spark, sf_dir):
    flat = fixtures.flat_spans(spark, sf_dir)
    return extract.mentions_df(flat).select(
        "doc_id", "lang", "source", "span_pos", "mention_ord",
        "mention_text", "norm_text", "mention_iri",
    )


def kg_mention_counts(spark, sf_dir):
    m = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    return m.groupBy("norm_text").agg(
        F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs")
    )


def _edges(spark, sf_dir):
    m = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    emb = _t(spark, sf_dir, "embeddings")
    return m, link.scored_edges(m, emb)


def kg_link_edges(spark, sf_dir):
    _, edges = _edges(spark, sf_dir)
    return edges.select(
        "norm_a", "norm_b",
        e6(F.col("jaccard")).alias("jaccard_e6"),
        F.round(F.col("cosine") * F.lit(1000000.0)).cast("bigint").alias("cosine_e6"),
    )


_LABELS_CACHE: dict = {}


def _labels(spark, sf_dir):
    """Memoized per (session, sf_dir) like run_pipeline_cached: seven
    contract queries derive from the same mentions+edges+CC chain —
    lazy localCheckpoints make the first consumer pay once and the
    rest reuse the materialized lineage.

    r7 ordering fix: the mentions checkpoint is taken BEFORE the edge
    DAG is built and the edges are checkpointed BEFORE CC consumes
    them — previously the un-checkpointed edge DAG (mentions kernel
    included) re-executed once for CC's edge count and again for the
    driver union-find collect, tripling the chain's one-time cost."""
    key = (id(spark.sparkContext), sf_dir)
    if key not in _LABELS_CACHE:
        m = extract.mentions_df(fixtures.flat_spans(spark, sf_dir)).localCheckpoint(
            eager=False
        )
        emb = _t(spark, sf_dir, "embeddings")
        # mention tokens are the ENTITY_TOKENS alternation by
        # construction (grammar.MENTION_PATTERN); the bitmask path's
        # in-job guard falls back to the exact array path on any
        # unknown token, so passing the dictionary is a pure shortcut.
        edges = link.scored_edges(
            m, emb, vocab=sorted(G.ENTITY_TOKENS)
        ).localCheckpoint(eager=False)
        norms = m.select(F.col("norm_text").alias("node")).distinct()
        labels = cc_mod.connected_components(edges, norms).localCheckpoint(
            eager=False
        )
        _LABELS_CACHE[key] = (m, labels)
    return _LABELS_CACHE[key]


_MEMBERS_CACHE: dict = {}


def _members(spark, sf_dir):
    """Memoized entity membership on top of the _labels chain: the
    generate-family queries (entities, attrs, classes, props, media,
    cooccurrence) all start from the same membership join — share one
    checkpointed computation instead of rebuilding it per query."""
    key = (id(spark.sparkContext), sf_dir)
    if key not in _MEMBERS_CACHE:
        m, labels = _labels(spark, sf_dir)
        _MEMBERS_CACHE[key] = gen.entity_membership(m, labels).localCheckpoint(
            eager=False
        )
    return _MEMBERS_CACHE[key]


def kg_entities(spark, sf_dir):
    m, labels = _labels(spark, sf_dir)
    return gen.entities_df(m, labels, members=_members(spark, sf_dir))


def kg_entity_attrs(spark, sf_dir):
    m, labels = _labels(spark, sf_dir)
    return gen.entity_attrs_df(m, labels, members=_members(spark, sf_dir))


def kg_triples(spark, sf_dir):
    from .pipeline import run_pipeline_cached

    return run_pipeline_cached(spark, sf_dir).triples


def kg_media_features(spark, sf_dir):
    # closed-form media rows (fixtures.media_spans_direct) — no text
    # chunk is synthesized; same rows as the explode path (tested)
    ms = fixtures.media_spans_direct(spark, sf_dir)
    return extract.media_features_from(ms).select(
        "doc_id", "span_pos", "media_ref", "media_kind", "ref_bytes",
        "vec_id", "content_fp",
    )


# --- relational operator coverage (SURVEY.md §2 oracle sketches) -------------
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .withColumn("rev_e6", e6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(e6(F.col("l_quantity"))).alias("sum_qty_e6"),
            F.sum("rev_e6").alias("revenue_e6"),
            F.count("*").alias("n"),
        )
    )


def revenue_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(e6(F.col("o_totalprice"))).alias("revenue_e6"),
            F.count("*").alias("n_orders"),
        )
    )


def customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def order_priorities_with_lineitems(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def top2_lineitems_per_order(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # Input-skew fix (guide §2.5): the fixture table is ONE parquet file
    # with a single row group, so the map-side sort + partial
    # WindowGroupLimit run in one task.  Hash-repartition by the window
    # key parallelizes the sort (measured 0.75 → 0.40 s noop at sf0.1) —
    # but ONLY when the scan is degenerate: on a well-split input the
    # implicit exchange's partial WindowGroupLimit halves the shuffled
    # rows, which the explicit repartition would forfeit.
    if li.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        li = li.select("l_orderkey", "l_linenumber", "l_extendedprice").repartition(
            "l_orderkey"
        )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("l_orderkey", "l_linenumber", "rn")
    )


def tpch_q3_topk(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join (segment-filtered customers ⋈ orders
    ⋈ lineitem) with date band filters, revenue aggregation, top-10 —
    the multi-join + agg + top-k composite (O19/O26/O31)."""
    _ensure_utc(spark)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # scalar-subquery shape without a driver round-trip at plan-build
    # time: the 1-row min(segment) aggregate joins back as a broadcast —
    # the oracle's (SELECT min(c_mktsegment) FROM customer), lazily
    seg_df = c.agg(F.min("c_mktsegment").alias("_seg"))
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    return (
        c.join(F.broadcast(seg_df), c.c_mktsegment == F.col("_seg"))
        .drop("_seg")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter((F.col("o_orderdate") < cutoff) & (F.col("l_shipdate") > cutoff))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(e6(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_e6"
            )
        )
        .orderBy(F.desc("revenue_e6"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "revenue_e6",
        )
    )


def event_moving_sum(spark, sf_dir):
    """RANGE-frame window (the one frame type lead/lag/row_number
    don't cover): per user, value sum + row count over the trailing
    30 real-time minutes — tie-agnostic because a RANGE frame includes
    every peer row of the current timestamp."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        e6(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-30 * 60 * 1000000, 0)
    )
    return base.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).alias("mov_sum_e6"),
        F.count("*").over(w).alias("n_window"),
    )


def event_gaps(spark, sf_dir):
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.unix_micros(F.lead("ts").over(w).cast("timestamp")).alias("next_ts_us"),
    )


def top10_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", e6(F.col("o_totalprice")).alias("totalprice_e6"))
    )


def lineitem_except_all(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp")).select(
        "l_orderkey", "l_linenumber"
    )
    b = li.filter(F.col("l_discount") > 0.05).select("l_orderkey", "l_linenumber")
    return a.exceptAll(b)


def distinct_segments(spark, sf_dir):
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def events_isin_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    types = ev.select("event_type").distinct().orderBy("event_type").limit(2)
    keep = [r[0] for r in types.collect()]
    return (
        ev.filter(F.col("event_type").isin(keep))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def events_json_k(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k": ([0-9]+)', 1).cast("bigint").alias("k"),
    )


def best_order_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("best_orderkey"),
            e6(F.col("o_totalprice")).alias("totalprice_e6"),
        )
    )


def event_type_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(e6(F.col("value"))).alias("sum_value_e6"),
    )


def latest_event_per_user(spark, sf_dir):
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    )


def norm_iri_demo(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    raw = F.concat(
        F.lit("HTTP://Example.COM:80/c/"),
        F.regexp_replace(F.col("c_name"), " ", "_"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit("?x=1")).otherwise(F.lit("")),
    )
    return c.select(
        "c_custkey", raw.alias("raw_iri"), X.norm_iri(raw).alias("norm_iri")
    )


# --- training-data-pipeline operators (dedup / ANN / text analysis) ----------
def dedup_exact(spark, sf_dir):
    from . import dedup as D

    return D.exact_dup_groups(_t(spark, sf_dir, "documents"))


def dedup_minhash_pairs(spark, sf_dir):
    from . import dedup as D

    pairs = D.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))
    return pairs.select("doc_a", "doc_b", e6(F.col("jaccard")).alias("jaccard_e6"))


def dedup_clusters(spark, sf_dir):
    """Near-dup clusters → canonical keeper per cluster.  The fixture
    has no true near-dups (max trigram J ≈ 0.02), so the contract
    decision threshold is 0.01 — the clustering machinery under test;
    the production τ (DEDUP_JACCARD_TAU) is exercised on planted
    duplicates in tests/test_dedup.py."""
    from . import dedup as D

    return D.dedup_clusters(_t(spark, sf_dir, "documents"), jaccard_min=0.01)


def doc_simhash(spark, sf_dir):
    from . import dedup as D

    return D.doc_simhash(_t(spark, sf_dir, "documents"))


def dedup_simhash_pairs(spark, sf_dir):
    from . import dedup as D

    return D.simhash_pairs(_t(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


def ngram_jaccard_pairs(spark, sf_dir):
    from . import dedup as D

    pairs = D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))
    return pairs.select("doc_a", "doc_b", e6(F.col("jaccard")).alias("jaccard_e6"))


def embedding_neardup(spark, sf_dir):
    from . import dedup as D

    p = D.embedding_neardup(_t(spark, sf_dir, "embeddings"))
    return p.select(
        "vec_a", "vec_b", "label",
        F.round(F.col("cosine") * F.lit(1000000.0)).cast("bigint").alias("cosine_e6"),
    )


def embedding_neardup_trained(spark, sf_dir):
    from . import dedup as D

    p = D.embedding_neardup_trained(_t(spark, sf_dir, "embeddings"))
    return p.select(
        "vec_a", "vec_b", "cell",
        F.round(F.col("cosine") * F.lit(1000000.0)).cast("bigint").alias("cosine_e6"),
    )


def ann_topk(spark, sf_dir):
    from . import ann as A

    return A.ann_topk(_t(spark, sf_dir, "embeddings"))


def ann_ivf(spark, sf_dir):
    from . import ann as A

    return A.ann_ivf(_t(spark, sf_dir, "embeddings"))


def ann_ivf_probe(spark, sf_dir):
    from . import ann as A

    return A.ann_ivf_probe(_t(spark, sf_dir, "embeddings"))


def text_quality(spark, sf_dir):
    from . import textstats as TS

    return TS.text_quality(_t(spark, sf_dir, "documents"))


def token_counts(spark, sf_dir):
    from . import textstats as TS

    return TS.token_counts(_t(spark, sf_dir, "documents"))


def doc_fingerprint(spark, sf_dir):
    from . import textstats as TS

    return TS.doc_fingerprints(_t(spark, sf_dir, "documents"))


def langid(spark, sf_dir):
    from . import textstats as TS

    return TS.langid(spark, _t(spark, sf_dir, "documents"))


def ann_recall(spark, sf_dir):
    """ANN quality evaluation: per-query recall@k of the IVF
    cell-restricted search against the exact brute-force top-k — the
    standard accuracy metric for the similarity-search suite, computed
    as one distributed job (semi-join hit counting, no collect).
    Deterministic because both rankings are."""
    from . import ann

    emb = _t(spark, sf_dir, "embeddings")
    k = 3
    exact = ann.ann_topk(emb, n_queries=20, k=k).select("query_id", "neighbor_id")
    ivf = ann.ann_ivf(emb, n_queries=20, k=k).select("query_id", "neighbor_id")
    hits = (
        exact.join(ivf, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    qs = exact.select("query_id").distinct()
    n_hits = F.coalesce("n_hits", F.lit(0)).cast("bigint")
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        n_hits.alias("n_hits"),
        F.floor(F.lit(1e6) * n_hits / F.lit(k)).cast("bigint").alias("recall_e6"),
    )


def distinct_kmv_sketch(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch per language over
    the shingle-code universe — the task brief's "novel sketch" slot.
    k = grammar.KMV_K, shared with the DuckDB oracle (a per-call k
    parameter silently diverged from the oracle — round-3 ADVICE).

    The sketch state is the k smallest values of h(code) where h is the
    grammar's integer hash family (pure int64 → bit-identical on every
    engine), so unlike HLL this sketch is DETERMINISTIC and the DuckDB
    oracle checks it value-exactly.  Estimator: (k-1)·P / kth_min
    (integer division).  Scale shape: the per-partition top-k of a
    monotone hash merges associatively — at cluster scale the k minima
    reduce map-side first; here the window row_number does the same in
    two phases (WindowGroupLimit partial → final).  Also reports the
    exact distinct count for error inspection."""
    from .dedup import with_shingles

    k = G.KMV_K
    sh = with_shingles(_t(spark, sf_dir, "documents"))
    # codes feeds BOTH the sketch path and the exact count — share the
    # materialized distinct instead of recomputing the shingle chain
    codes = (
        sh.select("lang", F.explode("shingles").alias("code"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    a0, b0 = G.hash_a(0), G.hash_b(0)
    hs = codes.select(
        "lang",
        ((F.lit(a0) * F.col("code") + F.lit(b0)) % F.lit(G.HASH_P)).alias("h"),
    ).distinct()
    # rn <= k (not == k) so Spark's WindowGroupLimit prunes each input
    # partition to its k smallest BEFORE the per-lang shuffle — the
    # reducer sees ≤ k·P rows instead of every hash of the language;
    # kth value = max of the k survivors (only when a full k exist)
    w = Window.partitionBy("lang").orderBy("h")
    kth = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("lang")
        .agg(F.max("h").alias("kth_min"), F.count("*").alias("nk"))
        .filter(F.col("nk") == k)
        .select("lang", "kth_min")
    )
    n = codes.groupBy("lang").agg(F.count("*").alias("n_codes"))
    est_num = (k - 1) * G.HASH_P
    return n.join(kth, "lang", "left").select(
        "lang",
        F.col("n_codes").cast("bigint").alias("n_codes"),
        F.coalesce("kth_min", F.lit(0)).cast("bigint").alias("kth_min"),
        F.when(
            F.col("kth_min").isNotNull(),
            F.expr(f"{est_num} DIV kth_min"),
        )
        .otherwise(F.col("n_codes"))
        .cast("bigint")
        .alias("est"),
    )


def doc_split_assign(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10) — the standard
    training-data-pipeline assignment, keyed on a hash of the DOC ID
    (never random()): reruns, resumes, and any partitioning produce the
    identical split, and adding documents never reassigns existing ones.
    Uses the grammar's int64 hash family so the DuckDB oracle reproduces
    the assignment value-exactly."""
    docs = _t(spark, sf_dir, "documents")
    h = (F.lit(G.hash_a(1)) * F.col("doc_id") + F.lit(G.hash_b(1))) % F.lit(
        G.HASH_P
    )
    bucket = h % 100
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def doc_pack_assign(spark, sf_dir):
    """Sequence packing (concat-and-chunk) — the standard LLM
    training-data step after splitting: documents are concatenated in a
    deterministic order and cut into fixed-capacity training sequences;
    each document is assigned (seq_id, offset) of its starting token.

    Scale shape: a GLOBAL ordered cumulative sum would be one
    sequential scan of the corpus — instead documents hash into
    PACK_SHARDS independent packing shards and the running token count
    is a per-(split, shard) window cumsum: embarrassingly parallel
    across shards, one shuffle, deterministic at any parallelism
    (doc_id is unique ⇒ the window order is total).  Sequence identity
    is (split, shard, seq_id)."""
    return _pack_assign(_t(spark, sf_dir, "documents"))


def _pack_assign(docs):
    """Shared packing kernel over any (doc_id, text) frame — used by
    doc_pack_assign (whole corpus) and training_export (survivors)."""
    h_split = (
        F.lit(G.hash_a(1)) * F.col("doc_id") + F.lit(G.hash_b(1))
    ) % F.lit(G.HASH_P) % 100
    split = (
        F.when(h_split < 80, F.lit("train"))
        .when(h_split < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    shard = (
        (F.lit(G.hash_a(2)) * F.col("doc_id") + F.lit(G.hash_b(2)))
        % F.lit(G.HASH_P) % G.PACK_SHARDS
    ).cast("int")
    d = docs.select(
        "doc_id", split.alias("split"), shard.alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("split", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start")
    return d.select("doc_id", "split", "shard", "n_tok", start).select(
        "doc_id", "split", "shard", "n_tok",
        F.expr(f"start DIV {G.PACK_CAPACITY}").cast("bigint").alias("seq_id"),
        (F.col("start") % G.PACK_CAPACITY).cast("bigint").alias("seq_off"),
    )


def training_export(spark, sf_dir):
    """The composed END of the training-data pipeline: corpus curation
    (quality → langid → near-dup keeper) selects the survivors, then
    the deterministic split + sequence packing runs over the SURVIVING
    documents only — the actual export a 100 TB pretraining run
    consumes.  Composes three already-oracle-exact operator families
    into one decision + assignment with ONE composed DuckDB oracle
    (same pattern as curate_corpus).  Scale shape: the curation joins
    are per-doc, the packing cumsum is per-(split, shard) — dropping a
    document re-packs only its shard's tail, never the corpus."""
    from .curate import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    kept = curate_corpus(spark, docs).filter(F.col("keep") == 1).select("doc_id")
    return _pack_assign(docs.join(kept, "doc_id"))


def top_terms_tfidf(spark, sf_dir, k: int = 3):
    """Per-document top-k salient terms by an INTEGER-exact tf-idf:
    score = tf · bitlen(N // df), where bitlen(x) = ⌊log2 x⌋ + 1 — a
    log2-quantized idf computed entirely in int64, so the ranking is
    bit-identical on every engine (a float ln() idf can flap at floor
    boundaries between engines).  Scale shape: tf is a map-side-combined
    groupBy; df a term-level aggregate joined back by term — NOT
    broadcast-hinted, because an open-vocabulary corpus has a term
    dictionary far too large to broadcast (AQE auto-broadcasts small
    ones, shuffles big ones); top-k a per-doc window."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n")).select("n")
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.length(F.bin(F.expr("n DIV df")))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "term", F.col("score").cast("bigint").alias("score"), "rn")
    )


def curate_corpus(spark, sf_dir):
    """Composed keep/drop curation decision (quality → langid →
    near-dup keeper; grammar.py policy)."""
    from .curate import curate_corpus as C

    return C(spark, _t(spark, sf_dir, "documents"))


# --- RDF round-trip + triple/quad-table queries --------------------------------
_TERM_COLS = ["s", "p", "o", "o_kind", "o_lang", "o_datatype"]


def rdf_ntriples_roundtrip(spark, sf_dir):
    """Serialize the FULL-TERM triples to N-Triples (@lang tags,
    ^^datatypes), parse back with the vectorized kernel — oracle is the
    independent DuckDB full-term triple oracle, so the round-trip must
    be lossless including language tags and datatypes."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    return rdfio.parse_ntriples(rdfio.to_ntriples(t)).select(*_TERM_COLS)


def rdf_turtle_roundtrip(spark, sf_dir):
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    return rdfio.parse_turtle(rdfio.to_turtle(t)).select(*_TERM_COLS)


def rdf_jsonld_roundtrip(spark, sf_dir):
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    return rdfio.parse_jsonld(rdfio.to_jsonld(t)).select(*_TERM_COLS)


def xml_transform(spark, sf_dir):
    """O12 XSLT-analogue: deterministically render each document as a
    one-line XML payload (native exprs), then template-transform it to
    full-term triples through the registered ``xml`` kernel; the
    DuckDB oracle derives the same triples directly from the table."""
    from .processors.xml import XML_TRIPLES_DDL, xml_transform_kernel

    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    xml = F.concat(
        F.lit('<doc id="'), F.col("doc_id").cast("string"),
        F.lit('"><title xml:lang="'), F.col("lang"), F.lit('">'),
        F.array_join(F.slice(toks, 1, 3), " "),
        F.lit("</title><lang>"), F.col("lang"),
        F.lit("</lang><size>"), F.size(toks).cast("string"),
        F.lit("</size></doc>"),
    )
    lines = docs.select(xml.alias("line"))
    return lines.mapInPandas(xml_transform_kernel, schema=XML_TRIPLES_DDL).select(
        *_TERM_COLS
    )


def rdf_xml_roundtrip(spark, sf_dir):
    """O9: serialize to the RDF/XML subset, parse back with the Arrow
    kernel — full-term lossless vs the independent DuckDB oracle."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    return rdfio.parse_rdfxml(rdfio.to_rdfxml(t)).select(*_TERM_COLS)


def kg_triples_full(spark, sf_dir):
    """The D3 full term model: (s, p, o, o_kind, o_lang, o_datatype)."""
    from .pipeline import run_pipeline_cached

    return run_pipeline_cached(spark, sf_dir).triples_full


_QUAD_COLS = ["g", "s", "p", "o", "o_kind", "o_lang", "o_datatype"]


def kg_quads_full(spark, sf_dir):
    """The D4 named-graph quad model: (g, s, p, o, o_kind, o_lang,
    o_datatype) — one row per distinct quad across doc graphs + root."""
    from .pipeline import run_pipeline_cached

    return run_pipeline_cached(spark, sf_dir).quads.select(*_QUAD_COLS)


def rdf_nquads_roundtrip(spark, sf_dir):
    """O11 graph-carrying round-trip: quads → N-Quads lines (graph IRI
    as the 4th term) → vectorized parse — lossless incl. the named
    graph, @lang tags and ^^datatypes; oracle is the independent DuckDB
    quad oracle."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    q = run_pipeline_cached(spark, sf_dir).quads
    return rdfio.parse_nquads(rdfio.to_nquads(q)).select(*_QUAD_COLS)


def rdf_trig_roundtrip(spark, sf_dir):
    """O11 TriG-subset round-trip: one `<g> {{ s p o . }}` block per
    line, Turtle term syntax — same lossless quad-level oracle."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    q = run_pipeline_cached(spark, sf_dir).quads
    return rdfio.parse_trig(rdfio.to_trig(q)).select(*_QUAD_COLS)


def kg_graph_counts(spark, sf_dir):
    """Named-graph cardinalities (D4): one row per doc graph + the
    proxy root graph."""
    from .pipeline import run_pipeline_cached

    return run_pipeline_cached(spark, sf_dir).quads.groupBy("g").agg(
        F.count("*").alias("n")
    )


def kg_entity_class(spark, sf_dir):
    """O25 rulebase-driven class selection per entity."""
    m, labels = _labels(spark, sf_dir)
    return gen.entity_classes(m, labels, members=_members(spark, sf_dir))


def kg_entity_props(spark, sf_dir):
    """O24 full D7 form: multi-predicate property selection via the
    broadcast PROPERTY_RULES table (priority + lang-pref window)."""
    m, labels = _labels(spark, sf_dir)
    return gen.entity_props(m, labels, members=_members(spark, sf_dir))


def kg_props_triples(spark, sf_dir):
    """The D7→D3 step: the property index rendered as proxy-graph
    triples (one lang-tagged/plain literal per entity per target
    predicate) — what a spindle-style generate stage would write for
    the property rulebase's winners."""
    m, labels = _labels(spark, sf_dir)
    props = gen.entity_props(m, labels, members=_members(spark, sf_dir))
    return props.select(
        F.col("entity_id").alias("s"),
        F.col("pred").alias("p"),
        F.col("value").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.col("value_lang").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )


def kg_entity_cooccurrence(spark, sf_dir):
    """Entity co-occurrence graph: canonical-entity pairs appearing in
    the same document, with document counts — the edge layer a
    downstream KG-analytics stage (centrality, relatedness) consumes.
    Scale shape: the self-join key is doc_id, so block size = entities
    per document (small and bounded by document length), never corpus-
    global; pairs are canonicalized (a < b) before the count groupBy
    (map-side combined)."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    doc_ents = (
        m.join(labels.withColumnRenamed("node", "norm_text"), "norm_text")
        .join(members.select("label", "entity_id").distinct(), "label")
        .select("doc_id", "entity_id")
        .distinct()
    )
    a = doc_ents.alias("a")
    b = doc_ents.alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.entity_id") < F.col("b.entity_id")),
        )
        .groupBy(
            F.col("a.entity_id").alias("entity_a"),
            F.col("b.entity_id").alias("entity_b"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


def _coocc_edges(spark, sf_dir):
    """Co-occurrence pairs in both orientations — the undirected edge
    frame the graph-analytics family (pagerank/triangles/kcore/LPA)
    shares."""
    pairs = kg_entity_cooccurrence(spark, sf_dir).select("entity_a", "entity_b")
    return pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )


def entity_kcore(spark, sf_dir):
    """Round-6b: 3-core membership over the entity co-occurrence graph
    — iterative peeling to a fixpoint (cc.kcore; the DuckDB oracle
    unrolls 8 rounds, ≥ the fixture's peeling depth, and the fixpoint
    makes the two identical once converged)."""
    return cc_mod.kcore(
        _coocc_edges(spark, sf_dir), k=3, node_col="entity_id"
    )


def entity_communities(spark, sf_dir):
    """Round-6b: deterministic synchronous label propagation (4 fixed
    rounds, most-frequent neighbor label, min-label tie-break) — the
    community-detection companion to entity_pagerank; round count is
    part of the operator definition, identical on both engines."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    nodes = members.select("entity_id").distinct()
    return cc_mod.label_propagation(
        _coocc_edges(spark, sf_dir), nodes, n_iter=4, node_col="entity_id"
    )


def kg_bgp_match(spark, sf_dir):
    """SPARQL BGP over the constructed graph (the store's query side):
    every Commerce-class entity with its label and score —
    {?e rdf:type ex:Commerce . ?e rdfs:label ?l . ?e ex:score ?n}
    compiled to filtered scans + equi-joins on the shared variable."""
    from .bgp import bgp_match
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return bgp_match(
        t,
        [
            ("?e", "rdf:type", "ex:Commerce"),
            ("?e", "rdfs:label", "?l"),
            ("?e", "ex:score", "?n"),
        ],
    )


def kg_bgp_optional(spark, sf_dir):
    """SPARQL OPTIONAL over the constructed graph: every document's
    language, with its media references when present — documents too
    short to carry a media span bind NULL (left-join semantics).
    {?d dc:language ?lang . OPTIONAL {?d ex:hasMedia ?media}}"""
    from .bgp import bgp_match
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return bgp_match(
        t,
        [("?d", "dc:language", "?lang")],
        optionals=[[("?d", "ex:hasMedia", "?media")]],
    )


def kg_entity_media(spark, sf_dir):
    """Per-entity license + representative media (spindle license.c /
    media.c analogue — round-3 verdict missing #4): rights and media
    kinds map through broadcast rule tables, one priority window per
    entity picks the winners; NULL media for entities whose documents
    carry no media span."""
    m, labels = _labels(spark, sf_dir)
    media = fixtures.media_spans_direct(spark, sf_dir).select(
        "doc_id", "media_ref"
    ).distinct()
    return gen.entity_media(
        m, labels, flat=None, members=_members(spark, sf_dir), media=media
    )


def kg_media_triples(spark, sf_dir):
    """D7→D3 rendering of the license/media selection: one ex:license
    triple per entity plus one ex:bestMedia triple when media exists —
    the proxy-graph form of kg_entity_media (same pattern as
    kg_props_triples)."""
    em = kg_entity_media(spark, sf_dir)
    lic = em.select(
        F.col("entity_id").alias("s"),
        F.lit(G.P_LICENSE).alias("p"),
        F.col("license").alias("o"),
    )
    med = em.filter(F.col("best_media").isNotNull()).select(
        F.col("entity_id").alias("s"),
        F.lit(G.P_BEST_MEDIA).alias("p"),
        F.col("best_media").alias("o"),
    )
    return lic.unionByName(med)


def kg_bgp_filter(spark, sf_dir):
    """SPARQL FILTER + SELECT DISTINCT over the constructed graph
    (round-3 verdict #2 — the first thing a store user writes after
    their first BGP): Commerce entities scoring ≥ 3 whose label starts
    a–m.  {?e rdf:type ex:Commerce . ?e rdfs:label ?l . ?e ex:score ?n
    FILTER(xsd:integer(?n) >= 3 && regex(?l, '^[a-m]'))} — the filters
    are plain column predicates, so Catalyst pushes each into the one
    pattern scan that binds its variable (plan-gated)."""
    from .bgp import bgp_match
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return bgp_match(
        t,
        [
            ("?e", "rdf:type", "ex:Commerce"),
            ("?e", "rdfs:label", "?l"),
            ("?e", "ex:score", "?n"),
        ],
        filters=["CAST(n AS INT) >= 3", "l rlike '^[a-m]'"],
        select=["e", "l", "n"],
        distinct=True,
    )


def kg_bgp_union(spark, sf_dir):
    """SPARQL UNION of BGP groups: Commerce entity labels ∪ document
    languages — branches bind DISJOINT variables, exercising the
    NULL-padding of the solution-mapping union (bag semantics)."""
    from .bgp import bgp_union
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return bgp_union(
        t,
        [
            {"patterns": [("?e", "rdf:type", "ex:Commerce"),
                          ("?e", "rdfs:label", "?l")]},
            {"patterns": [("?d", "dc:language", "?lang")]},
        ],
    )


def kg_sameas_closure(spark, sf_dir):
    """SPARQL property path ?x (owl:sameAs|^owl:sameAs)+ ?y — Spindle's
    coref closure reached from the query surface (round-3 verdict #3).
    Compiled onto the CC machinery (large-star/small-star, O(log n)
    rounds), NOT pair doubling; the DuckDB oracle re-derives the same
    relation with a recursive CTE over the undirected edge set.
    FILTER(?x < ?y) halves the symmetric output and drops the
    cycle-induced self-pairs."""
    from .bgp import bgp_match
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return bgp_match(
        t,
        [("?x", "(owl:sameAs|^owl:sameAs)+", "?y")],
        filters=["x < y"],
        select=["x", "y"],
    )


def kg_sparql_topk(spark, sf_dir):
    """The SPARQL TEXT front-end end-to-end (kgspark/sparql.py): a
    SELECT with FILTER + ORDER BY + LIMIT as a store consumer would
    write it, parsed and compiled onto bgp_match.  ORDER BY+LIMIT plan
    as TakeOrdered (per-partition top-k, no global sort); the ORDER BY
    key (?n DESC, ?l, ?e) is a total order so the LIMIT cut is
    deterministic on both engines."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT DISTINCT ?e ?l ?n WHERE {
          ?e rdf:type ex:Commerce .
          ?e rdfs:label ?l .
          ?e ex:score ?n .
          FILTER(xsd:integer(?n) >= 2)
        } ORDER BY DESC(?n) ?l ?e LIMIT 25
        """,
    )


def kg_sparql_construct(spark, sf_dir):
    """SPARQL CONSTRUCT through the text front-end: re-root Commerce
    entities under a summary vocabulary.  Output is a GRAPH (distinct
    s,p,o); one solution-set scan per template pattern, unioned —
    no joins beyond the WHERE group's own."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_construct

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_construct(
        t,
        """
        CONSTRUCT { ?e rdf:type ex:Summary .
                    ?e rdfs:label ?l .
                    ?e ex:score ?n }
        WHERE { ?e rdf:type ex:Commerce .
                ?e rdfs:label ?l .
                ?e ex:score ?n }
        """,
    )


def kg_sparql_groupby(spark, sf_dir):
    """SPARQL aggregation through the text front-end: per-class entity
    count + integer-exact score sum.  Plans as partial+final hash
    aggregate around one shuffle on the class variable (map-side
    combine); SUM casts to BIGINT so both engines aggregate exactly."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?t (COUNT(DISTINCT ?e) AS ?n) (SUM(?s) AS ?total)
        WHERE { ?e rdf:type ?t . ?e ex:score ?s }
        GROUP BY ?t
        """,
    )


def kg_sameas_degree(spark, sf_dir):
    """Closure DEGREE without materializing the closure: the number of
    nodes reachable from ?x over (owl:sameAs|^owl:sameAs)+ equals ?x's
    component size (self included — the 2-cycle makes (x,x) hold), so
    the query is a label-size aggregate joined back: LINEAR in nodes
    where the pair relation is Θ(Σ|component|²).  Measured reality at
    sf0.1: the coref graph's giant component makes the bare closure
    171.6 M pairs while this degree view is 28.6 k rows — THE
    scale-correct form of a closure query feeding an aggregate."""
    from .bgp import symmetric_closure_pairs  # noqa: F401 (same relation)
    from .pipeline import run_pipeline_cached
    from . import cc as cc_mod

    t = run_pipeline_cached(spark, sf_dir).triples
    e = t.filter(F.col("p") == "owl:sameAs").select(
        F.col("s").alias("norm_a"), F.col("o").alias("norm_b")
    )
    nodes = (
        e.select(F.col("norm_a").alias("node"))
        .unionByName(e.select(F.col("norm_b").alias("node")))
        .distinct()
    )
    labels = cc_mod.connected_components(e, nodes)
    # component size via ONE window over the label key — the old
    # groupBy + join-back shape paid a second exchange for the same
    # partitioning (guide §2.4: two operations keyed the same way
    # share one exchange)
    w = Window.partitionBy("label")
    return labels.select(
        F.col("node").alias("x"),
        F.count("*").over(w).cast("bigint").alias("n_reach"),
    )


def kg_sparql_lang(spark, sf_dir):
    """SPARQL LANG() filter over the full-term model: English-tagged
    labels only — the language tag rides as a hidden column of the
    object binding and never surfaces in the result."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        'SELECT ?e ?l WHERE { ?e rdfs:label ?l . FILTER(LANG(?l) = "en") }',
    )


def kg_sparql_graph(spark, sf_dir):
    """SPARQL GRAPH clause over the quad store (D4): per-named-graph
    mention-edge counts — the graph name binds as a variable and the
    count is a GROUP BY aggregate, all through the text front-end."""
    from .sparql import sparql_select

    q = kg_quads_full(spark, sf_dir)
    return sparql_select(
        q,
        """
        SELECT ?g (COUNT(*) AS ?n)
        WHERE { GRAPH ?g { ?d ex:mentions ?m } }
        GROUP BY ?g
        """,
    )


def kg_predicate_counts(spark, sf_dir):
    from .pipeline import run_pipeline_cached

    return run_pipeline_cached(spark, sf_dir).triples.groupBy("p").agg(
        F.count("*").alias("n")
    )


def revenue_rollup(spark, sf_dir):
    """ROLLUP (l_returnflag, l_linestatus) with coalesced subtotal labels
    so the grouping-set rows hash identically across engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("rev_e6", e6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("rev_e6").alias("revenue_e6"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue_e6",
            "n",
        )
    )


def revenue_cube(spark, sf_dir):
    """CUBE (l_returnflag, l_linestatus): all four grouping sets, with
    coalesced subtotal labels so rows hash identically across engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("rev_e6", e6(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum("rev_e6").alias("revenue_e6"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue_e6",
            "n",
        )
    )


def nation_intersect(spark, sf_dir):
    """INTERSECT set op: nations having BOTH customers and suppliers."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


def event_value_percentiles(spark, sf_dir):
    """Exact grouped percentiles (p25/p50/p75) of the event value per
    type.  Linear interpolation computed in EXACT int64 arithmetic on
    both engines (round-3 ADVICE): for quartile k the target position
    is (n-1)*k quarter-units, so with lo = that DIV 4 and r = that % 4
    the interpolated value is (v[lo]*(4-r) + v[lo+1]*r) DIV 4 — no
    floating interpolation whose last-ulp differences between Spark's
    percentile() and DuckDB's quantile_cont could flip a floor() at
    integer grid points.  v_e6 ≥ 0 so DIV (trunc) == floor on both."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", e6(F.col("value")).alias("v_e6")
    )
    w = Window.partitionBy("event_type").orderBy("v_e6")
    ranked = ev.withColumn("i", F.row_number().over(w) - 1).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    def pct(k, name):
        q = f"((n-1)*{k})"
        return F.expr(
            f"CAST(sum(CASE WHEN i = {q} DIV 4 THEN v_e6 * (4 - {q} % 4) "
            f"WHEN i = {q} DIV 4 + 1 THEN v_e6 * ({q} % 4) "
            f"ELSE 0 END) DIV 4 AS BIGINT)"
        ).alias(name)
    return ranked.groupBy("event_type").agg(
        pct(1, "p25_e6"), pct(2, "p50_e6"), pct(3, "p75_e6")
    )


def event_asof_join(spark, sf_dir):
    """AS-OF JOIN (task-brief custom operator): each purchase
    attributed to the user's most recent click at ts' <= ts.

    Scale shape: implemented as UNION + WINDOW, not a join — both
    sides land in one frame partitioned by user, and a running
    struct-max over a RANGE frame (all peers of the current timestamp
    included) yields the latest preceding click.  No per-key pair
    enumeration, no skew blowup on hot users, one shuffle on user_id;
    this is the as-of pattern that survives 10^12 rows where a
    ts-inequality join explodes.  Tie-break is the lexicographic
    struct max on (ts, event_id) — deterministic on every engine."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    best = F.max(
        F.when(
            F.col("event_type") == "click", F.struct("ts_us", "event_id")
        )
    ).over(w)
    return (
        ev.withColumn("best", best)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("best.event_id").alias("click_id"),
            F.col("best.ts_us").alias("click_ts_us"),
        )
    )


def event_range_join(spark, sf_dir):
    """Banded RANGE (interval) join: for each error event, how many
    non-error events across ALL users fall within ±60 s of it.

    Scale shape: a raw ts-inequality join is a cross product; instead
    both sides bucket to the 60 s grid and the join key is the BUCKET —
    each error probes its own bucket ± 1 (a 3-element explode on the
    small side), then the exact |Δts| predicate verifies inside the
    equi-join.  Work is O(rows × band density), shuffle is a plain
    hash join on an integer key — the banded-join trick that keeps an
    interval join alive at 10^12 rows."""
    _ensure_utc(spark)
    band_us = 60_000_000
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts_us").alias("err_ts_us"),
        F.floor(F.col("ts_us") / band_us).alias("bucket"),
    )
    probes = err.select(
        "err_id",
        "err_ts_us",
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("b"),
    )
    other = ev.filter(F.col("event_type") != "error").select(
        F.col("ts_us").alias("o_ts_us"),
        F.floor(F.col("ts_us") / band_us).alias("b"),
    )
    counts = (
        probes.join(other, "b")
        .filter(F.abs(F.col("o_ts_us") - F.col("err_ts_us")) <= band_us)
        .groupBy("err_id")
        .agg(F.count("*").alias("n_nearby"))
    )
    return err.select("err_id").join(counts, "err_id", "left").select(
        "err_id", F.coalesce("n_nearby", F.lit(0)).alias("n_nearby")
    )


def event_hypertable_rollup(spark, sf_dir):
    """Hypertable rollup (task-brief custom operator): minute → hour →
    day continuous aggregates per event type, where each level
    RE-AGGREGATES the level below (sum/count/max are associative), not
    the raw rows — the TimescaleDB continuous-aggregate maintenance
    pattern.  At 10^12 rows the raw table is touched once (minute
    level); hour reads |minutes| rows and day reads |hours| — the
    rollup tree's total cost is ~1 raw scan regardless of depth."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        e6(F.col("value")).alias("v_e6"),
    )
    minute = (
        ev.withColumn("bucket", F.floor(F.col("ts_us") / 60_000_000))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("v_e6").alias("sum_e6"),
            F.max("v_e6").alias("max_e6"),
        )
    )
    def up(lower, fan):
        return (
            lower.withColumn("bucket", F.floor(F.col("bucket") / fan))
            .groupBy("event_type", "bucket")
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_e6").alias("sum_e6"),
                F.max("max_e6").alias("max_e6"),
            )
        )
    hour = up(minute, 60)
    day = up(hour, 24)
    def lvl(df, name):
        return df.select(
            F.lit(name).alias("level"), "event_type", "bucket",
            "n", "sum_e6", "max_e6",
        )
    return (
        lvl(minute, "minute")
        .unionByName(lvl(hour, "hour"))
        .unionByName(lvl(day, "day"))
    )


def event_value_pivot(spark, sf_dir):
    """Pivot-style conditional aggregation: per user, summed value for
    the two lexicographically-first event types."""
    ev = _t(spark, sf_dir, "events")
    # limit(2) INSIDE the plan (matches events_isin_counts /
    # tpch_q3_topk): the driver receives exactly 2 rows no matter how
    # many distinct event types exist — round-3 verdict #2.
    types = sorted(
        r[0]
        for r in ev.select("event_type").distinct()
        .orderBy("event_type").limit(2).collect()
    )
    t0, t1 = types
    vale6 = e6(F.col("value"))
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == t0, vale6).otherwise(F.lit(0))).alias("v0_e6"),
        F.sum(F.when(F.col("event_type") == t1, vale6).otherwise(F.lit(0))).alias("v1_e6"),
    )


def event_sessions(spark, sf_dir):
    """Sessionization: per user, a new session starts after a >30-min
    gap; session_id = running count of session starts (O29 lag+cumsum)."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1000000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_sess = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    return (
        ev.withColumn("_new", new_sess)
        .withColumn(
            "session_id",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
        )
        .select("user_id", "event_id", "session_id")
    )


def kg_sparql_path_seq(spark, sf_dir):
    """SPARQL sequence property path through the text front-end (r5):
    ``?d ex:mentions/^owl:sameAs/rdfs:label ?l`` — doc → mentioned
    source proxy → (INVERSE sameAs) canonical entity → label, in ONE
    pattern.  The sequence compiles to a chain of equi-joins on the
    intermediate nodes (the spec's fresh-variable translation,
    bgp._path_frame) with the inverse step a free column swap;
    constants stay pushed down, no closure materialization involved."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        "SELECT DISTINCT ?d ?l WHERE "
        "{ ?d ex:mentions/^owl:sameAs/rdfs:label ?l }",
    )


def kg_sparql_path_star(spark, sf_dir):
    """SPARQL zero-or-more path (r5): ``?x owl:sameAs* ?y`` — each
    Commerce entity with every scored node reachable over DIRECTED
    sameAs edges, incl. itself (ZeroLengthPath).  The star frame is the
    doubling closure ∪ the identity over all graph terms
    (bgp._step_frame); the DuckDB oracle re-derives it with a recursive
    CTE ∪ identity.  Closure materialization rides under the
    MAX_CLOSURE_PAIRS guard."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT DISTINCT ?x ?y WHERE {
          ?x rdf:type ex:Commerce .
          ?x owl:sameAs* ?y .
          ?y ex:score ?n
        }
        """,
    )


def kg_sparql_subquery(spark, sf_dir):
    """SPARQL subquery (r5): ``{ SELECT … GROUP BY … }`` nested inside
    the WHERE group — entities whose class has at least 100 instances.
    The subquery aggregates once (partial+final hash aggregate), joins
    back on the shared ?t variable, and the outer FILTER references the
    subquery-bound count."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT DISTINCT ?e ?t WHERE {
          ?e rdf:type ?t
          { SELECT ?t (COUNT(*) AS ?n) WHERE { ?x rdf:type ?t } GROUP BY ?t }
          FILTER(?n >= 100)
        }
        """,
    )


def kg_sparql_union_nested(spark, sf_dir):
    """SPARQL nested-group UNION (r5): ``{ {A} UNION {B} . pattern }``
    — the union INSIDE a group, joined against a further pattern on the
    shared variable (round-4 parser only allowed top-level UNION)."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT DISTINCT ?e ?t ?v WHERE {
          { ?e rdfs:label ?v } UNION { ?e dc:language ?v } .
          ?e rdf:type ?t
        }
        """,
    )


def kg_sparql_avg(spark, sf_dir):
    """SPARQL AVG through the text front-end (r5; round-4 verdict #6):
    per-class mean score.  AVG is defined as exact-BIGINT SUM / COUNT
    divided in DOUBLE — the same two exact integers divide on both
    engines, so the IEEE-754 quotient is bit-identical; the registry
    surface bridges it to floor(1e6·x) BIGINT like every float
    output."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    out = sparql_select(
        t,
        """
        SELECT ?t (AVG(?s) AS ?avg_score)
        WHERE { ?e rdf:type ?t . ?e ex:score ?s }
        GROUP BY ?t
        """,
    )
    return out.select(
        "t",
        F.floor(F.lit(1e6) * F.col("avg_score")).cast("bigint").alias("avg_e6"),
    )


def rdf_turtle_doc_roundtrip(spark, sf_dir):
    """Round-5: the DOCUMENT-level Turtle grammar end-to-end — the full
    triple set serialized by to_turtle, sharded into 16 multi-statement
    documents each carrying an explicit @prefix header, then re-parsed
    by the document parser (mapInPandas; @prefix expansion → canonical
    compaction).  Lossless ⇒ equals the independent triple oracle.
    Grouping is collect_list per shard — bounded by shard count, all
    distributed."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    header = "".join(
        f"@prefix {p} <{full}> .\n" for p, full in sorted(rdfio.PREFIXES.items())
    )
    docs = (
        rdfio.to_turtle(t)
        .withColumn("shard", F.pmod(F.xxhash64("line"), F.lit(16)))
        .groupBy("shard")
        .agg(
            F.concat(
                F.lit(header), F.concat_ws("\n", F.collect_list("line"))
            ).alias("text")
        )
    )
    return rdfio.parse_turtle_docs(docs).select(*_TERM_COLS).distinct()


def rdf_jsonld_expanded_roundtrip(spark, sf_dir):
    """Round-5: the JSON-LD EXPANDED-document profile — the NDJSON
    writer's node objects wrapped into 16 array documents, re-parsed by
    the expanded-document parser.  Lossless ⇒ equals the triple
    oracle."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    docs = (
        rdfio.to_jsonld(t)
        .withColumn("shard", F.pmod(F.xxhash64("line"), F.lit(16)))
        .groupBy("shard")
        .agg(
            F.concat(
                F.lit("["), F.concat_ws(",\n", F.collect_list("line")),
                F.lit("]"),
            ).alias("text")
        )
    )
    return rdfio.parse_jsonld_expanded(docs).select(*_TERM_COLS).distinct()


def kg_sparql_optional_filter(spark, sf_dir):
    """Round-5: the OPTIONAL-with-body-FILTER idiom — the FILTER
    belongs to the OPTIONAL group (non-matching rows KEEP their outer
    binding with NULL, they are not removed), then COALESCE defaults
    the unbound variable.  Exercises full group bodies inside OPTIONAL
    plus BOUND/COALESCE at the driver gate."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT DISTINCT ?e ?sc WHERE {
          ?e rdf:type ex:Commerce .
          OPTIONAL { ?e ex:score ?n FILTER(xsd:integer(?n) >= 3) }
          BIND(COALESCE(?n, "none") AS ?sc)
        }
        """,
    )


def kg_sparql_group_concat(spark, sf_dir):
    """Round-5: GROUP_CONCAT with explicit separator + SAMPLE — per
    Commerce entity, the sorted '|'-joined list of its scores and one
    deterministic sample.  GROUP_CONCAT sorts the collected values
    before joining (the spec leaves order open; sorting makes it
    engine-deterministic, matched by the oracle's ORDER BY inside
    string_agg); SAMPLE = MIN, a valid arbitrary-value choice."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?e (GROUP_CONCAT(?n ; SEPARATOR "|") AS ?scores)
               (SAMPLE(?n) AS ?one)
        WHERE { ?e rdf:type ex:Commerce . ?e ex:score ?n }
        GROUP BY ?e
        """,
    )


def contamination_check(spark, sf_dir):
    """Round-5 training-pipeline op: per-train-document count of
    3-gram codes shared with the (deterministic stand-in) eval corpus,
    flagged at >= 8 — the benchmark-leak detector.  Broadcast eval
    code set; see dedup.contamination_flags for the 100 TB shape."""
    from . import dedup as D

    return D.contamination_flags(_t(spark, sf_dir, "documents"))


def entity_pagerank(spark, sf_dir, n_iter: int = 5):
    """Round-5: PageRank over the entity co-occurrence graph — the
    KG-analytics centrality a store consumer derives from the edge
    layer.  INTEGER-EXACT variant: scores live in µ-units (start
    1_000_000), each iteration is

        score' = 150_000 + (17 · Σ_in (score div outdeg)) div 20

    i.e. damping 0.85 = 17/20 and the per-edge contribution uses
    integer division — additions of BIGINTs are order-independent, so
    the result is bit-identical on any engine / any partitioning
    (cross-engine float summation is not; the DuckDB oracle unrolls
    the same 5 iterations as CTEs).  Scale shape: each iteration is
    one edge join + one map-side-combined aggregate — O(E) per round,
    the same plan family as the CC loop."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    nodes = members.select("entity_id").distinct()
    return cc_mod.pagerank_int(
        _coocc_edges(spark, sf_dir), nodes, n_iter=n_iter, node_col="entity_id"
    ).withColumnRenamed("node", "entity_id")


def entity_triangle_counts(spark, sf_dir):
    """Round-5: per-entity TRIANGLE participation over the
    co-occurrence graph — the clustering-signal companion to
    entity_pagerank.  Triangles enumerate over ORDERED edges (a<b<c):
    each triangle appears exactly once in the 3-way equi-join, then
    fans out to its three corners for the per-entity count (map-side
    combined).  Ordered-edge enumeration is the standard O(E^{3/2})
    shape — no node ever joins its full neighborhood twice."""
    pairs = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
        .localCheckpoint(eager=False)
    )
    ab = pairs.select(F.col("entity_a").alias("a"), F.col("entity_b").alias("b"))
    bc = pairs.select(F.col("entity_a").alias("b"), F.col("entity_b").alias("c"))
    ac = pairs.select(F.col("entity_a").alias("a"), F.col("entity_b").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("entity_id"))
        .unionByName(tri.select(F.col("b").alias("entity_id")))
        .unionByName(tri.select(F.col("c").alias("entity_id")))
    )
    return corners.groupBy("entity_id").agg(
        F.count("*").alias("n_triangles")
    )


def entity_link_prediction(spark, sf_dir):
    """Round-6: common-neighbor LINK PREDICTION over the entity
    co-occurrence graph — for every non-adjacent pair (a < b) sharing
    >= 2 neighbors, the common-neighbor count (the classic
    integer-exact link-prediction score; Adamic-Adar's 1/log weights
    are floats and cross-engine-fragile, so the contract sticks to
    counts).  Wedge enumeration joins the bidirectional edge frame on
    the hinge node, with HUB hinges (degree > 64) excluded — a hub's
    wedge fan-out is quadratic in its degree while its common-neighbor
    evidence is uninformative (everything co-occurs with it), so the
    cap is both the web-scale guard and standard LP practice: the
    enumeration becomes O(V * cap^2) instead of O(sum deg^2).  One
    anti-join then removes already-connected pairs."""
    HINGE_CAP = 64
    pairs = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    edges = (
        edges.join(deg, "src").filter(F.col("_deg") <= HINGE_CAP).drop("_deg")
    )
    w1 = edges.select(F.col("src").alias("hinge"), F.col("dst").alias("a"))
    w2 = edges.select(F.col("src").alias("hinge"), F.col("dst").alias("b"))
    cand = (
        w1.join(w2, "hinge")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("cn"))
        .filter(F.col("cn") >= 2)
    )
    return (
        cand.join(
            pairs,
            (cand["a"] == pairs["entity_a"]) & (cand["b"] == pairs["entity_b"]),
            "left_anti",
        )
        .select(
            F.col("a").alias("entity_a"),
            F.col("b").alias("entity_b"),
            "cn",
        )
    )


def training_export_clean(spark, sf_dir):
    """Round-5: training_export WITH the contamination gate — the full
    end-of-pipeline decision: quality → langid → near-dup keeper →
    benchmark-leak exclusion (eval docs AND documents sharing ≥8
    3-gram codes with the eval corpus are dropped) → split → pack.
    One composed DuckDB oracle (derived from TRAINING_EXPORT_SQL with
    the contamination CTEs spliced into the kept set)."""
    from . import dedup as D
    from .curate import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    kept = curate_corpus(spark, docs).filter(F.col("keep") == 1).select("doc_id")
    clean = (
        D.contamination_flags(docs)
        .filter(~F.col("flagged"))
        .select("doc_id")
    )
    return _pack_assign(docs.join(kept, "doc_id").join(clean, "doc_id"))


def doc_quota_sample(spark, sf_dir, k: int = 10):
    """Round-5 curation op: BALANCED subcorpus selection — per
    (lang, source) stratum, keep exactly the k lowest-HASH documents
    (hash family index 3), so the sample is deterministic, add-only
    stable (a new doc displaces at most one slot in its own stratum)
    and source-balanced regardless of stratum skew.  The rn ≤ k filter
    plans as WindowGroupLimit — per-partition top-k, no global sort."""
    docs = _t(spark, sf_dir, "documents")
    h = (F.lit(G.hash_a(3)) * F.col("doc_id") + F.lit(G.hash_b(3))) % F.lit(G.HASH_P)
    w = Window.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("doc_id", "lang", "source", F.col("rn").cast("int").alias("rn"))
    )


def dedup_rate_by_source(spark, sf_dir):
    """Round-5 pipeline-observability metric: per SOURCE, document
    count, near-dup drop count (cluster members that are not their
    cluster's keeper), and the drop rate as floor(1e6·x) — the number
    an operator watches to catch a crawler feeding duplicate shards.
    One broadcast-sized join of the keeper decision back to the doc
    dimension + a map-side-combined per-source aggregate."""
    from . import dedup as D

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    keep = D.dedup_clusters(_t(spark, sf_dir, "documents"), jaccard_min=0.01)
    joined = docs.join(keep, "doc_id", "left")
    dropped = F.when(
        F.col("keep_doc_id").isNotNull()
        & (F.col("keep_doc_id") != F.col("doc_id")),
        1,
    ).otherwise(0)
    return (
        joined.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(dropped).cast("bigint").alias("n_dropped"),
        )
        .select(
            "source", "n_docs", "n_dropped",
            F.floor(
                F.lit(1e6) * F.col("n_dropped").cast("double")
                / F.col("n_docs").cast("double")
            ).cast("bigint").alias("drop_rate_e6"),
        )
    )


def kg_sparql_update(spark, sf_dir):
    """SPARQL UPDATE verbs (round-6, O5/O6 write path): build a store
    from the nation table (one named graph per region), run one
    ';'-chained update request exercising all four verbs — CLEAR
    GRAPH, DELETE WHERE (implicit per-graph pattern), DELETE DATA
    (GRAPH form), INSERT DATA (default-graph + GRAPH forms) — under a
    single writer lock, then read the end state back.  The oracle
    recomputes pre-state ± delta in DuckDB."""
    import tempfile

    from . import rdfio
    from .sparql import store_update

    nat = _t(spark, sf_dir, "nation")
    quads = nat.select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    store = tempfile.mkdtemp(prefix="kgspark_upd_")
    rdfio.write_nquads_store(quads, store)
    store_update(spark, store, '''
        CLEAR GRAPH ex:reg0 ;
        DELETE WHERE { ?s ex:name "CHINA" } ;
        DELETE DATA { GRAPH ex:reg1 { ex:nat1 ex:name "ARGENTINA" } } ;
        INSERT DATA {
          ex:extra ex:name "ATLANTIS" .
          GRAPH ex:reg9 { ex:nat99 ex:flag ex:new }
        }
    ''')
    return rdfio.read_nquads_store(spark, store).select("g", "s", "p", "o")


def _pii_augmented(docs):
    """Deterministic PII-bearing text: the fixture corpus is PII-free
    word soup, so docs with doc_id % 3 != 0 get a contact fragment
    derived from doc_id (grammar.PII_RULES docstring; the oracle builds
    the identical string in SQL) — email + phone + 8-digit id."""
    frag = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com call 555-"),
        F.lpad(((F.col("doc_id") * 37) % 10000).cast("string"), 4, "0"),
        F.lit(" ref "),
        (F.col("doc_id") * 13 + 10000000).cast("string"),
    )
    return F.when(F.col("doc_id") % 3 != 0, frag).otherwise(F.col("text"))


def pii_scrub(spark, sf_dir):
    """PII redaction (round-6 curation operator): sequential
    regexp_replace chain over grammar.PII_RULES + per-rule match
    counts — native expressions only, no shuffle (a pure per-document
    map, linear at any corpus size)."""
    from . import curation

    docs = _t(spark, sf_dir, "documents")
    df = docs.select("doc_id", _pii_augmented(docs).alias("aug_text"))
    out = curation.scrub_pii(df, "aug_text")
    return out.select(
        "doc_id", "clean_text", "n_email", "n_phone", "n_idnum", "n_pii"
    )


def pii_rate_by_source(spark, sf_dir):
    """Per-source PII filter-rate metric (curation observability): one
    map-side-combinable aggregate over the scrubbed corpus."""
    from . import curation

    docs = _t(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id", "source", _pii_augmented(docs).alias("aug_text")
    )
    return curation.pii_rate_by_source(df, "aug_text")


def doc_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality (round 6b): per-doc top-token /
    duplicate-bigram mass in e6 fixed-point + the grammar-thresholded
    flag — the repetition-removal signal of an LLM curation pipeline."""
    from . import curation

    return curation.repetition_stats(_t(spark, sf_dir, "documents"))


def boilerplate_rate(spark, sf_dir):
    """Corpus-level EXACT paragraph dedup (round 6b, C4-style
    boilerplate removal).  The soup corpus never repeats a 12-token
    window across documents, so docs with doc_id % 3 != 1 get
    grammar.BOILER_TEXT prepended (one full paragraph window) — those
    documents must come back with n_boiler >= 1, the rest 0."""
    from . import curation
    from . import grammar as G

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id", "lang", "source",
        F.when(
            F.col("doc_id") % 3 != 1,
            F.concat(F.lit(G.BOILER_TEXT + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return curation.line_dup_stats(aug)


def para_dedup(spark, sf_dir):
    """Paragraph-granularity near-dup pairs (boilerplate removal,
    round 6): deterministic token-window paragraphs → composite-keyed
    minhash-LSH (the document machinery, unchanged) → cross-document
    paragraph pairs with exact shingle Jaccard."""
    from . import dedup as D

    pairs = D.para_minhash_pairs(_t(spark, sf_dir, "documents"))
    return pairs.select(
        "doc_a", "para_a", "doc_b", "para_b",
        e6(F.col("jaccard")).alias("jaccard_e6"),
    )


def rdf_jsonld_compacted_roundtrip(spark, sf_dir):
    """Round-6: the JSON-LD COMPACTED profile — prefixed-name node
    objects under an inline @context prefix map (the shape real-world
    JSON-LD overwhelmingly ships in), wrapped into 16 @graph documents
    and re-parsed with full context expansion.  Lossless ⇒ equals the
    triple oracle."""
    from . import rdfio
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples_full
    ctx = rdfio.jsonld_context_json()
    docs = (
        rdfio.to_jsonld_compacted(t)
        .withColumn("shard", F.pmod(F.xxhash64("line"), F.lit(16)))
        .groupBy("shard")
        .agg(
            F.concat(
                F.lit('{"@context": ' + ctx + ', "@graph": ['),
                F.concat_ws(",\n", F.collect_list("line")),
                F.lit("]}"),
            ).alias("text")
        )
    )
    return rdfio.parse_jsonld_compacted(docs).select(*_TERM_COLS).distinct()


def kg_sparql_select_expr(spark, sf_dir):
    """Round-6: (expr AS ?v) SELECT projections and expression ORDER BY
    keys through the text front-end — label lengths and a score
    arithmetic column, longest-label-first with a total tie-break so
    the LIMIT cut is engine-deterministic."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?e ?l (STRLEN(?l) AS ?len) (xsd:integer(?n) * 2 AS ?n2)
        WHERE { ?e rdfs:label ?l . ?e ex:score ?n }
        ORDER BY DESC(STRLEN(?l)) ?e ?l (xsd:integer(?n)) LIMIT 30
        """,
    )


def kg_sparql_optional_exists(spark, sf_dir):
    """Round-6 (ADVICE #1): EXISTS over an OPTIONAL-unbound shared
    variable — compatible-solution semantics.  The OPTIONAL body keeps
    only labels starting with "c", so ?l is UNBOUND for the rest; an
    unbound shared variable is compatible-with-anything, so those rows
    survive the EXISTS iff the group is (anywhere) non-empty — the
    plain equi-semi-join used to silently drop them.  Bound ?l rows
    survive iff that exact label occurs (trivially true), keeping both
    row shapes in the result."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?x ?l WHERE {
          ?x rdf:type ex:Commerce .
          OPTIONAL { ?x rdfs:label ?l . FILTER(STRSTARTS(?l, "c")) }
          FILTER EXISTS { ?e rdfs:label ?l }
        }
        """,
    )


def kg_sparql_builtins(spark, sf_dir):
    """Round-6: the expanded scalar-builtin surface in one query —
    nested same-shape translation (CONCAT(UCASE(SUBSTR(…)), …)), IF,
    STRLEN, MD5, ABS and FLOOR over xsd:integer casts.  ORDER BY
    (?e, ?l, score) is total over the distinct triple rows, so the
    LIMIT cut is engine-deterministic."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?e ?l (CONCAT(UCASE(SUBSTR(?l, 1, 1)), SUBSTR(?l, 2)) AS ?cap)
               (IF(STRLEN(?l) >= 6, "long", "short") AS ?sz)
               (MD5(?l) AS ?h)
               (ABS(xsd:integer(?n) - 50) AS ?dist)
               (FLOOR(xsd:integer(?n) / 7) AS ?bucket)
        WHERE { ?e rdfs:label ?l . ?e ex:score ?n }
        ORDER BY ?e ?l (xsd:integer(?n)) LIMIT 40
        """,
    )


def kg_sparql_term_fns(spark, sf_dir):
    """Round-6: term-inspection builtins over the full-term model —
    isIRI rides the hidden __kind_ carrier the way LANG rides __lang_;
    LANGMATCHES does case-insensitive basic range filtering.  Counts
    per predicate of objects that are IRIs or English-tagged
    literals."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        """
        SELECT ?p (COUNT(*) AS ?n)
        WHERE { ?s ?p ?o
                FILTER(isIRI(?o) || LANGMATCHES(LANG(?o), "en")) }
        GROUP BY ?p ORDER BY ?p
        """,
    )


def kg_sparql_construct_where(spark, sf_dir):
    """Round-6: the CONSTRUCT WHERE { … } shorthand (SPARQL 1.1
    §10.2.2) — the BGP is its own template; result is the distinct
    (s, p, o) union of both pattern instantiations."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_construct

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_construct(
        t, "CONSTRUCT WHERE { ?e rdfs:label ?l . ?e ex:score ?n }"
    )


def kg_sparql_load(spark, sf_dir):
    """Round-6: the LOAD verb (SPARQL 1.1 Update §3.1.4 — Twine's
    file-inject path on the text surface).  The engine serializes the
    nation table as an N-Triples dataset DIRECTORY (so the load-back
    is a distributed multi-file scan, the 100 TB shape), then LOADs it
    into a named graph of a seeded store and reads the end state."""
    import tempfile

    from . import rdfio
    from .sparql import store_update

    nat = _t(spark, sf_dir, "nation")
    triples = nat.select(
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    base = tempfile.mkdtemp(prefix="kgspark_load_")
    src = f"{base}/nations.nt"
    rdfio.to_ntriples(triples).write.mode("overwrite").text(src)
    store = f"{base}/store"
    store_update(spark, store, f'''
        INSERT DATA {{ ex:seed ex:p ex:q }} ;
        LOAD <file://{src}> INTO GRAPH ex:loaded
    ''')
    return rdfio.read_nquads_store(spark, store).select("g", "s", "p", "o")


def kg_sparql_from(spark, sf_dir):
    """Round-6: FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2)
    on the store surface.  The store holds one graph per region; the
    query's dataset makes regions 1+2 the merged default graph and
    region 3 the only GRAPH-visible named graph.  Each side of the
    dataset is a partition-PRUNED read of only its graphs'
    directories — at 100 TB the dataset clause is what turns a
    whole-store scan into a few-directory scan."""
    import tempfile

    from . import rdfio
    from .sparql import store_sparql

    nat = _t(spark, sf_dir, "nation")
    quads = nat.select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    store = tempfile.mkdtemp(prefix="kgspark_from_")
    rdfio.write_nquads_store(quads, store)
    out = store_sparql(spark, store, """
        SELECT ?g ?s ?o
        FROM ex:reg1
        FROM ex:reg2
        FROM NAMED ex:reg3
        WHERE { { ?s ex:name ?o } UNION { GRAPH ?g { ?s ex:name ?o } } }
    """)
    return out.select(
        F.coalesce(F.col("g"), F.lit("")).alias("g"), "s", "o"
    )


def kg_sparql_modify(spark, sf_dir):
    """Round-6: the general DELETE/INSERT…WHERE modify form.  WHERE
    matches over the MERGED default graph (all regions' names starting
    with "C"), the DELETE template strips those names from graph
    ex:reg1 only, and the INSERT template writes the lower-cased form
    into ex:reg1 for EVERY solution (template instantiation is
    graph-independent, per spec) — the oracle recomputes
    (pre-state − dels) ∪ ins in SQL."""
    import tempfile

    from . import rdfio
    from .sparql import store_update

    nat = _t(spark, sf_dir, "nation")
    quads = nat.select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    store = tempfile.mkdtemp(prefix="kgspark_mod_")
    rdfio.write_nquads_store(quads, store)
    store_update(spark, store, '''
        DELETE { GRAPH ex:reg1 { ?s ex:name ?o } }
        INSERT { GRAPH ex:reg1 { ?s ex:lname ?u } }
        WHERE { ?s ex:name ?o . FILTER(STRSTARTS(?o, "C")) .
                BIND(LCASE(?o) AS ?u) }
    ''')
    return rdfio.read_nquads_store(spark, store).select("g", "s", "p", "o")


def entity_hops(spark, sf_dir):
    """Round-6: multi-source BFS hop distance (4 fixed rounds) over
    the entity co-occurrence graph from a deterministic seed set
    (first hex digit of the minted id hash ∈ {0, 1} — entity ids are
    IRI strings 'ex://entity/<32hex>#id') — the graph-exploration
    companion to
    pagerank/k-core/LPA (cc.bfs_hops: frontier semi-join + settled
    anti-join per round; the DuckDB oracle unrolls the same 4
    rounds, so horizon truncation is identical)."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    nodes = members.select("entity_id").distinct()
    seeds = nodes.filter(
        F.substring("entity_id", 13, 1).isin("0", "1")
    )
    return cc_mod.bfs_hops(
        _coocc_edges(spark, sf_dir), seeds, n_rounds=4, node_col="entity_id"
    )


def doc_resample(spark, sf_dir):
    """Round-6: deterministic source-weighted corpus resampling — the
    mixture-reweighting stage of a training-data pipeline (up-sample
    valuable sources, down-sample the rest) with NO randomness:
    weight_e6 = 500k + (srcnum % 4)·500k ∈ {0.5, 1, 1.5, 2}×; integer
    copies = weight div 1e6; the fractional copy decided per doc by
    the grammar affine hash (family index 200 — clear of the
    minhash/simhash perm range 0..127).  One
    output row per emitted copy — explode(sequence) keeps the blow-up
    vectorized and bounded by the weight table, and the whole stage
    is map-only (zero shuffle) at any scale."""
    a, b = G.hash_a(200), G.hash_b(200)
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "500000 + (CAST(substring(source, 4) AS BIGINT) % 4) * 500000"
        ).alias("w_e6"),
        F.expr(f"(({a} * doc_id + {b}) % {G.HASH_P}) % 1000000").alias("h"),
    ).select(
        "doc_id",
        "source",
        "w_e6",
        F.expr("w_e6 DIV 1000000 + IF(h < w_e6 % 1000000, 1, 0)").alias(
            "n_copies"
        ),
    ).filter(F.col("n_copies") > 0)
    return docs.select(
        "doc_id",
        "source",
        F.col("w_e6").cast("bigint").alias("weight_e6"),
        F.explode(F.expr("sequence(1, n_copies)")).alias("copy_id"),
    ).withColumn("copy_id", F.col("copy_id").cast("int"))


def doc_bigram_surprisal(spark, sf_dir):
    """Round-6: corpus-trained bigram surprisal — an integer-exact
    perplexity proxy for quality filtering.  Per-bigram surprisal =
    bitlen(prefix_count div bigram_count) ≈ log2 of the inverse
    conditional probability (the same log2-quantized-idf trick as
    top_terms_tfidf — a float ln() would flap across engines); the
    doc score is the exact integer mean ×1e6.  Scale shape: per-doc
    bigram counts FIRST (map-side combine slims every later shuffle),
    corpus counts derived from those (never re-reads text), then two
    shuffle joins on the open-vocabulary bigram key — no broadcast,
    no Python, no arrays carried through any join."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("toks"),
    )
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "arrays_zip(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1))"
                )
            ).alias("bg"),
        )
        .select(
            "doc_id", F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2")
        )
    )
    db = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    bc = db.groupBy("w1", "w2").agg(F.sum("tf").alias("bt"))
    uc = bc.groupBy("w1").agg(F.sum("bt").alias("ut"))
    sc = (
        db.join(bc, ["w1", "w2"])
        .join(uc, ["w1"])
        .select(
            "doc_id",
            "tf",
            (F.col("tf") * F.length(F.bin(F.expr("ut DIV bt")))).alias("s"),
        )
    )
    return (
        sc.groupBy("doc_id")
        .agg(F.sum("tf").alias("nb"), F.sum("s").alias("sp"))
        .select(
            "doc_id",
            F.col("nb").cast("bigint").alias("n_bigrams"),
            F.col("sp").cast("bigint").alias("surprisal"),
            F.expr("CAST((1000000 * sp) DIV nb AS BIGINT)").alias(
                "avg_surprisal_e6"
            ),
        )
    )


def doc_chunk(spark, sf_dir):
    """Round-6: overlapping token-window chunking (the RAG /
    context-window prep stage): chunks of 16 tokens at stride 12
    (4-token overlap), n_chunks = 1 + ceil(max(0, n-16)/12) so the
    final partial chunk is kept and no chunk starts past the end.
    Pure per-document explode(sequence) + slice/array_join — map-only
    (zero shuffle) at any corpus size, all JVM-side."""
    docs = _t(spark, sf_dir, "documents")
    C, S = 16, 12
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("toks"),
    ).filter(F.size("toks") >= 1)
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(
                f"sequence(0, CASE WHEN size(toks) <= {C} THEN 0 "
                f"ELSE (size(toks) - {C} + {S} - 1) DIV {S} END)"
            )
        ).alias("chunk_id"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * S + 1).cast("int").alias("start_tok"),
        F.expr(f"size(slice(toks, chunk_id * {S} + 1, {C}))")
        .cast("int").alias("n_tok"),
        F.expr(f"array_join(slice(toks, chunk_id * {S} + 1, {C}), ' ')")
        .alias("chunk_text"),
    )


def event_session_stats(spark, sf_dir):
    """Round-6: session-level rollup on top of the gap sessionization
    (event_sessions assigns per-event ids; this emits one row per
    session).  Per user (ordered by ts, event_id for determinism) a new
    session starts at the first event or when the gap from the previous
    event exceeds 30 minutes; session_seq is the running count of
    session starts.  Emits count / span / value-sum per session.

    Scale shape: ONE shuffle.  The lag/cumsum window hash-partitions by
    user_id; the final groupBy(user_id, session_seq) is satisfied by
    that same partitioning (HashPartitioning(user_id) clusters every
    (user_id, session_seq) group), so Catalyst plans no second
    Exchange.  Value sums use the per-row floor(1e6*x) convention
    before aggregation (int-exact both engines)."""
    _ensure_utc(spark)
    GAP_US = 30 * 60 * 1_000_000
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        e6(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > GAP_US),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum("v").cast("bigint").alias("sum_value_e6"),
    ).select(
        "user_id",
        F.col("session_seq").cast("bigint").alias("session_seq"),
        "n_events", "start_us", "end_us", "duration_us", "sum_value_e6",
    )


def dedup_ngram_coverage(spark, sf_dir):
    """Round-6: duplicated-n-gram coverage (the approximate
    substring-dedup *metric* of Lee et al.'s "Deduplicating Training
    Data" — per document, what fraction of its 3-token shingles also
    occur in some other document).  Reuses the engine-shared shingle
    code family (dedup.with_shingles / oracle SHINGLES_CTE), so both
    engines group by identical BIGINT codes.

    Scale shape: strictly linear — explode distinct shingles to slim
    (doc_id, code) rows, doc-frequency per code via one groupBy, join
    the df back on code (output rows == input rows, no pair
    enumeration), then one per-doc aggregate.  No arrays ride any
    shuffle past the explode."""
    from . import dedup

    docs = _t(spark, sf_dir, "documents")
    ex = (
        dedup.with_shingles(docs)
        .select("doc_id", F.explode("shingles").alias("code"))
    )
    df_per_code = ex.groupBy("code").agg(
        F.count("*").cast("bigint").alias("df")
    )
    per_doc = (
        ex.join(df_per_code, "code")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_dup",
        F.expr("CAST((1000000 * n_dup) DIV n_shingles AS BIGINT)").alias(
            "dup_frac_e6"
        ),
    )


def embedding_quantize(spark, sf_dir):
    """Round-6: int8 SCALAR QUANTIZATION of the embedding column — the
    standard ANN-index compression step (4x smaller vectors before an
    IVF/HNSW build).  Everything happens on an integer e3 grid so both
    engines agree bit-exactly (the cell_centroids_int convention):
    components become round(1000*x) BIGINTs, the per-vector scale is
    max|component|, and codes are symmetric round-half-up
    sign(v) * ((254*|v| + maxabs) DIV (2*maxabs)) in [-127, 127] —
    all-positive operands, so Spark's truncating DIV and DuckDB's
    floor '//' agree.  Emits the scale, the exact mean absolute
    reconstruction error (e6), and a position-weighted code checksum
    (so the contract pins every code, not just the error).  Map-only:
    zero shuffle, zero Python, linear at any corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x ->"
            " CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
        ).alias("xe3"),
    ).withColumn(
        "maxabs", F.expr("array_max(transform(xe3, v -> abs(v)))")
    ).withColumn(
        "q",
        F.expr(
            "transform(xe3, v -> CASE WHEN maxabs = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((CASE WHEN v >= 0 THEN 1 ELSE -1 END)"
            " * ((254 * abs(v) + maxabs) DIV (2 * maxabs)) AS BIGINT) END)"
        ),
    ).withColumn(
        "errsum",
        F.expr(
            "aggregate(zip_with(xe3, q, (v, c) -> abs(127 * v - c * maxabs)),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ),
    )
    return v.select(
        "vec_id",
        F.col("maxabs").alias("maxabs_e3"),
        F.expr(
            "CAST((1000000 * errsum) DIV (127 * size(xe3) * 1000) AS BIGINT)"
        ).alias("mean_abs_err_e6"),
        F.expr(
            "aggregate(zip_with(q, sequence(CAST(1 AS BIGINT),"
            " CAST(size(q) AS BIGINT)), (c, i) -> c * i),"
            " CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("q_checksum"),
    )


def rdf_turtle_bnode_roundtrip(spark, sf_dir):
    """Round-6: Turtle anonymous-bnode property lists "[ p o ; ... ]"
    and collections "( ... )" end-to-end.  Each document row is
    serialized as one statement
        ex:d<id> ex:meta [ ex:lang "<lang>" ; ex:source "<src>" ] ;
                 ex:sig ( <n_chars> true ) .
    sharded into 16 multi-statement documents, re-parsed by the
    document parser (mapInPandas), and aggregated with anon labels
    normalized to "_:" (labels are document-scoped and order-minted;
    the multiset of label-erased triples is the deterministic
    contract).  Exercises: nested bracket under ';', ','-free lists,
    integer/boolean shorthand inside a collection, rdf:nil tail."""
    from . import rdfio

    docs = _t(spark, sf_dir, "documents")
    stmt = F.format_string(
        'ex:d%s ex:meta [ ex:lang "%s" ; ex:source "%s" ] ; '
        "ex:sig ( %s true ) .",
        F.col("doc_id").cast("string"),
        "lang",
        "source",
        F.col("n_chars").cast("string"),
    )
    header = "@prefix ex: <http://example.org/kg#> .\n"
    sharded = (
        docs.select(stmt.alias("line"))
        .withColumn("shard", F.pmod(F.xxhash64("line"), F.lit(16)))
        .groupBy("shard")
        .agg(
            F.concat(
                F.lit(header), F.concat_ws("\n", F.collect_list("line"))
            ).alias("text")
        )
    )
    parsed = rdfio.parse_turtle_docs(sharded)
    norm = lambda c: F.when(  # noqa: E731
        (F.col("o_kind") == "iri") & F.col(c).startswith("_:"), F.lit("_:")
    ).otherwise(F.col(c))
    return (
        parsed.select(
            F.when(F.col("s").startswith("_:"), F.lit("_:"))
            .otherwise(F.col("s")).alias("s"),
            "p",
            norm("o").alias("o"),
            "o_kind",
            "o_lang",
            "o_datatype",
        )
        .groupBy("s", "p", "o", "o_kind", "o_lang", "o_datatype")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# --- round-6c: funnel / sketch / tokenizer-training operators ------------------
def event_funnel(spark, sf_dir):
    """Round-6: ordered FUNNEL analysis — for every user, how far they
    progressed through signup -> view -> purchase where each step must
    happen STRICTLY AFTER the previous one (the classic product-
    analytics sequential-conversion query).  Step k's timestamp is the
    earliest event of its type later than step k-1's timestamp, so the
    whole funnel is three per-user min-aggregates chained by equi-joins
    on user_id — every shuffle keys on user_id (AQE reuses the
    exchange), no window over the full event stream, no per-user event
    arrays.  At 100 TB this is 3 slim groupBys + 3 slim joins; skewed
    power-users cost only their own group, never a cross product."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1_us"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("ts_us") > F.col("t1_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2_us"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts_us") > F.col("t2_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3_us"))
    )
    users = ev.select("user_id").distinct()
    reached = (
        F.when(F.col("t3_us").isNotNull(), F.lit(3))
        .when(F.col("t2_us").isNotNull(), F.lit(2))
        .when(F.col("t1_us").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            reached.cast("int").alias("reached"),
            "t1_us",
            "t2_us",
            "t3_us",
        )
    )


def _charcode_expr(col: str) -> str:
    """SQL for the char-level rolling hash of a token column — the
    grammar's charcode(t): fold (31*acc + ascii(c)) % HASH_P over the
    characters.  Pure int64 (31 * (P-1) + 255 < 2^63), identical in
    Spark and DuckDB (list_reduce with a prepended 0 seed)."""
    return (
        f"aggregate(transform(split({col}, ''),"
        " c -> CAST(ascii(c) AS BIGINT)), CAST(0 AS BIGINT),"
        f" (a, c) -> (a * 31 + c) % {G.HASH_P})"
    )


def heavy_hitters_cms(spark, sf_dir):
    """Round-6: COUNT-MIN SKETCH heavy-hitter estimation over the token
    stream — the streaming-sketch answer to "top terms without a full
    vocabulary shuffle".  The sketch is CMS_D x CMS_W integer counters:
    each distinct token's exact count (one map-side-combined groupBy)
    is added into d = CMS_D buckets chosen by the grammar hash family
    applied to the token's char-level rolling hash.  Point estimates
    for the exact top CMS_TOP_K tokens are min over the d bucket
    totals — always >= truth (one-sided error), so `overcount` is
    non-negative by construction and the contract pins both the sketch
    CONTENT (via the estimates) and the estimator.  Scale shape: the
    sketch build is an associative sum keyed by (row, bucket) — at
    most CMS_D*CMS_W = 2048 reducer groups regardless of corpus size —
    and the top-k window prunes per-partition (WindowGroupLimit)
    before its single-group final."""
    D, W, OFF, K = G.CMS_D, G.CMS_W, G.CMS_HASH_OFFSET, G.CMS_TOP_K
    docs = _t(spark, sf_dir, "documents")
    tc = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), t -> t != '')")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("hcode", F.expr(_charcode_expr("token")))
        .localCheckpoint(eager=False)
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (
                    (
                        (F.lit(G.hash_a(OFF + i)) * F.col("hcode")
                         + F.lit(G.hash_b(OFF + i)))
                        % F.lit(G.HASH_P)
                    )
                    % F.lit(W)
                ).alias("b"),
            )
            for i in range(D)
        ]
    )
    sk = (
        tc.select("cnt", F.explode(buckets).alias("rb"))
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("cnt").alias("bucket_cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    top = (
        tc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
    )
    return (
        top.select("token", "cnt", "rnk", F.explode(buckets).alias("rb"))
        .select("token", "cnt", "rnk",
                F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .join(sk, ["r", "b"])
        .groupBy("token", "cnt", "rnk")
        .agg(F.min("bucket_cnt").alias("cms_count"))
        .select(
            "token",
            F.col("rnk").cast("int").alias("rnk"),
            F.col("cnt").cast("bigint").alias("true_count"),
            F.col("cms_count").cast("bigint").alias("cms_count"),
            (F.col("cms_count") - F.col("cnt"))
            .cast("bigint")
            .alias("overcount"),
        )
    )


def bpe_merge_pairs(spark, sf_dir):
    """Round-6: ONE ROUND of BPE tokenizer training — the weighted
    adjacent-symbol pair counts that drive the merge decision, over the
    corpus word-frequency table (symbols start as characters plus the
    '$' end-of-word marker, the standard formulation).  The full BPE
    loop is a driver iteration re-invoking this stage after applying
    the winning merge (like pagerank's join-per-round); the contract
    pins round one exactly: top CMS_TOP_K pairs by (count DESC, lhs,
    rhs) — a total order, so the cut is engine-independent.  Scale
    shape: word counts first (map-side combine collapses the token
    stream to the vocabulary), pair explode runs over DISTINCT words
    only, and the top-k window prunes per-partition before its final
    single-group pass."""
    K = G.CMS_TOP_K
    docs = _t(spark, sf_dir, "documents")
    wf = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), t -> t != '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    pairs = wf.select(
        "wf",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(word, ''))),"
                " i -> named_struct("
                "'lhs', element_at(concat(split(word, ''), array('$')), i),"
                "'rhs', element_at(concat(split(word, ''), array('$')), i + 1)))"
            )
        ).alias("pr"),
    )
    pc = (
        pairs.select("wf", F.col("pr.lhs").alias("lhs"),
                     F.col("pr.rhs").alias("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.sum("wf").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
    return (
        pc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "lhs",
            "rhs",
            F.col("cnt").cast("bigint").alias("cnt"),
        )
    )


def kg_sparql_ask(spark, sf_dir):
    """SPARQL ASK through the text front-end (kgspark/sparql.py
    sparql_ask): boolean existence over the KG — one positive probe
    (a filtered two-pattern group) and one vacuous probe, each
    compiling to limit(1) + count > 0 (the scan stops at the first
    match; no full-table aggregate).  Booleans are cast to int for the
    cross-engine hash."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_ask

    t = run_pipeline_cached(spark, sf_dir).triples
    yes = sparql_ask(
        t,
        """
        ASK { ?e rdf:type ex:Commerce .
              ?e ex:score ?n .
              FILTER(xsd:integer(?n) >= 2) }
        """,
    )
    no = sparql_ask(t, "ASK { ?e rdf:type ex:NoSuchClass }")
    return yes.select(
        F.lit("commerce_scored").alias("q"), F.col("ask").cast("int").alias("ask")
    ).unionByName(
        no.select(F.lit("nosuch").alias("q"), F.col("ask").cast("int").alias("ask"))
    )


def kg_sparql_describe(spark, sf_dir):
    """SPARQL DESCRIBE through the text front-end (kgspark/sparql.py
    sparql_describe): outgoing-edge description of every resource
    matched by the WHERE group — the solution set's distinct subjects
    semi-joined back against the triple frame (one shuffle, no
    collect)."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_describe

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_describe(
        t,
        """
        DESCRIBE ?e WHERE { ?e rdf:type ex:Commerce .
                            ?e ex:score ?n .
                            FILTER(xsd:integer(?n) >= 3) }
        """,
    )


def kg_sparql_isnumeric(spark, sf_dir):
    """Round-6c: isNumeric() over the full-term model — true only for
    objects whose hidden __dt_ carrier holds a numeric xsd datatype
    (the proxy ex:score literals, grammar.DT_INTEGER), never for plain
    literals or IRIs with numeric-looking lexical forms."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        """
        SELECT ?p (COUNT(*) AS ?n)
        WHERE { ?s ?p ?o . FILTER(ISNUMERIC(?o)) }
        GROUP BY ?p ORDER BY ?p
        """,
    )


def kg_sparql_sameterm(spark, sf_dir):
    """Round-6c: sameTerm() — RDF-term identity (lexical + language
    tag + datatype, riding the hidden carriers of both object
    bindings).  Counts ordered co-mention pairs per document: the
    self-join of ex:mentions edges minus the diagonal, i.e.
    m·(m−1) for a document with m distinct mentions."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        """
        SELECT ?d (COUNT(*) AS ?np)
        WHERE { ?d ex:mentions ?a . ?d ex:mentions ?b .
                FILTER(!SAMETERM(?a, ?b)) }
        GROUP BY ?d ORDER BY ?d
        """,
    )


def kg_sparql_encode(spark, sf_dir):
    """Round-6c: ENCODE_FOR_URI over chained BINDs — the mention IRI's
    path remainder (STRAFTER of its STR form) percent-encoded; the
    '/' between source and normalized text becomes %2F.  Later BINDs
    reference earlier BIND targets (sequential withColumn order)."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        """
        SELECT ?d ?enc WHERE {
          ?d ex:mentions ?m .
          BIND(STR(?m) AS ?ms)
          BIND(STRAFTER(?ms, "ex://") AS ?tail)
          BIND(ENCODE_FOR_URI(?tail) AS ?enc)
        }
        """,
    )


def kg_sparql_term_ctors(spark, sf_dir):
    """Round-6c: term-constructor BINDs — STRLANG/STRDT/IRI mint a new
    literal/IRI binding WITH hidden __lang_/__dt_/__kind_ carriers, so
    the downstream LANG()/DATATYPE()/isIRI()/isNumeric() filters
    observe the constructed term, not just its lexical value."""
    from .sparql import sparql_select

    t = kg_triples_full(spark, sf_dir)
    return sparql_select(
        t,
        """
        SELECT ?e ?lab ?score2 WHERE {
          ?e rdfs:label ?l . ?e ex:score ?sc .
          BIND(STRLANG(STR(?l), "x-kg") AS ?lab)
          BIND(STRDT(STR(?sc), xsd:integer) AS ?score2)
          BIND(IRI(STR(?e)) AS ?ei)
          FILTER(LANGMATCHES(LANG(?lab), "x-kg") && ISLITERAL(?lab)
                 && DATATYPE(?score2) = "xsd:integer"
                 && ISNUMERIC(?score2) && ISIRI(?ei))
        }
        """,
    )


def entity_link_adamic(spark, sf_dir):
    """Round-6c: Adamic-Adar + Jaccard link prediction, INTEGER-exact.
    The common-neighbor wedge enumeration of entity_link_prediction,
    reweighted by hinge informativeness: w(z) = 1_000_000 DIV
    bitlen(deg(z)) — the log2-quantized inverse-log weight (the float
    1/ln(deg) flaps across engines; bitlen is bit-identical), summed
    exactly in int64.  jac_e6 = 1e6·cn DIV (deg(a)+deg(b)−cn) with
    full (uncapped) endpoint degrees.  Hub hinges (degree > 64) are
    excluded from wedge enumeration — the same O(V·cap²) web-scale
    guard, so cn/aa are exact on the hub-capped wedge graph while the
    Jaccard denominator keeps true degrees (documented estimator)."""
    HINGE_CAP = 64
    pairs = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ek = edges.join(deg, "src").filter(F.col("deg") <= HINGE_CAP)
    w1 = ek.select(
        F.col("src").alias("hinge"),
        F.col("dst").alias("a"),
        F.expr("CAST(1000000 DIV length(bin(deg)) AS BIGINT)").alias("w"),
    )
    w2 = ek.select(F.col("src").alias("hinge"), F.col("dst").alias("b"))
    cand = (
        w1.join(w2, "hinge")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("bigint").alias("cn"),
            F.sum("w").cast("bigint").alias("aa"),
        )
        .filter(F.col("cn") >= 2)
    )
    dega = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    degb = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        cand.join(dega, "a")
        .join(degb, "b")
        .withColumn(
            "jac_e6",
            F.expr("CAST((1000000 * cn) DIV (deg_a + deg_b - cn) AS BIGINT)"),
        )
    )
    return (
        scored.join(
            pairs,
            (scored["a"] == pairs["entity_a"]) & (scored["b"] == pairs["entity_b"]),
            "left_anti",
        )
        .select(
            F.col("a").alias("entity_a"),
            F.col("b").alias("entity_b"),
            "cn", "aa", "jac_e6",
        )
    )


def dedup_containment(spark, sf_dir):
    """Round-6c: asymmetric containment near-dup — pairs where the
    smaller 3-gram shingle set is ≥ 80 % contained in the larger
    (dedup.containment_pairs): catches short-inside-long verbatim
    embeddings that symmetric Jaccard misses.  Integer-e6 score."""
    from . import dedup as D

    sh = D.with_shingles(_t(spark, sf_dir, "documents"))
    pairs = D.containment_pairs(sh, "doc_id", "shingles")
    return pairs.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "cont_e6"
    )


def rdf_jsonld_list_roundtrip(spark, sf_dir):
    """Round-6c: JSON-LD ordered collections, label-free roundtrip —
    one compacted document per region carrying the region's nations
    twice: an inline {"@list": […]} of name strings and an
    @list-container term of integer keys.  parse_jsonld_compacted
    builds the rdf:first/rdf:rest chains over document-scoped blank
    nodes; rdfio.unroll_lists walks them back into positional rows, so
    the contract compares (s, p, pos, o, o_datatype) with no blank
    label ever surfacing."""
    from . import rdfio

    nat = _t(spark, sf_dir, "nation")
    per_region = nat.groupBy("n_regionkey").agg(
        F.sort_array(
            F.collect_list(F.struct("n_nationkey", "n_name"))
        ).alias("ns")
    )
    names = F.concat_ws(
        ",", F.transform("ns", lambda x: F.concat(F.lit('"'), x["n_name"], F.lit('"')))
    )
    keys = F.concat_ws(
        ",", F.transform("ns", lambda x: x["n_nationkey"].cast("string"))
    )
    docs = per_region.select(
        F.concat(
            F.lit('{"@context": {"ex": "http://example.org/kg#",'
                  ' "natkeys": {"@id": "http://example.org/kg#natkeys",'
                  ' "@container": "@list"}},'
                  ' "@id": "ex:region'),
            F.col("n_regionkey").cast("string"),
            F.lit('", "ex:natnames": {"@list": ['),
            names,
            F.lit(']}, "natkeys": ['),
            keys,
            F.lit("]}"),
        ).alias("text")
    )
    parsed = rdfio.parse_jsonld_compacted(docs, scope_bnodes=True)
    return rdfio.unroll_lists(parsed).select(
        "s", "p", "pos", "o", "o_datatype"
    )


def bpe_vocab_merges(spark, sf_dir, rounds: int = 3, return_vocab: bool = False):
    """Round-6c: MULTI-ROUND BPE tokenizer training — the iterative
    loop bpe_merge_pairs pins one round of: per round, the winning
    adjacent-symbol pair (count DESC, lhs, rhs over the weighted
    vocabulary) is collected (a 1-row driver aggregate, the same
    bounded pattern as CC/pagerank) and applied to every word's symbol
    array via pure array exprs — flag matching positions, drop the
    successor of each match, substitute the merged symbol.  SELF-pairs
    (lhs = rhs) stay in the counts but are excluded from merge
    SELECTION: their greedy application is overlap-ambiguous ("aaa")
    and implementations disagree; with lhs ≠ rhs matches can never
    overlap, so the simultaneous array rewrite IS the greedy result —
    bit-identical across engines.  Scale shape: the loop body is two
    narrow stages over the DISTINCT vocabulary (not the token stream);
    state rides a lazily checkpointed (wf, cs) frame, rounds are a
    fixed small constant (like the BFS horizon)."""
    docs = _t(spark, sf_dir, "documents")
    wf = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), t -> t != '')")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    sym = wf.select(
        "word", "wf", F.expr("concat(split(word, ''), array('$'))").alias("cs")
    ).localCheckpoint(eager=False)

    out_rows: list[tuple] = []
    for rnd in range(1, rounds + 1):
        pc = (
            sym.select(
                "wf",
                # zip of cs with its own 1-shift: a fully-merged word
                # (single symbol) slices to two empty arrays and emits
                # no pair (sequence(1, 0) would DESCEND and probe
                # index 0 — the Spark reverse-sequence trap)
                F.explode(
                    F.expr(
                        "zip_with(slice(cs, 1, size(cs) - 1),"
                        " slice(cs, 2, size(cs) - 1),"
                        " (l, r) -> named_struct('lhs', l, 'rhs', r))"
                    )
                ).alias("pr"),
            )
            .select("wf", F.col("pr.lhs").alias("lhs"), F.col("pr.rhs").alias("rhs"))
            .groupBy("lhs", "rhs")
            .agg(F.sum("wf").alias("cnt"))
        )
        top = (
            pc.filter(F.col("lhs") != F.col("rhs"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        out_rows.append((rnd, lhs, rhs, cnt))
        ql, qr = lhs.replace("'", "\\'"), rhs.replace("'", "\\'")
        qm = (lhs + rhs).replace("'", "\\'")
        # boundary probes ride IF (lazily evaluated — ANSI element_at
        # throws on index 0 / past-the-end, and OR does not guarantee
        # short-circuit); '' can never equal a symbol
        merge = (
            "transform("
            " filter(sequence(1, size(cs)),"
            f"  i -> NOT (IF(i <= 1, '', element_at(cs, i - 1)) = '{ql}'"
            f"       AND element_at(cs, i) = '{qr}')),"
            f" i -> IF(IF(i >= size(cs), '', element_at(cs, i + 1)) = '{qr}'"
            f"         AND element_at(cs, i) = '{ql}', '{qm}',"
            "          element_at(cs, i)))"
        )
        sym = sym.withColumn("cs", F.expr(merge)).localCheckpoint(eager=False)
    merges = spark.createDataFrame(
        out_rows, "rnd int, lhs string, rhs string, cnt bigint"
    )
    return (merges, sym) if return_vocab else merges


def ann_mips(spark, sf_dir):
    from . import ann as A

    return A.ann_mips(_t(spark, sf_dir, "embeddings"))


def event_retention_cohorts(spark, sf_dir):
    """Round-6c: classic retention-cohort analysis over the event
    stream — users cohorted by their FIRST active week, then counted
    per (cohort week, week offset).  Weeks are integer epoch-day DIV 7
    (never engine week-truncation: Monday-vs-Sunday and locale rules
    differ across engines; the day-index arithmetic is bit-identical).
    Scale shape: distinct (user, week) first (map-side combine on the
    stream), a per-user min aggregate, one join back on user_id, and a
    final small aggregate — no windows over the raw stream."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
            " DIV 86400000000 DIV 7 AS BIGINT)"
        ).alias("week"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


def kg_negative_edges(spark, sf_dir):
    """Round-6c: deterministic NEGATIVE-EDGE SAMPLING — the standard
    KG-embedding training-data prep (TransE-family corruption): every
    positive co-occurrence edge yields NEG_SLOTS corrupted-tail
    candidates, drawn by the grammar's affine hash family over the
    edge's char-level rolling hash, indexed into the id-ordered entity
    list; degenerate draws (either endpoint) and accidental positives
    (the corrupted pair exists) are dropped — so the emitted set is
    exactly reproducible on any engine, unlike rand() sampling.

    Scale notes: the global row_number ranks only the ENTITY DIM (the
    vocabulary, orders of magnitude below the edge set; at true
    cluster scale PBG-style per-shard negative pools replace the
    global index — the hash arithmetic is unchanged); the entity
    count is a 1-row driver aggregate; the index lookup is one
    equi-join on rank and the positive check one anti-join."""
    pos = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
        .localCheckpoint(eager=False)
    )
    ents = kg_entities(spark, sf_dir).select("entity_id").distinct()
    ranked = ents.withColumn(
        "rank", F.row_number().over(Window.orderBy("entity_id")) - 1
    ).localCheckpoint(eager=False)
    n = ranked.count()

    hcode = (
        "aggregate(split(concat(entity_a, '|', entity_b), ''),"
        " CAST(0 AS BIGINT),"
        f" (acc, c) -> (acc * 31 + ascii(c)) % {G.FP_MOD})"
    )
    slots = pos.withColumn("hcode", F.expr(hcode)).withColumn(
        "slot", F.explode(F.sequence(F.lit(1), F.lit(G.NEG_SLOTS)))
    )
    idx_cases = None
    for i in range(1, G.NEG_SLOTS + 1):
        a, b = G.hash_a(G.NEG_HASH_OFFSET + i), G.hash_b(G.NEG_HASH_OFFSET + i)
        expr = (F.lit(a) * F.col("hcode") + F.lit(b)) % F.lit(G.HASH_P) % F.lit(n)
        idx_cases = (
            F.when(F.col("slot") == i, expr)
            if idx_cases is None
            else idx_cases.when(F.col("slot") == i, expr)
        )
    cand = (
        slots.withColumn("rank", idx_cases.cast("bigint"))
        .join(ranked, "rank")
        .select(
            "entity_a", "entity_b", "slot",
            F.col("entity_id").alias("neg_entity"),
        )
        .filter(
            (F.col("neg_entity") != F.col("entity_a"))
            & (F.col("neg_entity") != F.col("entity_b"))
        )
    )
    corrupted = cand.withColumn(
        "pa", F.least("entity_a", "neg_entity")
    ).withColumn("pb", F.greatest("entity_a", "neg_entity"))
    pos_pairs = pos.select(
        F.col("entity_a").alias("pa"), F.col("entity_b").alias("pb")
    )
    return (
        corrupted.join(pos_pairs, ["pa", "pb"], "left_anti")
        .select("entity_a", "entity_b", F.col("slot").cast("int").alias("slot"),
                "neg_entity")
    )


def dedup_keep_best(spark, sf_dir):
    """Round-6c: QUALITY-AWARE dedup keeper — the near-dup clusters of
    dedup_clusters re-decided by content quality instead of min-id:
    keeper = the cluster member with the highest quality_e6 (tie →
    min doc_id), the policy real curation pipelines use (keep the
    best copy, not the first-crawled).  One max_by-struct aggregate
    per cluster + one join back; the struct packs (quality, -doc_id)
    so the tie-break rides the same max."""
    from . import dedup as D
    from .textstats import text_quality

    docs = _t(spark, sf_dir, "documents")
    clusters = D.dedup_clusters(docs, jaccard_min=0.01)  # contract tau
    q = text_quality(docs).select("doc_id", "quality_e6")
    member_q = clusters.join(q, "doc_id")
    keepers = (
        member_q.groupBy("keep_doc_id")
        .agg(
            F.max(F.struct("quality_e6", (-F.col("doc_id")).alias("neg_id")))
            .alias("best")
        )
        .select(
            "keep_doc_id",
            (-F.col("best.neg_id")).cast("bigint").alias("best_doc_id"),
        )
    )
    return (
        clusters.join(keepers, "keep_doc_id")
        .select("doc_id", F.col("best_doc_id").alias("keep_doc_id"))
    )


def event_value_outliers(spark, sf_dir):
    """Round-6c: robust OUTLIER DETECTION per event type — the
    median/MAD rule (|x − med| > 3·MAD), the standard robust
    alternative to z-scores (mean/std are themselves dragged by the
    outliers).  All arithmetic stays int64 on the e6 grid: med_2x =
    2·median via the half-unit interpolation of
    event_value_percentiles, dev_2x = |2·v − med_2x|, mad_4x =
    2·median(dev_2x), and the flag is 2·dev_2x > 3·mad_4x — no float
    ever, so the cut is bit-identical across engines.  Scale shape:
    two ranked-window passes per type (the exact-median shape shared
    with event_value_percentiles) + broadcast-size per-type stats
    joined back."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", e6(F.col("value")).alias("v_e6")
    )

    def med2(df, col):
        w = Window.partitionBy("event_type").orderBy(col)
        ranked = df.withColumn("i", F.row_number().over(w) - 1).withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
        return ranked.groupBy("event_type").agg(
            F.expr(
                f"CAST(sum(CASE WHEN i = (n-1) DIV 2 THEN {col} * (2 - (n-1) % 2) "
                f"WHEN i = (n-1) DIV 2 + 1 THEN {col} * ((n-1) % 2) "
                "ELSE 0 END) AS BIGINT)"
            ).alias("m2")
        )

    med = med2(ev, "v_e6").withColumnRenamed("m2", "med_2x")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev_2x", F.abs(F.lit(2) * F.col("v_e6") - F.col("med_2x"))
    )
    mad = (
        med2(dev.select("event_type", "event_id", "dev_2x"), "dev_2x")
        .select("event_type", (F.col("m2") * 2).alias("mad_4x"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.lit(2) * F.col("dev_2x") > F.lit(3) * F.col("mad_4x"))
        .select("event_type", "event_id", "v_e6")
    )


def event_session_window_stats(spark, sf_dir):
    """Round-6c: Spark's NATIVE session_window (gap-merged dynamic
    windows) — per (user, session) event count and value sum.  One
    groupBy does the sessionize-and-aggregate in a single shuffle
    (Catalyst's UpdatingSessionsExec merges windows in-partition after
    hashing by user), vs the window+cumsum+second-aggregate chain of
    event_sessions/event_session_stats — the idiomatic engine-native
    form of the same operator family.  Boundary semantics pinned in
    the oracle: an event exactly gap-distant from its predecessor
    still EXTENDS the session (session_window closes only strictly
    beyond last + gap — verified by the boundary unit test); window
    end = last event + gap."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("tss"),
        e6(F.col("value")).alias("v_e6"),
    )
    return (
        ev.groupBy("user_id", F.session_window("tss", "30 minutes").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v_e6").cast("bigint").alias("sum_value_e6"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            F.unix_micros("w.end").alias("end_us"),
            "n_events",
            "sum_value_e6",
        )
    )


def langid_confusion(spark, sf_dir):
    """Round-6c: language-ID CONFUSION MATRIX — the evaluation metric
    for the classifier operator (true fixture lang × predicted lang →
    doc counts), one aggregate over the langid output; diagonal mass /
    total = accuracy, off-diagonal cells show which language pairs the
    trigram profiles confuse."""
    from . import textstats as TS

    pred = TS.langid(spark, _t(spark, sf_dir, "documents"))
    return (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


def entity_neighbor_agg(spark, sf_dir):
    """Round-6c: one GNN-style MESSAGE-PASSING round over the entity
    co-occurrence graph — per entity, aggregate its 1-hop neighbors'
    features (degree and proxy score): the feature-preparation stage
    of graph-ML training data (a GraphSAGE/GCN layer is exactly this
    join-aggregate; iterating it is the cc/pagerank loop pattern).
    Scale shape: degree is one aggregate, the neighbor feature ride is
    one equi-join edge→(neighbor features) + one groupBy on the source
    — no adjacency list ever materializes per row."""
    pairs = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
        .localCheckpoint(eager=False)
    )
    edges = pairs.select(
        F.col("entity_a").alias("src"), F.col("entity_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    score = kg_entity_attrs(spark, sf_dir).select(
        F.col("entity_id").alias("dst"), F.col("score").alias("n_score")
    )
    nbr = (
        edges.join(deg.withColumnRenamed("src", "dst"), "dst")
        .join(score, "dst")
        .groupBy("src")
        .agg(
            F.count("*").cast("bigint").alias("n_neighbors"),
            F.sum("deg").cast("bigint").alias("nbr_deg_sum"),
            F.sum("n_score").cast("bigint").alias("nbr_score_sum"),
        )
    )
    return nbr.select(
        F.col("src").alias("entity_id"),
        "n_neighbors", "nbr_deg_sum", "nbr_score_sum",
    )


def bpe_encode_counts(spark, sf_dir):
    """Round-6c: APPLY the learned tokenizer — every document encoded
    with the 3-round BPE vocabulary of bpe_vocab_merges, reporting
    per-doc symbol counts before (chars + end-of-word markers) and
    after the merges: the compression the tokenizer actually buys,
    and the train→apply loop closed in one engine.  Scale shape: the
    merged symbol table is per-DISTINCT-word (the vocabulary); each
    document encodes via one word-level equi-join + a per-doc sum —
    the token stream itself is never re-segmented row by row."""
    merges, sym = bpe_vocab_merges(spark, sf_dir, return_vocab=True)
    word_syms = sym.select(
        "word",
        F.size("cs").cast("bigint").alias("n_after"),
        (F.length("word") + 1).cast("bigint").alias("n_before"),
    )
    dwords = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.expr("filter(split(text, ' '), t -> t != '')")
        ).alias("word"),
    )
    return (
        dwords.join(word_syms, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_before").cast("bigint").alias("n_syms_before"),
            F.sum("n_after").cast("bigint").alias("n_syms_after"),
        )
    )


def event_cumulative_users(spark, sf_dir):
    """Round-6c: cumulative-distinct-user curve — per day, how many
    users have EVER been seen up to that day (the growth curve every
    analytics stack draws).  Computed without a running COUNT(DISTINCT)
    window (quadratic state at scale): each user contributes once at
    their FIRST day (per-user min aggregate), then one small
    per-day count + cumulative sum over the day sequence — integer
    epoch-days (engine-neutral, like the retention weeks)."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    first_day = (
        ev.select(
            "user_id",
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
                " DIV 86400000000 AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    per_day = first_day.groupBy("first_day").agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


def kg_label_index(spark, sf_dir):
    """Round-6c: label SEARCH-INDEX build (O7 extension — the
    entities/attrs index sink as an inverted index): label token →
    (n_entities, order-insensitive id-hash checksum over the posting
    list).  The checksum pins the posting CONTENT without shipping the
    list through the contract: sum of each entity id's rolling char
    hash mod FP_MOD — commutative, so partitioning-invariant and
    replayable in SQL."""
    attrs = kg_entity_attrs(spark, sf_dir).select("entity_id", "label")
    postings = attrs.select(
        "entity_id",
        F.explode(
            F.expr("filter(split(label, ' '), t -> t != '')")
        ).alias("token"),
    ).distinct()
    ehash = (
        "aggregate(split(entity_id, ''), CAST(0 AS BIGINT),"
        f" (acc, c) -> (acc * 31 + ascii(c)) % {G.FP_MOD})"
    )
    return (
        postings.withColumn("eh", F.expr(ehash))
        .groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("n_entities"),
            F.expr(f"CAST(sum(eh) % {G.FP_MOD} AS BIGINT)").alias("postings_hash"),
        )
    )


def entity_clustering_coef(spark, sf_dir):
    """Round-6c: LOCAL CLUSTERING COEFFICIENT per entity over the
    co-occurrence graph — the per-node companion to
    entity_triangle_counts: clustering_e6 = (2e6 · triangles) div
    (deg·(deg−1)), all-BIGINT so both engines agree bit-exactly (a
    float ratio would not hash-compare).  One ordered-edge triangle
    enumeration + one degree aggregate (cc.clustering_int); the same
    O(E^{3/2}) plan family as the triangle query — no node ever joins
    its full neighborhood twice."""
    pairs = (
        kg_entity_cooccurrence(spark, sf_dir)
        .select("entity_a", "entity_b")
    )
    return cc_mod.clustering_int(pairs, node_col="entity_id")


def entity_degree_hist(spark, sf_dir):
    """Round-6c: log2-bucketed DEGREE DISTRIBUTION of the co-occurrence
    graph (the power-law observability readout every graph pipeline
    ships): bucket = bitlen(degree) so bucket k holds degrees in
    [2^(k-1), 2^k).  Two map-side-combined aggregates over the
    bidirectional edge frame — O(E), no joins, scale-trivial."""
    deg = (
        _coocc_edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return (
        deg.select(
            F.length(F.bin(F.col("degree"))).cast("int").alias("bucket"),
            "degree",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_entities"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


def entity_ppr(spark, sf_dir, n_iter: int = 4):
    """Round-6c: PERSONALIZED PageRank from a deterministic seed set —
    the seed-restricted relatedness/recommendation primitive (which
    entities are close to THESE?).  Seeds: first hex digit of the
    minted entity digest has ascii % 4 == 0 (engine-agnostic string
    rule — both sides compute it from the same entity_id column, no
    RNG).  Scores in µ-units with integer damping 17/20 and teleport
    mass returning only to seeds (cc.ppr_int); 4 unrolled iterations
    mirrored as CTEs in the DuckDB oracle.  O(E) per round."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    pfx = len(G.ENTITY_IRI_PREFIX)
    nodes = (
        members.select("entity_id")
        .distinct()
        .withColumn(
            "is_seed",
            F.expr(f"ascii(substr(entity_id, {pfx + 1}, 1)) % 4 = 0"),
        )
    )
    return (
        cc_mod.ppr_int(
            nodes, _coocc_edges(spark, sf_dir), n_iter=n_iter, node_col="entity_id"
        )
        .withColumnRenamed("node", "entity_id")
        .select("entity_id", "is_seed", "score")
    )


def term_pmi(spark, sf_dir):
    """Round-6c: PMI COLLOCATION MINING over adjacent word bigrams —
    the classic phrase-detection stage (word2vec-style "new_york"
    merging) on a fully LOG-DOMAIN integer score:

        pmi_bits = bitlen(c_xy) + 2·bitlen(N) − bitlen(M)
                   − bitlen(c_x) − bitlen(c_y)

    ≈ log2(p(xy) / (p(x)·p(y))) within quantization — and, unlike the
    ratio form (c_xy·N²) DIV (M·c_x·c_y), it can NEVER overflow int64
    at any corpus size (N² at a 100 TB token count would), so the
    quantized spec is also the scale-safe one.  Plan: per-doc bigram
    counts first (map-side combine slims every shuffle), corpus counts
    derived from those, two equi-joins on the word keys, corpus totals
    as one broadcast 1-row frame.  Filter c_xy ≥ 5 (collocation
    support)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("toks"),
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "arrays_zip(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1))"
                )
            ).alias("bg"),
        )
        .select(F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_xy"))
    )
    totals = uni.agg(
        F.sum("c").cast("bigint").alias("n_tokens")
    ).crossJoin(bi.agg(F.sum("c_xy").cast("bigint").alias("n_bigrams")))
    return (
        bi.filter(F.col("c_xy") >= 5)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c_xy",
            (
                F.length(F.bin("c_xy"))
                + 2 * F.length(F.bin("n_tokens"))
                - F.length(F.bin("n_bigrams"))
                - F.length(F.bin("c_x"))
                - F.length(F.bin("c_y"))
            )
            .cast("int")
            .alias("pmi_bits"),
        )
    )


def embedding_srp_buckets(spark, sf_dir):
    """Round-6c: SIGN-RANDOM-PROJECTION LSH signatures over the
    embedding table — the hyperplane bucketing family for cosine
    similarity (complementing the cell-grid in embedding_neardup):
    bit k of the 16-bit signature is [Σ_d sign(k,d)·e3_d ≥ 0] with the
    ±1 hyperplane components minted from the grammar affine-hash
    family (grammar.SRP_*) — deterministic int64 arithmetic, so both
    engines bucket identically (a float Gaussian projection would
    not).  Output: per-bucket histogram (n_vecs, id checksum, candidate
    pair count) — the LSH observability readout that sizes the
    verify-stage join.  Map-only signature pass + one aggregate; at
    100 TB the bucket key is exactly what the near-dup verify join
    would shuffle on."""
    A, B = G.hash_a(G.SRP_HASH_IDX), G.hash_b(G.SRP_HASH_IDX)
    e3 = "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE)) AS BIGINT))"
    sig = (
        f"aggregate(sequence(0, {G.SRP_PLANES - 1}), CAST(0 AS BIGINT), (acc, k) -> "
        f"acc + IF(aggregate(sequence(1, size(e3)), CAST(0 AS BIGINT), (a, d) -> "
        f"a + IF(((CAST({A} AS BIGINT) * (k * size(e3) + d - 1) + {B}) % {G.HASH_P}) % 2 = 0, "
        f"CAST(1 AS BIGINT), CAST(-1 AS BIGINT)) * element_at(e3, d)) >= 0, "
        f"shiftleft(CAST(1 AS BIGINT), k), CAST(0 AS BIGINT)))"
    )
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(e3).alias("e3")
    )
    return (
        v.select("vec_id", F.expr(sig).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
        )
        .withColumn(
            "n_cand_pairs",
            F.expr("CAST(n_vecs * (n_vecs - 1) DIV 2 AS BIGINT)"),
        )
    )


def dedup_incremental_pairs(spark, sf_dir):
    """Round-6c: INCREMENTAL near-dup — the arriving-batch form (new =
    doc_id % 10 == 0, the deterministic 10% batch): LSH band collisions
    where at least one side is new, old×old excluded inside the join
    condition (dedup.minhash_incremental_pairs).  At 100 TB the index's
    band table is a stored artifact; per-batch cost is independent of
    the old×old pair mass — the shape that makes daily dedup runs
    affordable."""
    from . import dedup as D

    return D.minhash_incremental_pairs(_t(spark, sf_dir, "documents"))


def entity_top_neighbors(spark, sf_dir):
    """Round-6c: TOP-K RELATED ENTITIES — per entity the 3 strongest
    co-occurrence neighbors by (n_docs DESC, neighbor ASC): the
    "related entities" panel every KG serving layer precomputes.
    Per-group rank over the bidirectional edge frame: rn <= k compiles
    to WindowGroupLimit (partial top-k BEFORE the shuffle), so the
    exchange carries at most k rows per entity — no global sort at any
    scale."""
    pairs = kg_entity_cooccurrence(spark, sf_dir)
    bi = pairs.select(
        F.col("entity_a").alias("entity_id"),
        F.col("entity_b").alias("neighbor_id"),
        "n_docs",
    ).unionByName(
        pairs.select(
            F.col("entity_b").alias("entity_id"),
            F.col("entity_a").alias("neighbor_id"),
            "n_docs",
        )
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("n_docs"), F.asc("neighbor_id")
    )
    return (
        bi.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "entity_id",
            "neighbor_id",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def dedup_minhash_calibration(spark, sf_dir):
    """Round-6c: MinHash estimator calibration — per LSH candidate
    pair, the 64-perm signature estimate vs the exact shingle Jaccard
    (both e6) and the absolute error (dedup.minhash_calibration): the
    measurement that sizes MINHASH_PERMS/bands for a target error at
    production scale."""
    from . import dedup as D

    return D.minhash_calibration(_t(spark, sf_dir, "documents"))


def doc_surprisal_heldout(spark, sf_dir):
    """Round-6c: HELD-OUT bigram surprisal — the methodologically
    correct form of the perplexity quality filter: the language model
    (bigram counts) trains on the even-doc_id half and scores the odd
    half, so no document scores its own statistics (self-scoring bias
    makes duplicated boilerplate look fluent).  Out-of-vocabulary
    bigrams (absent from the train half) are counted per doc
    (n_oov) and excluded from the mean — the e6 average is over scored
    bigrams only; docs whose bigrams are all OOV drop out.  Same
    bitlen quantization and slim per-doc-counts-first plan as
    doc_bigram_surprisal."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t != '')").alias("toks"),
    )
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "arrays_zip(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1))"
                )
            ).alias("bg"),
        )
        .select(
            "doc_id", F.col("bg")["0"].alias("w1"), F.col("bg")["1"].alias("w2")
        )
    )
    db = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    train = db.filter("doc_id % 2 = 0")
    bc = train.groupBy("w1", "w2").agg(F.sum("tf").alias("bt"))
    uc = bc.groupBy("w1").agg(F.sum("bt").alias("ut"))
    held = db.filter("doc_id % 2 = 1")
    sc = (
        held.join(bc, ["w1", "w2"], "left")
        .join(uc, ["w1"], "left")
        .select(
            "doc_id",
            "tf",
            F.when(F.col("bt").isNull(), F.lit(0)).otherwise(F.col("tf")).alias("scored"),
            F.when(F.col("bt").isNull(), F.col("tf")).otherwise(F.lit(0)).alias("oov"),
            F.when(
                F.col("bt").isNull(), F.lit(0)
            ).otherwise(
                F.col("tf") * F.length(F.bin(F.expr("ut DIV bt")))
            ).alias("s"),
        )
    )
    return (
        sc.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            F.sum("scored").cast("bigint").alias("n_scored"),
            F.sum("s").alias("sp"),
        )
        .filter(F.col("n_scored") > 0)
        .select(
            "doc_id",
            "n_bigrams",
            "n_oov",
            F.expr("CAST((1000000 * sp) DIV n_scored AS BIGINT)").alias(
                "avg_surprisal_e6"
            ),
        )
    )


def event_value_histogram(spark, sf_dir):
    """Round-6c: equi-width 16-bucket HISTOGRAM of event values on the
    e6 integer grid — the observability readout for value
    distributions (the exact-percentile query is the equi-depth
    companion).  Bucket = ((v_e6 − min_e6) · 16) DIV (range + 1) with
    the global min/max broadcast from one 1-row aggregate; pure
    integer arithmetic, identical buckets on every engine.  Two
    map-side-combined aggregates — O(N), no sort, no skew exposure."""
    ev = _t(spark, sf_dir, "events").select(
        F.expr("CAST(floor(1000000 * value) AS BIGINT)").alias("v_e6")
    )
    mm = ev.agg(
        F.min("v_e6").alias("min_e6"), F.max("v_e6").alias("max_e6")
    )
    return (
        ev.crossJoin(F.broadcast(mm))
        .select(
            F.expr(
                "CAST(((v_e6 - min_e6) * 16) DIV (max_e6 - min_e6 + 1) AS INT)"
            ).alias("bucket"),
            "v_e6",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.min("v_e6").alias("lo_e6"),
            F.max("v_e6").alias("hi_e6"),
        )
    )


def kg_sparql_values(spark, sf_dir):
    """Round-6c: VALUES inline data + MIN/MAX aggregates through the
    text front-end — the parameterized-query form consumers actually
    send (bind the class list, aggregate per class).  VALUES joins as
    a broadcast-able inline frame; MIN/MAX are exact on the integer
    scores."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?t (MIN(?si) AS ?lo) (MAX(?si) AS ?hi) (COUNT(*) AS ?n)
        WHERE { VALUES ?t { ex:Commerce ex:Data }
                ?e rdf:type ?t . ?e ex:score ?s
                BIND(xsd:integer(?s) AS ?si) }
        GROUP BY ?t
        """,
    )


def embedding_label_centroids(spark, sf_dir):
    """Round-6c: K-MEANS M-STEP over the embedding table — per-label
    centroid on the e3 integer grid: mean_e3(label, dim) =
    Σ e3 DIV n_vecs (exact BIGINT sums, order-independent — a float
    mean would not hash-compare across engines).  posexplode →
    one map-side-combined aggregate on (label, dim): the distributed
    M-step shape at any scale (the shuffle carries one partial sum per
    (label, dim, partition), never vectors)."""
    v = _t(spark, sf_dir, "embeddings").select(
        "label",
        F.expr(
            "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE))"
            " AS BIGINT))"
        ).alias("e3"),
    )
    return (
        v.select("label", F.posexplode("e3").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("val").cast("bigint").alias("sum_e3"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("dim").cast("int").alias("dim"),
            "n_vecs",
            F.expr(
                "CAST(CASE WHEN sum_e3 >= 0 THEN sum_e3 DIV n_vecs "
                "ELSE -((-sum_e3) DIV n_vecs) END AS BIGINT)"
            ).alias("mean_e3"),
        )
    )


def embedding_kmeans_assign(spark, sf_dir):
    """Round-6c: K-MEANS E-STEP — every vector assigned to the nearest
    label centroid by integer squared-L2 on the e3 grid (ties → min
    label).  The centroid frame (k·dim rows) reassembles into k arrays
    and BROADCASTS — the E-step join moves only the small side, the
    vector table streams map-only; min_by picks the argmin in one
    aggregate-free expression.  Truncation toward zero in the centroid
    mean is part of the operator spec (matched by the oracle)."""
    cents = (
        embedding_label_centroids(spark, sf_dir)
        .groupBy("label")
        .agg(
            F.expr("array_sort(collect_list(struct(dim, mean_e3)))").alias("cs")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(cs, s -> s.mean_e3)").alias("cent"),
        )
    )
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE))"
            " AS BIGINT))"
        ).alias("e3"),
    )
    dist = F.expr(
        "aggregate(zip_with(e3, cent, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "c_label", dist.alias("dist")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "c_label")).alias("best"))
        .select(
            "vec_id",
            F.col("best.c_label").cast("int").alias("assigned_label"),
            F.col("best.dist").cast("bigint").alias("dist_e6"),
        )
    )


def vocab_growth(spark, sf_dir):
    """Round-6c: VOCABULARY GROWTH CURVE (Heaps-law readout) — per
    10-document batch, how many word-TRIGRAM types appear for the
    FIRST time and the cumulative type count (the fixture's unigram
    vocabulary is closed and saturates in batch 0; trigram types grow
    for the whole corpus, which is the regime the curve is for).  Same
    no-quadratic-state shape as event_cumulative_users: each type
    contributes once at its first batch (per-type min aggregate), then
    one small per-batch count + running sum; the windowed frame is
    corpus/10 rows — the batch grain is the scale knob (coarsen it,
    the curve stays exact at the grain)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr("CAST(doc_id DIV 10 AS BIGINT)").alias("batch"),
        F.expr("filter(split(text, ' '), t -> t != '')").alias("t"),
    )
    first_batch = (
        toks.filter(F.size("t") >= 3)
        .select(
            "batch",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), "
                    "i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
                )
            ).alias("w"),
        )
        .groupBy("w")
        .agg(F.min("batch").alias("first_batch"))
    )
    per_batch = first_batch.groupBy("first_batch").agg(
        F.count("*").cast("bigint").alias("new_types")
    )
    w = Window.orderBy("first_batch").rowsBetween(Window.unboundedPreceding, 0)
    return per_batch.select(
        F.col("first_batch").alias("batch"),
        "new_types",
        F.sum("new_types").over(w).cast("bigint").alias("vocab_size"),
    )


def entity_neighbor_sample(spark, sf_dir):
    """Round-6c: DETERMINISTIC FIXED-FANOUT NEIGHBOR SAMPLING — the
    GraphSAGE-style train-prep stage: per entity, 2 neighbors chosen by
    the char-level rolling hash of the (entity, neighbor) pair string —
    an unbiased, reproducible stand-in for rand() (which would differ
    per engine/run), complementary to entity_top_neighbors' strength
    ranking.  rn <= fanout compiles to WindowGroupLimit: the exchange
    carries at most `fanout` rows per entity, the property that lets a
    10^12-edge graph be sampled in one pass."""
    pairs = kg_entity_cooccurrence(spark, sf_dir)
    bi = pairs.select(
        F.col("entity_a").alias("entity_id"),
        F.col("entity_b").alias("neighbor_id"),
    ).unionByName(
        pairs.select(
            F.col("entity_b").alias("entity_id"),
            F.col("entity_a").alias("neighbor_id"),
        )
    )
    key = _charcode_expr("concat(entity_id, '|', neighbor_id)")
    w = Window.partitionBy("entity_id").orderBy(
        F.asc("samp_key"), F.asc("neighbor_id")
    )
    return (
        bi.withColumn("samp_key", F.expr(key))
        .withColumn("samp_rank", F.row_number().over(w))
        .filter(F.col("samp_rank") <= 2)
        .select(
            "entity_id",
            "neighbor_id",
            F.col("samp_key").cast("bigint").alias("samp_key"),
            F.col("samp_rank").cast("int").alias("samp_rank"),
        )
    )


def event_debounce(spark, sf_dir):
    """Round-6c: EVENT DEBOUNCE — drop events that repeat the same
    (user, type) within 60 s of the previously KEPT event of that key
    (sensor/click-spam suppression).  Kept-anchor semantics need a
    scan, but the fixture's rule is definable with lag alone when
    debounced runs can't chain (verified by the oracle): an event is
    kept iff it is ≥ 60 s after the previous RAW event of its key —
    the standard lag-window form, one shuffle on (user_id, event_type),
    engine-exact on integer micros."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    keyed = ev.select(
        "event_id", "user_id", "event_type", us.alias("ts_us")
    ).withColumn("prev_us", F.lag("ts_us").over(w))
    return (
        keyed.filter(
            F.col("prev_us").isNull()
            | ((F.col("ts_us") - F.col("prev_us")) >= 60_000_000)
        )
        .select("event_id", "user_id", "event_type", "ts_us")
    )


def kg_sparql_path_nps(spark, sf_dir):
    """Round-6c: NEGATED PROPERTY SET path — all outgoing edges of
    Commerce entities EXCEPT rdf:type and ex:score
    (?e !(rdf:type|ex:score) ?o): SPARQL 1.1 §9.1 NPS compiled to one
    predicate-exclusion filter on the forward scan (no closure, no
    join beyond the type restriction) — a filter-pushdown plan at any
    store size."""
    from .pipeline import run_pipeline_cached
    from .sparql import sparql_select

    t = run_pipeline_cached(spark, sf_dir).triples
    return sparql_select(
        t,
        """
        SELECT ?e ?o WHERE {
          ?e rdf:type ex:Commerce .
          ?e !(rdf:type|ex:score) ?o
        }
        """,
    )


def event_type_transitions(spark, sf_dir):
    """Round-6c: EVENT-TYPE MARKOV TRANSITION MATRIX — per user the
    type sequence in time order, counted as (from_type, to_type) pairs
    (the session-flow / funnel-discovery readout; also the training
    table for a first-order behavior model).  One lag window per user
    + one map-side-combined aggregate — the shuffle carries one row
    per transition type pair per partition, never sequences."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )


def dedup_cluster_size_hist(spark, sf_dir):
    """Round-6c: NEAR-DUP CLUSTER SIZE HISTOGRAM — per cluster size,
    how many clusters and how many docs get dropped ((size−1) each):
    the dedup observability readout that tells you whether you face a
    long tail of doubletons or a few mega-clusters (very different
    remediation).  Two aggregates over the keeper table — linear."""
    from . import dedup as D

    clusters = D.dedup_clusters(_t(spark, sf_dir, "documents"), jaccard_min=0.01)
    sizes = clusters.groupBy("keep_doc_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("n_clusters") * (F.col("cluster_size") - 1))
            .cast("bigint")
            .alias("n_dropped_docs"),
        )
    )


def corpus_stats_by_source(spark, sf_dir):
    """Round-6c: CORPUS CARD — per source: doc count, token count,
    mean doc length (e6), distinct languages (the dataset datasheet
    row every curation pipeline publishes per shard/source).  One
    map-side-combined aggregate; exact integer mean."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            "lang",
            F.expr("size(filter(split(text, ' '), t -> t != ''))")
            .cast("bigint")
            .alias("n_toks"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
        .withColumn(
            "mean_len_e6",
            F.expr("CAST((1000000 * n_tokens) DIV n_docs AS BIGINT)"),
        )
    )


def event_user_lifetime(spark, sf_dir):
    """Round-6c: USER LIFETIME SUMMARY — per user: first/last activity
    (epoch micros), span in days, events, active days (the LTV /
    churn-feature base table).  One aggregate; distinct-day count via
    the integer epoch-day like the retention query."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    return (
        ev.select(
            "user_id",
            us.alias("ts_us"),
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
                " AS BIGINT)"
            ).alias("day"),
        )
        .groupBy("user_id")
        .agg(
            F.min("ts_us").alias("first_us"),
            F.max("ts_us").alias("last_us"),
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("day").cast("bigint").alias("n_active_days"),
        )
        .withColumn(
            "span_days",
            F.expr("CAST((last_us - first_us) DIV 86400000000 AS BIGINT)"),
        )
    )


def embedding_kmeans_inertia(spark, sf_dir):
    """Round-6c: K-MEANS INERTIA — per assigned cluster, the exact
    BIGINT sum of squared distances to the centroid plus member count
    (the convergence/elbow metric that closes the M-step → E-step →
    inertia training loop).  One aggregate over the E-step output —
    the iteration cost stays O(N·k·dim) map + O(k) shuffle rows."""
    assign = embedding_kmeans_assign(spark, sf_dir)
    return assign.groupBy("assigned_label").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("dist_e6").cast("bigint").alias("inertia_e6"),
    )


def doc_type_token_ratio(spark, sf_dir):
    """Round-6c: TYPE-TOKEN RATIO per document (lexical-diversity
    quality signal — templated/spam text scores low): distinct words /
    words on the e6 integer grid.  Pure per-document map (array
    distinct inside the row) — zero shuffle beyond the scan."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), t -> t != ''))")
        .cast("bigint")
        .alias("n_tokens"),
        F.expr("size(array_distinct(filter(split(text, ' '), t -> t != '')))")
        .cast("bigint")
        .alias("n_types"),
    ).filter(F.col("n_tokens") > 0).withColumn(
        "ttr_e6", F.expr("CAST((1000000 * n_types) DIV n_tokens AS BIGINT)")
    )


def kg_class_cooccurrence(spark, sf_dir):
    """Round-6c: CLASS-LEVEL CO-OCCURRENCE MATRIX — how often entity
    CLASSES co-occur (the schema-level affinity readout: does Commerce
    cluster with Data?).  The entity-pair frame joins the slim
    (entity, class) table once per side, then one aggregate; class
    pairs are canonicalized (class_a <= class_b) so the matrix is
    upper-triangular with no double counting."""
    pairs = kg_entity_cooccurrence(spark, sf_dir).select(
        "entity_a", "entity_b", "n_docs"
    )
    cls = kg_entity_class(spark, sf_dir).select("entity_id", "class")
    joined = pairs.join(
        cls.select(
            F.col("entity_id").alias("entity_a"), F.col("class").alias("ca")
        ),
        "entity_a",
    ).join(
        cls.select(
            F.col("entity_id").alias("entity_b"), F.col("class").alias("cb")
        ),
        "entity_b",
    )
    return (
        joined.select(
            F.least("ca", "cb").alias("class_a"),
            F.greatest("ca", "cb").alias("class_b"),
            "n_docs",
        )
        .groupBy("class_a", "class_b")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("n_docs").cast("bigint").alias("n_doc_links"),
        )
    )


def entity_degree_moments(spark, sf_dir):
    """Round-6c: DEGREE-ASSORTATIVITY MOMENT SUMS — over directed
    edge endpoints (src-degree x, dst-degree y): n, Σx, Σy, Σxy, Σx²,
    Σy², all exact BIGINT (the Pearson assortativity itself needs a
    sqrt, so the contract publishes the exact moments and the consumer
    divides — the only way the number is bit-identical across
    engines).  One degree aggregate + two slim joins + one 1-row
    aggregate."""
    edges = _coocc_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    ep = (
        edges.join(deg.withColumnRenamed("d", "dx"), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("d").alias("dy")),
            "dst",
        )
    )
    return ep.agg(
        F.count("*").cast("bigint").alias("n_edges"),
        F.sum("dx").cast("bigint").alias("sum_x"),
        F.sum("dy").cast("bigint").alias("sum_y"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sum_xy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sum_x2"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("sum_y2"),
    )


def doc_search_topk(spark, sf_dir):
    """Round-6c: TOP-K DOCUMENT SEARCH — BM25-shaped integer scoring
    for a fixed query ('order data table'): score(d) =
    Σ_t tf(t,d) · bitlen(N div df(t)), the same log2-quantized idf as
    top_terms_tfidf, summed over matching query terms; top-10 by
    (score DESC, doc_id).  Plan: the query-term filter prunes the
    postings BEFORE any join (the inverted-index read pattern — at
    100 TB only the 3 query postings lists move), df joins back on the
    3-row term frame (broadcast), two-phase top-k caps the shuffle at
    k rows per partition."""
    QUERY = ["order", "data", "table"]
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        toks.filter(F.col("term").isin(QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = (
        toks.filter(F.col("term").isin(QUERY))
        .select("doc_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n")).select("n")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("tf") * F.length(F.bin(F.expr("n DIV df")))
            ).cast("bigint").alias("score"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
    )
    local_w = Window.partitionBy("_pid").orderBy(F.desc("score"), F.asc("doc_id"))
    survivors = (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(local_w))
        .filter(F.col("_lr") <= 10)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("doc_id", "score", "n_terms_hit", F.col("rank").cast("int").alias("rank"))
    )


def embedding_kmeans_train(spark, sf_dir):
    """Round-6c: TWO FULL LLOYD ITERATIONS — the actual distributed
    k-means training loop, integer-exact end to end: M-step (exact
    BIGINT centroid sums, truncate-toward-zero mean) → E-step
    (broadcast centroids, integer squared-L2, min-label ties) →
    M-step over the NEW assignment → E-step again; output = the
    round-2 assignment.  Each round is one posexplode aggregate
    (partial sums per (cluster, dim, partition)) + one broadcast
    map — O(N·k·dim) compute, O(k·dim) shuffle rows per round, the
    plan that runs unchanged at 10^12 vectors.  The DuckDB oracle
    unrolls both rounds as CTEs — bit-identical because every
    operation is int64."""
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.expr(
            "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE))"
            " AS BIGINT))"
        ).alias("e3"),
    ).localCheckpoint(eager=False)

    def m_step(assigned):
        return (
            assigned.select("cl", F.posexplode("e3").alias("dim", "val"))
            .groupBy("cl", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("c"))
            .select(
                "cl",
                "dim",
                F.expr(
                    "CAST(CASE WHEN s >= 0 THEN s DIV c"
                    " ELSE -((-s) DIV c) END AS BIGINT)"
                ).alias("m"),
            )
            .groupBy("cl")
            .agg(F.expr("array_sort(collect_list(struct(dim, m)))").alias("cs"))
            .select(
                F.col("cl").alias("c_label"),
                F.expr("transform(cs, s -> s.m)").alias("cent"),
            )
        )

    def e_step(cents):
        dist = F.expr(
            "aggregate(zip_with(e3, cent, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        scored = v.crossJoin(F.broadcast(cents)).select(
            "vec_id", "e3", "c_label", dist.alias("dist")
        )
        return (
            scored.groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "c_label")).alias("best"),
                # every row of a vec_id group carries the SAME e3 (the
                # vector replicated k ways) — first() is deterministic
                F.first("e3").alias("e3"),
            )
            .select(
                "vec_id",
                "e3",
                F.col("best.c_label").cast("int").alias("cl"),
                F.col("best.dist").cast("bigint").alias("dist"),
            )
        )

    a1 = e_step(m_step(v.select(F.col("label").alias("cl"), "e3")))
    a2 = e_step(m_step(a1.select("cl", "e3")))
    return a2.select(
        "vec_id",
        F.col("cl").alias("assigned_label"),
        F.col("dist").alias("dist_e6"),
    )


def tpch_q5(spark, sf_dir):
    """Round-6c: TPC-H Q5 shape — local-supplier revenue per nation
    (customer and supplier in the SAME nation), 6-table join:
    region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier.
    Catalyst broadcasts every dimension (region/nation/customer/
    supplier at fixture scale; on a real corpus AQE keeps the small
    ones broadcast and shuffles the big ones) so the fact table
    streams through BroadcastHashJoins — the canonical star-join plan.
    Revenue on the e6 integer grid from the raw doubles, floor AFTER
    the per-row product like revenue_by_nation."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = _t(spark, sf_dir, "supplier")
    rev = F.expr(
        "CAST(floor(1000000 * l_extendedprice * (1 - l_discount)) AS BIGINT)"
    )
    j = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.select("n_name", "r_name", rev.alias("rev_e6"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("rev_e6").cast("bigint").alias("revenue_e6"),
            F.count("*").cast("bigint").alias("n_lineitems"),
        )
    )


def scd2_user_state(spark, sf_dir):
    """Round-6: SCD Type-2 dimension history — materialize the events
    change stream into valid-from/valid-to interval rows per user (the
    standard warehouse CDC pattern: consecutive runs of the same
    event_type collapse into one versioned row; the open run carries
    valid_to_us = -1 and is_current = 1).

    Scale shape: ONE shuffle on user_id serves every step — the
    run-boundary lag, the running-sum run_id, the per-run aggregate
    (same key prefix), and the valid_to lead all ride the same
    hash(user_id) partitioning; no sequence or array ever enters a
    shuffle row.  At 10^12 events this is a single repartition plus
    linear window work per user."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    e = e.withColumn("prev_type", F.lag("event_type").over(w)).withColumn(
        "chg",
        F.when(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    e = e.withColumn(
        "run_id",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    runs = e.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("state"),
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    wr = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("valid_from_us").over(wr)
    return runs.select(
        "user_id",
        "run_id",
        "state",
        "valid_from_us",
        F.coalesce(nxt, F.lit(-1).cast("bigint")).alias("valid_to_us"),
        "n_events",
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


def kg_entity_provenance(spark, sf_dir):
    """Round-6: per-entity provenance summary — for every canonical
    proxy, how many mentions/documents/sources support it and the
    first/last supporting doc (the spindle-style provenance record a
    store consumer uses to audit where a proxy came from).

    Scale shape: one join of mentions to the (norm_text → label) frame,
    one join to the per-label entity ids, then a single groupBy on
    entity_id — all linear in mention count; the distinct-doc/source
    counts are per-group aggregates, never a global distinct."""
    m, labels = _labels(spark, sf_dir)
    members = _members(spark, sf_dir)
    eids = members.select("label", "entity_id").distinct()
    mm = (
        m.join(labels.withColumnRenamed("node", "norm_text"), "norm_text")
        .withColumnRenamed("label", "root")
        .join(eids.withColumnRenamed("label", "root"), "root")
    )
    return mm.groupBy("entity_id").agg(
        F.count("*").cast("bigint").alias("n_mentions"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
    )


def dedup_winnow_pairs(spark, sf_dir):
    """Round-6: winnowing near-verbatim pair detection (the MOSS
    fingerprint scheme) — per document, every full trailing window of
    WINNOW_W consecutive positional 3-gram codes selects its minimum;
    documents sharing selected fingerprints become candidate pairs with
    their shared-fingerprint count.  Winnowing's guarantee (any
    verbatim run of WINNOW_W+2 tokens shares >= 1 fingerprint) makes
    this the *recall-bounded* verbatim-overlap detector, at ~2/(w+1)
    of the full shingle mass.

    Scale shape: slim (doc_id, pos, code) rows through the per-doc
    ROWS-frame window; pair enumeration only on the winnowed subset,
    with codes above WINNOW_MAX_DF docs excluded as boilerplate
    band-stops (the hot-key cap), so no code contributes more than
    MAX_DF^2 pairs."""
    from . import dedup

    docs = _t(spark, sf_dir, "documents")
    fps = dedup.winnow_fingerprints(docs)
    dfc = fps.groupBy("code").agg(F.count("*").cast("bigint").alias("df"))
    keep = dfc.filter(
        (F.col("df") >= 2) & (F.col("df") <= G.WINNOW_MAX_DF)
    ).select("code")
    a = fps.join(keep, "code").alias("a")
    b = fps.join(keep, "code").alias("b")
    return (
        a.join(
            b,
            (F.col("a.code") == F.col("b.code"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )


def kg_void_summary(spark, sf_dir):
    """Round-6: VoID dataset descriptor (the W3C VoID statistics a
    Twine-style store publishes alongside the graph): triple count,
    distinct subjects / predicates / objects, distinct classes in use
    and entity (proxy) count — one summary row.

    Scale shape: one pass over the distinct triple set; the four
    COUNT(DISTINCT ...) columns are a single expand-aggregate (Spark
    plans multi-distinct via expand, still one shuffle); no driver
    iteration."""
    from .pipeline import run_pipeline_cached

    t = run_pipeline_cached(spark, sf_dir).triples
    return t.agg(
        F.count("*").cast("bigint").alias("n_triples"),
        F.countDistinct("s").cast("bigint").alias("n_subjects"),
        F.countDistinct("p").cast("bigint").alias("n_predicates"),
        F.countDistinct("o").cast("bigint").alias("n_objects"),
        F.countDistinct(
            F.when(F.col("p") == G.P_TYPE, F.col("o"))
        ).cast("bigint").alias("n_classes"),
        F.countDistinct(
            F.when(
                F.col("s").startswith(G.ENTITY_IRI_PREFIX), F.col("s")
            )
        ).cast("bigint").alias("n_entities"),
    )


def kg_graph_hash(spark, sf_dir):
    """Round-6: per-graph canonical content hash — the graph-identity
    primitive behind change detection and replica verification (does
    graph g hold byte-identical content on two stores without shipping
    the triples?).  Each distinct quad renders to its canonical string
    (s|p|o|kind|lang|datatype, NULL fields as '') and folds through the
    grammar's char-level rolling hash; per-graph combine is BIT_XOR —
    commutative and overflow-free, so the hash is independent of
    partitioning, task order, and row order by construction.

    Scale shape: one distinct + one aggregate, both keyed by g; the
    combine is associative so map-side partials apply.  No arrays, no
    driver iteration."""
    from .pipeline import run_pipeline_cached

    q = run_pipeline_cached(spark, sf_dir).quads
    canon = (
        "concat_ws('|', g, s, p, o, o_kind,"
        " coalesce(o_lang, ''), coalesce(o_datatype, ''))"
    )
    return (
        q.select(
            "g",
            F.expr(_charcode_expr(canon)).alias("h"),
        )
        .distinct()
        .groupBy("g")
        .agg(
            F.count("*").cast("bigint").alias("n_quads"),
            F.expr("bit_xor(h)").cast("bigint").alias("graph_hash"),
        )
    )


def event_ewma(spark, sf_dir):
    """Round-6: bounded-lookback exponential moving average per user —
    the smoothing operator monitoring stacks apply to event values.
    Weights are powers of two over the trailing 8 events
    (2^7 for the current row down to 2^0 for lag 7), so numerator and
    denominator are exact BIGINTs on the e6 grid and the truncating
    integer division is identical in Spark and DuckDB (values are
    non-negative by fixture construction).  A true infinite-memory EWMA
    is a linear recurrence no engine's window frame expresses without
    exploding weights; the 8-tap truncation keeps >99.2% of the mass
    (sum 2^0..2^7 vs the geometric tail) and stays integer-exact.

    Scale shape: ONE user_id shuffle serves all eight lag() columns
    (same window spec); no self-joins, no state."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        e6(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    num = None
    den = None
    for k in range(8):
        lv = F.lag("v", k).over(w) if k else F.col("v")
        wt = F.lit(1 << (7 - k)).cast("bigint")
        term = F.coalesce(lv * wt, F.lit(0).cast("bigint"))
        mask = F.when(lv.isNotNull(), wt).otherwise(F.lit(0).cast("bigint"))
        num = term if num is None else num + term
        den = mask if den is None else den + mask
    return base.select(
        "user_id",
        "event_id",
        num.cast("bigint").alias("_num"),
        den.cast("bigint").alias("_den"),
    ).selectExpr(
        "user_id", "event_id", "CAST(_num DIV _den AS BIGINT) AS ewma_e6"
    )


def tpch_q4(spark, sf_dir):
    """Round-6: TPC-H Q4 shape — order-priority checking: count the
    orders of one quarter that had at least one LATE lineitem
    (l_shipdate more than 60 days after the order date; the fixture
    lineitem has no commit/receipt dates so lateness is vs the order
    date).  The EXISTS decorrelates to a LEFT SEMI join with the
    non-equi lateness predicate INSIDE the join condition, so the
    probe side never materializes matched multiplicity — the shape
    that distinguishes semi-join from join+distinct at scale.  Date
    arithmetic on epoch micros (integer-exact both engines)."""
    _ensure_utc(spark)
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    Q_LO = 820454400000000  # 1996-01-01 UTC in micros
    Q_HI = 828316800000000  # 1996-04-01 UTC in micros
    orders = orders.filter(
        (F.col("od_us") >= Q_LO) & (F.col("od_us") < Q_HI)
    )
    late = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("sd_us"),
    )
    sixty_days_us = 60 * 86400 * 1000000
    j = orders.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("sd_us") > F.col("od_us") + F.lit(sixty_days_us)),
        "left_semi",
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


def doc_zorder_key(spark, sf_dir):
    """Round-6: Z-ORDER (Morton) export layout key — the
    multidimensional clustering trick warehouse layouts use so range
    predicates on EITHER dimension prune file-level min/max zones.
    Two 4-bit bucket codes per document — language bucket
    (charcode(lang) mod 16) and log2 length bucket (bitlen(n_chars)
    capped at 15) — bit-interleave into one 8-bit z-key; writing the
    corpus sorted/partitioned by zkey co-locates documents that agree
    on both dimensions.  Pure per-row integer arithmetic with literal
    shift counts: map-only, zero shuffle, identical in both engines."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.expr(_charcode_expr("lang")) % 16).cast("bigint").alias("lang_b"),
        F.least(
            F.length(F.bin(F.col("n_chars"))).cast("bigint"), F.lit(15)
        ).alias("len_b"),
    )
    z = None
    for k in range(4):
        hi = F.expr(f"(shiftright(len_b, {k}) & 1) * {1 << (2 * k + 1)}")
        lo = F.expr(f"(shiftright(lang_b, {k}) & 1) * {1 << (2 * k)}")
        z = hi + lo if z is None else z + hi + lo
    return base.select(
        "doc_id", "lang_b", "len_b", z.cast("bigint").alias("zkey")
    )


def embedding_pq_codes(spark, sf_dir):
    """Round-6: PRODUCT QUANTIZATION codes — the ANN-index compression
    step past scalar quantization (Jégou's PQ: split the vector into M
    subspaces, code each subvector by its nearest per-subspace
    centroid; the vector compresses to M small codes).  Codebooks are
    the label centroids restricted to each subspace (the trained
    M-step reused per 16-dim slice, sign-split DIV means on the e3
    grid); assignment is integer squared-L2, ties -> min label; the
    contract emits (vec_id, subspace, code, sq_err) so both the codes
    AND the exact reconstruction error are pinned.

    Scale shape: the codebook is k*M rows (tiny, broadcast); the
    vector side explodes to M slim subvector rows, scores against the
    broadcast codebook, and the argmin groupBy shuffles only
    (vec_id, m, label, dist) int rows — no vector arrays ride the
    shuffle after the local slice."""
    M, SUB = 4, 16
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE))"
            " AS BIGINT))"
        ).alias("e3"),
    )
    cents = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "label",
            F.expr(
                "transform(embedding, x -> CAST(round(1000 *"
                " CAST(x AS DOUBLE)) AS BIGINT))"
            ).alias("e3"),
        )
        .select("label", F.posexplode("e3").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("val").cast("bigint").alias("s"),
        )
        .select(
            "label",
            "dim",
            F.expr(
                "CAST(CASE WHEN s >= 0 THEN s DIV n"
                " ELSE -((-s) DIV n) END AS BIGINT)"
            ).alias("mean_e3"),
        )
        .withColumn("m", F.expr(f"CAST(dim DIV {SUB} AS INT)"))
        .groupBy("label", "m")
        .agg(
            F.expr("array_sort(collect_list(struct(dim, mean_e3)))").alias(
                "cs"
            )
        )
        .select(
            F.col("label").alias("c_label"),
            "m",
            F.expr("transform(cs, s -> s.mean_e3)").alias("cent"),
        )
    )
    sub = v.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {M - 1}),"
                f" m -> slice(e3, m * {SUB} + 1, {SUB}))"
            )
        ).alias("m", "sub"),
    )
    dist = F.expr(
        "aggregate(zip_with(sub, cent, (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    scored = sub.join(F.broadcast(cents), "m").select(
        "vec_id", "m", "c_label", dist.alias("dist")
    )
    return (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct("dist", "c_label")).alias("best"))
        .select(
            "vec_id",
            F.col("m").cast("int").alias("subspace"),
            F.col("best.c_label").cast("int").alias("code"),
            F.col("best.dist").cast("bigint").alias("sq_err"),
        )
    )


def tpch_q14(spark, sf_dir):
    """Round-6: TPC-H Q14 shape — promotion revenue share: of one
    month's lineitem revenue, the fraction from PROMO-type parts.
    Part is broadcast (a dimension); the month filter prunes the fact
    scan BEFORE the join (pushed to the parquet reader).  The share is
    published on the e6 grid as promo_rev_e6 DIV (total_rev_e6 DIV
    1e6) — a pure-integer form both engines compute identically, and
    one that cannot overflow (multiplying promo_rev_e6 by 1e6 first
    would pass 2^63 on a 100 TB fact table)."""
    _ensure_utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    # filter on the RAW column (plain comparisons push to the parquet
    # reader as PushedFilters; a unix_micros() wrapper would not)
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.expr(
        "CAST(floor(1000000 * l_extendedprice * (1 - l_discount)) AS BIGINT)"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.select(
        rev.alias("rev_e6"),
        F.when(F.col("p_type") == "PROMO", rev)
        .otherwise(F.lit(0).cast("bigint"))
        .alias("promo_e6"),
    ).agg(
        F.sum("promo_e6").cast("bigint").alias("promo_rev_e6"),
        F.sum("rev_e6").cast("bigint").alias("total_rev_e6"),
    )
    return agg.selectExpr(
        "promo_rev_e6",
        "total_rev_e6",
        "CAST(promo_rev_e6 DIV (total_rev_e6 DIV 1000000) AS BIGINT)"
        " AS promo_share_e6",
    )


def tpch_q19(spark, sf_dir):
    """Round-6: TPC-H Q19 shape — discounted revenue under an OR of
    brand/size/quantity conjunctions.  The equi key (partkey) carries
    the join; the disjunction stays a post-join filter Catalyst splits:
    the part-only conjuncts (brand OR-list, size >= 1) push into the
    broadcast side's scan, the mixed ones evaluate after the hash
    probe — the shape that verifies disjunctive predicate splitting
    rather than forcing a nested-loop join."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        F.expr(
            "CAST(floor(1000000 * l_extendedprice * (1 - l_discount))"
            " AS BIGINT)"
        ).alias("rev_e6"),
    )
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum("rev_e6").cast("bigint").alias("revenue_e6"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


def kg_store_merge(spark, sf_dir):
    """Round-6: DataFrame-level CDC MERGE into the store
    (rdfio.merge_quads — the Delta-style upsert surface; SPARQL
    INSERT/DELETE DATA covers driver-typed ground quads, this covers
    the pipeline-emitted arbitrarily-large delta frame).  Build a
    per-region nation store, merge one delta that exercises every
    semantic branch — retract existing rows (even nation keys), retract
    an absent quad (no-op), add a duplicate of a surviving quad
    (no-op), add new quads (every 5th key), and add into a graph the
    store has never seen — then read the end state back.  The oracle
    recomputes (base \\ retracts) ∪ adds in DuckDB."""
    import tempfile

    from . import rdfio

    nat = _t(spark, sf_dir, "nation")
    quads = nat.select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    store = tempfile.mkdtemp(prefix="kgspark_merge_")
    rdfio.write_nquads_store(quads, store)

    retracts = quads.filter(
        F.expr("CAST(substring(s, 7) AS BIGINT) % 2 = 0")
    ).withColumn("op", F.lit("retract"))
    ghost = spark.range(1).select(
        F.lit("ex:reg0").alias("g"), F.lit("ex:nat999").alias("s"),
        F.lit("ex:name").alias("p"), F.lit("NOWHERE").alias("o"),
        F.lit("literal").alias("o_kind"), F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"), F.lit("retract").alias("op"),
    )
    dup = quads.filter(F.col("s") == "ex:nat1").withColumn(
        "op", F.lit("add")
    )
    news = nat.filter(F.col("n_nationkey") % 5 == 0).select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:upd").alias("p"),
        F.concat(F.lit("v"), F.col("n_nationkey").cast("string")).alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    ).withColumn("op", F.lit("add"))
    fresh = spark.range(1).select(
        F.lit("ex:regnew").alias("g"), F.lit("ex:meta").alias("s"),
        F.lit("ex:created").alias("p"), F.lit("true").alias("o"),
        F.lit("literal").alias("o_kind"), F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"), F.lit("add").alias("op"),
    )
    delta = retracts.unionByName(ghost).unionByName(dup) \
        .unionByName(news).unionByName(fresh)
    rdfio.merge_quads(spark, delta, store)
    return rdfio.read_nquads_store(spark, store).select("g", "s", "p", "o")


def kg_component_size_hist(spark, sf_dir):
    """Round-6: sameAs-component SIZE DISTRIBUTION — the CC
    observability readout (the number every KG-construction operator
    dashboard watches: a forming giant component shows up here as a
    high bucket long before the closure query melts down).  Bucket =
    bitlen(component size), so bucket k holds sizes in [2^(k-1), 2^k);
    emits component and node counts per bucket.  Linear: one CC label
    aggregate + one bucket aggregate, nothing pairwise."""
    from .pipeline import run_pipeline_cached
    from . import cc as cc_mod

    t = run_pipeline_cached(spark, sf_dir).triples
    e = t.filter(F.col("p") == "owl:sameAs").select(
        F.col("s").alias("norm_a"), F.col("o").alias("norm_b")
    )
    nodes = (
        e.select(F.col("norm_a").alias("node"))
        .unionByName(e.select(F.col("norm_b").alias("node")))
        .distinct()
    )
    labels = cc_mod.connected_components(e, nodes)
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    return (
        sizes.select(
            F.length(F.bin(F.col("size"))).cast("int").alias("bucket"),
            "size",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_components"),
            F.sum("size").cast("bigint").alias("n_nodes"),
        )
    )


def embedding_knn_graph(spark, sf_dir):
    """Round-6: k-NN graph construction over the embedding table (the
    HNSW/GraphSAGE input structure) — see kgspark/ann.py knn_graph for
    the cell-keyed self-join scale shape."""
    from . import ann

    return ann.knn_graph(_t(spark, sf_dir, "embeddings"), k=3)


def nation_coverage_full_join(spark, sf_dir):
    """Round-6: FULL OUTER JOIN shape (the one outer-join variant the
    registry lacked): per-nation customer count vs per-nation supplier
    count, nations missing from either side kept with 0.  Both inputs
    are pre-aggregated BEFORE the join — the full-outer join runs on
    two ≤|nations| frames, never on raw fact rows (the scale-correct
    order; joining raw then aggregating would shuffle every row twice).
    """
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0))
            .cast("bigint")
            .alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0))
            .cast("bigint")
            .alias("n_suppliers"),
        )
    )


def orders_above_avg(spark, sf_dir):
    """Round-6: scalar-subquery shape — orders pricier than the global
    mean, counted per priority.  The mean is exact integer arithmetic
    (sum_e6 DIV n, one 1-row aggregate broadcast into the filter) so
    the cut line is engine-identical; a float AVG() could flip rows
    sitting exactly on the boundary."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", e6(F.col("o_totalprice")).alias("tp_e6")
    )
    avg = o.agg(
        F.expr("CAST(sum(tp_e6) DIV count(*) AS BIGINT)").alias("avg_e6")
    )
    return (
        o.join(F.broadcast(avg))
        .filter(F.col("tp_e6") > F.col("avg_e6"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("tp_e6").cast("bigint").alias("sum_price_e6"),
        )
    )


def event_trending_daily(spark, sf_dir):
    """Round-6: TIME-BUCKETED TRENDING TOP-K — per epoch-day, the top-3
    event types by count with their ranks (the dashboard "what moved
    today" readout).  Grouped top-k via rn <= k so Spark plans
    WindowGroupLimit: each partition keeps only 3 candidate rows per
    day BEFORE the exchange — at 10^12 events the shuffle carries
    days*types partial counts, never event rows."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
                " DIV 86400000000 AS BIGINT)"
            ).alias("day"),
            "event_type",
        )
        .groupBy("day", "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("day", "event_type", "n", F.col("rank").cast("int").alias("rank"))
    )


def event_value_pctrank(spark, sf_dir):
    """Round-6: integer-exact PERCENT_RANK within group — the
    rank-based feature normalization ML pipelines apply to heavy-tailed
    values (robust to outliers where min-max scaling is not).
    pr_e6 = (rank - 1) * 1e6 DIV (n - 1) entirely in int64; ties share
    the SQL rank() value on both engines, so the contract is
    engine-exact where a float percent_rank() could differ in the last
    ulp."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", e6(F.col("value")).alias("v_e6")
    )
    w = Window.partitionBy("event_type").orderBy("v_e6")
    return (
        ev.withColumn("rk", F.rank().over(w))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
        .selectExpr(
            "event_type",
            "event_id",
            "CAST(CASE WHEN n = 1 THEN 0"
            " ELSE (rk - 1) * 1000000 DIV (n - 1) END AS BIGINT)"
            " AS pctrank_e6",
        )
    )


def kg_store_diff(spark, sf_dir):
    """Round-6: two-store ANTI-ENTROPY DIFF (rdfio.store_diff — the
    replica-repair readout that closes the hash → diff → merge
    replication loop): store A = per-region nation graphs; store B =
    A after a merge that empties reg1 (→ only_a), updates reg3
    (→ changed), and creates regnew (→ only_b); every other region
    graph compares equal WITHOUT its triples ever being shipped —
    the diff exchanges one (graph, count, hash) row per graph."""
    import tempfile

    from . import rdfio

    nat = _t(spark, sf_dir, "nation")
    quads = nat.select(
        F.concat(F.lit("ex:reg"), F.col("n_regionkey").cast("string")).alias("g"),
        F.concat(F.lit("ex:nat"), F.col("n_nationkey").cast("string")).alias("s"),
        F.lit("ex:name").alias("p"),
        F.col("n_name").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"),
    )
    store_a = tempfile.mkdtemp(prefix="kgspark_diff_a_")
    store_b = tempfile.mkdtemp(prefix="kgspark_diff_b_")
    rdfio.write_nquads_store(quads, store_a)
    rdfio.write_nquads_store(quads, store_b)
    retract_reg1 = quads.filter(F.col("g") == "ex:reg1").withColumn(
        "op", F.lit("retract")
    )
    upd_reg3 = spark.range(1).select(
        F.lit("ex:reg3").alias("g"), F.lit("ex:meta").alias("s"),
        F.lit("ex:touched").alias("p"), F.lit("yes").alias("o"),
        F.lit("literal").alias("o_kind"), F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"), F.lit("add").alias("op"),
    )
    fresh = spark.range(1).select(
        F.lit("ex:regnew").alias("g"), F.lit("ex:meta").alias("s"),
        F.lit("ex:created").alias("p"), F.lit("true").alias("o"),
        F.lit("literal").alias("o_kind"), F.lit("").alias("o_lang"),
        F.lit("").alias("o_datatype"), F.lit("add").alias("op"),
    )
    rdfio.merge_quads(
        spark, retract_reg1.unionByName(upd_reg3).unionByName(fresh), store_b
    )
    return rdfio.store_diff(spark, store_a, store_b)


def event_stats_unpivot(spark, sf_dir):
    """Round-6: UNPIVOT (melt) shape — the wide per-type stats row
    rotated into (event_type, metric, value_e6) long format, the
    transform every metrics exporter applies before shipping to a
    time-series store.  Map-only after the aggregate: unpivot is a
    generate, no extra shuffle."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", e6(F.col("value")).alias("v_e6")
    )
    wide = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("v_e6").cast("bigint").alias("sum_e6"),
        F.min("v_e6").cast("bigint").alias("min_e6"),
        F.max("v_e6").cast("bigint").alias("max_e6"),
    )
    return wide.unpivot(
        "event_type",
        ["n_events", "sum_e6", "min_e6", "max_e6"],
        "metric",
        "value_e6",
    )


def part_price_quartiles(spark, sf_dir):
    """Round-6: NTILE window shape — parts binned into price quartiles
    (the bucketing step behind banded pricing reports and stratified
    samplers).  The ordering carries the unique p_partkey tie-break,
    so every row's bucket is total-order determined and engine-exact;
    emitted as per-quartile aggregates (count + min/max price) so the
    contract pins every bucket boundary."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", e6(F.col("p_retailprice")).alias("price_e6")
    )
    w = Window.orderBy("price_e6", "p_partkey")
    return (
        p.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.min("price_e6").cast("bigint").alias("min_price_e6"),
            F.max("price_e6").cast("bigint").alias("max_price_e6"),
        )
        .select(F.col("quartile").cast("int").alias("quartile"),
                "n_parts", "min_price_e6", "max_price_e6")
    )


def priority_revenue_share(spark, sf_dir):
    """Round-6: RATIO-TO-REPORT window shape — each priority's share
    of total order revenue, the denominator an unpartitioned window
    sum over the (5-row) aggregate, share on the integer e6 grid via
    the overflow-safe grp DIV (total DIV 1e6) form (see tpch_q14)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", e6(F.col("o_totalprice")).alias("tp_e6")
    )
    grp = o.groupBy("o_orderpriority").agg(
        F.sum("tp_e6").cast("bigint").alias("rev_e6")
    )
    w = Window.partitionBy()
    return grp.select(
        "o_orderpriority",
        "rev_e6",
        F.expr(
            "CAST(rev_e6 DIV (sum(rev_e6) OVER () DIV 1000000) AS BIGINT)"
        ).alias("share_e6"),
    )


def revenue_grouping_sets(spark, sf_dir):
    """Round-6: explicit GROUPING SETS shape (distinct from the
    existing ROLLUP/CUBE queries: an arbitrary set list, here the two
    single-dimension reports ((nation), (priority)) computed in ONE
    pass over the join — Spark expands both groupings from the same
    shuffle read instead of scanning twice).  GROUPING() flags
    disambiguate the NULL-keyed rows exactly as in the cube query."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_orderpriority", e6(F.col("o_totalprice")).alias("tp_e6"))
    )
    j.createOrReplaceTempView("_rgs_j")
    return spark.sql(
        """
        SELECT n_name, o_orderpriority,
               CAST(grouping(n_name) AS INT) AS g_nation,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(sum(tp_e6) AS BIGINT) AS rev_e6,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM _rgs_j
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority))
        """
    )


def kg_parse_error_stats(spark, sf_dir):
    """Round-6: INGEST ERROR OBSERVABILITY — the drop-rate metric over
    the quarantine policy (the parse kernels silently drop malformed
    lines; production ingest needs that rate on a dashboard, not
    silent).  Build N-Quads text from the nation table, deterministically
    corrupt the lines of every 7th nation key, run the real
    mapInPandas N-Quads parser, and report total / parsed / dropped /
    drop-rate-e6 in one row.  The oracle recomputes the same counts
    arithmetically — pinning that the parser drops EXACTLY the
    malformed lines, no more, no fewer."""
    from . import rdfio

    nat = _t(spark, sf_dir, "nation")
    good = F.concat(
        F.lit("<http://ex/nat"), F.col("n_nationkey").cast("string"),
        F.lit("> <http://ex/name> \""), F.col("n_name"),
        F.lit("\" <http://ex/reg"), F.col("n_regionkey").cast("string"),
        F.lit("> ."),
    )
    lines = nat.select(
        F.when(F.col("n_nationkey") % 7 == 0, F.lit("<bad"))
        .otherwise(good)
        .alias("line")
    ).localCheckpoint(eager=False)
    parsed = rdfio.parse_nquads(lines)
    totals = lines.agg(F.count("*").cast("bigint").alias("n_lines"))
    ok = parsed.agg(F.count("*").cast("bigint").alias("n_parsed"))
    return (
        totals.crossJoin(ok)
        .selectExpr(
            "n_lines",
            "n_parsed",
            "CAST(n_lines - n_parsed AS BIGINT) AS n_dropped",
            "CAST((n_lines - n_parsed) * 1000000 DIV n_lines AS BIGINT)"
            " AS drop_rate_e6",
        )
    )


def user_event_diversity(spark, sf_dir):
    """Round-6: BEHAVIORAL DIVERSITY per user — the log2-quantized
    entropy sum Σ cnt·bitlen(total DIV cnt) over the user's event-type
    distribution (the same integer log-domain convention as term_pmi /
    tf-idf: a float Shannon entropy flaps across engines at ulp
    boundaries, bitlen never does).  A uniform user scores high, a
    single-type user scores cnt·bitlen(1)=cnt — the bot-detection /
    segmentation feature.  Two map-side-combined aggregates, linear."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    tot = cnt.groupBy("user_id").agg(
        F.sum("cnt").alias("total"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    return (
        cnt.join(tot, "user_id")
        .select(
            "user_id",
            "n_types",
            "total",
            (
                F.col("cnt")
                * F.length(F.bin(F.expr("total DIV cnt")))
            ).alias("term"),
        )
        .groupBy("user_id")
        .agg(
            F.first("n_types").alias("n_types"),
            F.first("total").cast("bigint").alias("n_events"),
            F.sum("term").cast("bigint").alias("diversity_bits"),
        )
    )


def embedding_dim_stats(spark, sf_dir):
    """Round-6: PER-DIMENSION FEATURE STATISTICS — the standardization
    table (mean + exact second-moment sums per dimension) a
    normalization / whitening preprocessing step consumes.  All exact
    BIGINT on the e3 grid: mean is the sign-split truncating DIV, and
    variance is published as the exact moment pair (Σx, Σx²) because
    finishing it needs a division the consumer should do in its own
    precision (the degree-assortativity convention).  One posexplode +
    one map-side-combined aggregate on (dim): 64 reducer groups at any
    corpus size."""
    v = _t(spark, sf_dir, "embeddings").select(
        F.expr(
            "transform(embedding, x -> CAST(round(1000 * CAST(x AS DOUBLE))"
            " AS BIGINT))"
        ).alias("e3")
    )
    return (
        v.select(F.posexplode("e3").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sum_e3"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_sq_e6"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            "sum_e3",
            "sum_sq_e6",
            F.expr(
                "CAST(CASE WHEN sum_e3 >= 0 THEN sum_e3 DIV n"
                " ELSE -((-sum_e3) DIV n) END AS BIGINT)"
            ).alias("mean_e3"),
        )
    )


def event_hourly_seasonality(spark, sf_dir):
    """Round-6: HOUR-OF-DAY SEASONALITY profile per event type — the
    modular-time grouping behind load forecasting and anomaly
    baselines (distinct from the hypertable rollup, which buckets
    CALENDAR time; this folds all days onto one 24-hour cycle).
    hour = (epoch_us DIV 3600e6) % 24 — pure integer, UTC-pinned.
    One map-side-combined aggregate, at most types×24 groups."""
    _ensure_utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.expr(
                "CAST((unix_micros(CAST(ts AS TIMESTAMP))"
                " DIV 3600000000) % 24 AS INT)"
            ).alias("hour"),
            e6(F.col("value")).alias("v_e6"),
        )
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("v_e6").cast("bigint").alias("sum_value_e6"),
        )
    )


def kg_attr_coverage(spark, sf_dir):
    """Round-6: KG COMPLETENESS metric — per-predicate coverage of the
    property index: for each target predicate, how many entities carry
    a value and what fraction of the full entity set that is (e6
    grid).  The quality readout a KG build publishes per release
    (dropping coverage on a predicate flags an upstream rule or
    extraction regression).  Linear: one aggregate over the property
    index + the (1-row) entity count broadcast."""
    m, labels = _labels(spark, sf_dir)
    props = gen.entity_props(m, labels)
    n_entities = (
        gen.entity_membership(m, labels)
        .select("entity_id")
        .distinct()
        .agg(F.count("*").cast("bigint").alias("n_entities"))
    )
    per_pred = props.groupBy("pred").agg(
        F.count_distinct("entity_id").cast("bigint").alias("n_with_value")
    )
    return per_pred.join(F.broadcast(n_entities)).selectExpr(
        "pred",
        "n_with_value",
        "n_entities",
        "CAST(n_with_value * 1000000 DIV n_entities AS BIGINT)"
        " AS coverage_e6",
    )


def orders_monthly_growth(spark, sf_dir):
    """Round-6: MONTH-OVER-MONTH growth — revenue per calendar month
    with the signed growth rate vs the previous month.  The division
    is the SIGN-SPLIT integer form (Spark DIV truncates toward zero,
    DuckDB // floors — they disagree on negatives, so the operator
    spec pins trunc-toward-zero explicitly).  Months on the epoch
    grid via UTC year*12+month; one global-window lag over an
    already-aggregated months frame (tiny)."""
    _ensure_utc(spark)
    o = _t(spark, sf_dir, "orders").select(
        F.expr(
            "year(CAST(o_orderdate AS TIMESTAMP)) * 12"
            " + month(CAST(o_orderdate AS TIMESTAMP)) - 1"
        ).cast("bigint").alias("month_idx"),
        e6(F.col("o_totalprice")).alias("tp_e6"),
    )
    monthly = o.groupBy("month_idx").agg(
        F.sum("tp_e6").cast("bigint").alias("rev_e6")
    )
    w = Window.partitionBy().orderBy("month_idx")
    return (
        monthly.withColumn("prev_e6", F.lag("rev_e6").over(w))
        .selectExpr(
            "month_idx",
            "rev_e6",
            # DIV-first (the tpch_q14 overflow-safe convention):
            # multiplying a monthly revenue sum by 1e6 first would pass
            # 2^63 on a 100 TB fact table
            "CAST(CASE WHEN prev_e6 IS NULL THEN NULL"
            " WHEN rev_e6 >= prev_e6 THEN"
            "   (rev_e6 - prev_e6) DIV (prev_e6 DIV 1000000)"
            " ELSE -((prev_e6 - rev_e6) DIV (prev_e6 DIV 1000000))"
            " END AS BIGINT) AS growth_e6",
        )
    )


def kg_label_collisions(spark, sf_dir):
    """Round-6: NEAR-NAME AMBIGUITY metric — distinct entities whose
    display labels share a 4-char prefix (exact-label collisions are
    structurally impossible here: CC canonicalization mints one entity
    per normalized name, verified by this query's development — so the
    actionable readout is the near-name group feeding a human
    disambiguation queue).  One aggregate over the attrs index,
    collision groups only."""
    m, labels = _labels(spark, sf_dir)
    attrs = gen.entity_attrs_df(m, labels)
    return (
        attrs.select(
            F.expr("substring(label, 1, 4)").alias("label_prefix"),
            "entity_id",
        )
        .groupBy("label_prefix")
        .agg(F.count_distinct("entity_id").cast("bigint").alias("n_entities"))
        .filter(F.col("n_entities") > 1)
    )


def doc_prefix_dup_groups(spark, sf_dir):
    """Round-6: PREFIX-DUPLICATE detection — documents sharing an
    identical first-200-char prefix (the truncation-duplicate class
    exact whole-text dedup misses: one copy cut off mid-stream, a
    retry that appended).  Group key is the charcode rolling hash of
    the prefix — slim BIGINT rows through the shuffle, never text —
    and groups publish size + min doc id (the keeper rule).  Linear;
    collision groups only."""
    docs = _t(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.expr(_charcode_expr("substring(text, 1, 200)")).alias("pcode"),
    )
    return (
        pref.groupBy("pcode")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )
