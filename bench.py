"""Benchmark harness (driver contract: prints ONE JSON line).

Default mode: runs the headline pipeline + representative operator
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints

    {"metric": "kg_pipeline_e2e", "value": <sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

Scaling mode (``python bench.py --scaling``, BASELINE.md protocol):
the same job at local[N] vs local[4N] (the sandbox stand-in for N vs
4N executors; default N = $SPARK_GRAFT_SCALE_N = 1) over the SAME
input, in separate child processes (a local master can't be resized
in-process).  The two levels run INTERLEAVED (lo, hi, lo, hi, …) for
$SPARK_GRAFT_SCALE_PASSES (default 5) passes so a multi-minute noisy-
neighbor window hits both levels instead of biasing the ratio; min AND
median efficiency are reported with all raw samples.  N defaults to 1
because measured raw-CPU scaling on this box is linear only up to ~8
concurrent workers (SMT/host oversubscription above that — see
BENCH/BASELINE.md) — both levels must sit inside the hardware's linear
region for the efficiency number to measure the ENGINE rather than the
VM.

The measured job is the per-document extraction pipeline
(spans → mention kernel → base triples + distinct) over the sf dir's
documents deterministically replicated $SPARK_GRAFT_SCALE_REP
(default 32) times with offset doc_ids: sf0.1 alone cannot occupy the
cores, and at the 10^12-doc design point per-document work is ~all of
the compute — the graph-global link+CC tail runs over the (saturating)
distinct-mention-text graph, constant in corpus size; its cost is
reported separately in the default bench mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REP_DEFAULT = 32


def _scaled_documents(spark, sf_dir: str, rep: int):
    """documents × rep with offset doc_ids — pure function of the input
    (doc_id' = doc_id + i·10^9; 10^9 % MEDIA_MOD == 0 keeps media refs
    replica-invariant), so both parallelism levels see identical bytes."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if rep <= 1:
        return docs
    return (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r").cast("long") * 1_000_000_000)
        .drop("_r")
    )


def _varied_documents(spark, sf_dir: str, rep: int):
    """documents × rep with DISTINCT content per replica: every token
    gets a replica-salt prefix, so similarity structure WITHIN a
    replica is preserved while cross-replica pairs vanish — modeling
    rep× independent corpus growth.  (Replicating identical bytes —
    _scaled_documents — is right for the per-document extract pipeline
    but pathological for similarity joins: an all-duplicates corpus's
    pair output grows ×rep², a different workload than scale-up.)"""
    from pyspark.sql import functions as F

    import string

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if rep <= 1:
        return docs
    # Per-replica CAESAR ROTATION of the alphabet — a bijection on
    # characters, so every replica has exactly the original's token
    # diversity, length structure, and within-replica similarity graph,
    # while token codes are disjoint across replicas.  (A constant
    # multi-char token prefix instead COLLAPSES the engine's
    # first-two-chars tokcode space per replica and turns the
    # similarity joins into an artificial near-all-pairs corpus —
    # measured ×80 wall before this fix.)
    alpha = string.ascii_lowercase
    salted = F.col("text")
    for r in range(1, min(rep, 26)):
        rot = alpha[r:] + alpha[:r]
        salted = F.when(
            F.col("_r") % 26 == r, F.translate(F.col("text"), alpha, rot)
        ).otherwise(salted)
    return (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r").cast("long") * 1_000_000_000)
        .withColumn("text", salted)
        .drop("_r")
    )


def _staged_pipeline(spark, docs_df, emb_df, timings, stages):
    from pyspark.sql import functions as F

    from kgspark import cc as cc_mod
    from kgspark import extract, fixtures, link
    from kgspark import generate as gen
    from kgspark.pipeline import repartition_docs

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        stages[name] = {"rows": n, "sec": round(dt, 3),
                        "rows_per_sec": round(n / dt, 1) if dt > 0 else None}
        return n

    t_start = time.time()
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # repartition the RAW documents first — if the exchange sits above
    # the span-synthesis projection, synthesis runs in the (few) input
    # file partitions instead of across the cluster
    docs_df = repartition_docs(docs_df, n_parts)
    flat = fixtures.flat_spans(fixtures.with_spans(docs_df)).localCheckpoint(
        eager=False
    )
    mentions = extract.mentions_df(flat).localCheckpoint(eager=False)
    n_mentions = timed("extract_mentions", lambda: mentions.count())
    timed("media_features", lambda: extract.media_features_df(flat).count())

    from kgspark import grammar as G

    edges = link.scored_edges(
        mentions, emb_df, vocab=sorted(G.ENTITY_TOKENS)
    ).localCheckpoint(eager=False)
    timed("link_edges", lambda: edges.count())

    holder = {}

    def _cc():
        holder["labels"] = cc_mod.connected_components(
            edges, mentions.select(F.col("norm_text").alias("node")).distinct()
        )
        return holder["labels"].count()

    timed("cc_labels", _cc)
    labels = holder["labels"]

    # same shared-membership shape as pipeline.py: one membership
    # computation feeds the entities AND proxy-triples branches
    members = gen.entity_membership(mentions, labels).localCheckpoint(eager=False)
    timed("entities", lambda: gen.entities_df(mentions, labels, members=members).count())
    base = extract.base_quads(flat, mentions)
    triples = (
        base.select("s", "p", "o")
        .unionByName(gen.proxy_triples(mentions, labels, members=members))
        .dropDuplicates(["s", "p", "o"])
    )
    n_triples = timed("triples_total", lambda: triples.count())
    e2e = time.time() - t_start
    timings["kg_pipeline_e2e"] = round(e2e, 3)
    # doc-parallel portion = everything except the (input-size-constant)
    # graph-global CC loop — the Amdahl split reported for scaling
    timings["doc_parallel_sec"] = round(e2e - timings["cc_labels"], 3)
    return n_mentions, n_triples, e2e


def _run_bench(sf_dir: str, cpus: int, rep: int = 1, with_queries: bool = True,
               passes: int = 2) -> dict:
    """Per-stage MIN over ``passes`` full passes — the sandbox VM has
    ±2× noisy-neighbor windows (documented in BENCH/BASELINE.md §0);
    a single sample can misreport every stage in a bad window.  The
    min is the honest steady-state figure for a deterministic job."""
    from kgspark.session import get_spark
    import kgspark.queries as Q

    spark = get_spark(app_name="kgspark-bench", master=f"local[{cpus}]")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm up

    timings: dict[str, float] = {}
    stages: dict[str, dict] = {}
    bench_query_names = [
        "kg_spans_flat", "kg_media_features", "tpch_q1",
        "revenue_by_nation", "top2_lineitems_per_order",
        "event_type_stats", "dedup_minhash_pairs",
        "dedup_simhash_pairs", "ngram_jaccard_pairs", "langid",
        "ann_topk", "ann_ivf_probe", "embedding_neardup",
        "text_quality", "event_sessions",
        # round-4 store query surface (amortize the memoized
        # pipeline chain across the three)
        "kg_sparql_topk", "kg_sameas_degree",
        "kg_entity_media", "doc_pack_assign",
    ]
    n_mentions = n_triples = 0
    e2e = None
    for pass_i in range(max(passes, 1)):
        t_i: dict[str, float] = {}
        s_i: dict[str, dict] = {}
        docs = _scaled_documents(spark, sf_dir, rep)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_mentions, n_triples, e2e_i = _staged_pipeline(spark, docs, emb, t_i, s_i)

        if with_queries:
            # Pre-warm the memoized (session, sf_dir) labels chain so
            # its one-time materialization cost is reported HERE and
            # not absorbed by whichever store query happens to run
            # first (round-5 bench: kg_entity_media silently paid it).
            # Only the first pass pays; the warm cost is recorded once
            # and kept out of the per-query min-merge below.
            if "labels_chain_warm" not in timings:
                t0 = time.time()
                _m, _labels = Q._labels(spark, sf_dir)
                _labels.count()
                _m.count()
                timings["labels_chain_warm"] = round(time.time() - t0, 3)
            # Odd passes run the list REVERSED: the VM's multi-minute
            # noisy-neighbor windows (BENCH/BASELINE.md §0) otherwise
            # hit the SAME query at the same sequence offset in every
            # pass, defeating the per-query min (r5/r6: the 6× outlier
            # slot wandered between minhash and simhash run-to-run).
            order = (
                bench_query_names if pass_i % 2 == 0
                else list(reversed(bench_query_names))
            )
            for name in order:
                fn = getattr(Q, name)
                t0 = time.time()
                n = fn(spark, sf_dir).count()
                t_i[name] = round(time.time() - t0, 3)
                s_i[name] = {"rows": n, "sec": t_i[name]}

        for k, v in t_i.items():
            if k not in timings or v < timings[k]:
                timings[k] = v
                if k in s_i:
                    stages[k] = s_i[k]
        e2e = min(e2e, e2e_i) if e2e is not None else e2e_i

    return {
        "metric": "kg_pipeline_e2e",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "replication": rep,
        "n_mentions": n_mentions,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / e2e, 1),
        "mentions_per_sec": round(n_mentions / timings["extract_mentions"], 1),
        "doc_parallel_sec": timings["doc_parallel_sec"],
        "stages": stages,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(os.environ.get("SPARK_GRAFT_SCALE_REP", str(REP_DEFAULT)))

    if "--scaling" in sys.argv:
        n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
        n_hi = 4 * n_lo
        passes = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "5"))
        # INTERLEAVE the two levels (lo, hi, lo, hi, …): the host VM's
        # noisy-neighbor windows last minutes — running all-lo then
        # all-hi lets one window bias a single level and therefore the
        # ratio; alternating spreads any window across both levels.
        samples: dict[int, list[dict]] = {n_lo: [], n_hi: []}
        for _ in range(passes):
            for n in (n_lo, n_hi):
                env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                           SPARK_GRAFT_CPUS=str(n),
                           SPARK_GRAFT_SCALE_REP=str(rep))
                out = subprocess.run(
                    [sys.executable, __file__, "--scale-child"], env=env,
                    capture_output=True, text=True, check=True,
                )
                samples[n].append(
                    json.loads(out.stdout.strip().splitlines()[-1])
                )

        def _min(n):
            return min(r["value"] for r in samples[n])

        def _median(n):
            xs = sorted(r["value"] for r in samples[n])
            m = len(xs) // 2
            return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

        t_lo, t_hi = _min(n_lo), _min(n_hi)
        md_lo, md_hi = _median(n_lo), _median(n_hi)
        n_triples = samples[n_lo][0]["n_triples"]
        print(json.dumps({
            "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
            "value": round((t_lo / t_hi) / (n_hi / n_lo), 3),
            "efficiency_median": round((md_lo / md_hi) / (n_hi / n_lo), 3),
            "unit": "ratio",
            "sf": sf_dir,
            "replication": rep,
            "passes": passes,
            "job": "doc-parallel extract (spans→mentions→base triples distinct)",
            f"sec_local{n_lo}": t_lo,
            f"sec_local{n_hi}": t_hi,
            f"sec_median_local{n_lo}": round(md_lo, 3),
            f"sec_median_local{n_hi}": round(md_hi, 3),
            f"samples_local{n_lo}": [r["value"] for r in samples[n_lo]],
            f"samples_local{n_hi}": [r["value"] for r in samples[n_hi]],
            f"throughput_local{n_lo}_triples_per_sec": round(n_triples / t_lo, 1),
            f"throughput_local{n_hi}_triples_per_sec": round(n_triples / t_hi, 1),
            "n_triples": n_triples,
        }))
        return

    if "--scale-child" in sys.argv:
        print(json.dumps(_scale_child(sf_dir, cpus, rep)))
        return

    if "--stress" in sys.argv:
        print(json.dumps(_stress(sf_dir, cpus)))
        return

    res = _run_bench(sf_dir, cpus, rep=1)
    # Full detail (per-stage rows/sec dicts) on an EARLIER line; the
    # LAST line is a compact summary the driver's stdout tail window is
    # guaranteed to capture whole (round-3 verdict #4: the fat line got
    # truncated mid-key and BENCH_r03.json recorded parsed: null).
    print(json.dumps(res))
    compact = {
        "metric": res["metric"],
        "value": res["value"],
        "unit": res["unit"],
        "sf": res["sf"],
        "cpus": res["cpus"],
        "n_triples": res["n_triples"],
        "triples_per_sec": res["triples_per_sec"],
        "doc_parallel_sec": res["doc_parallel_sec"],
        "queries": res["queries"],
    }
    print(json.dumps(compact))


def _scale_child(sf_dir: str, cpus: int, rep: int) -> dict:
    """One measurement of the doc-parallel extract job: fixed 32
    shuffle/data partitions at every level (identical work), input
    prep (replication + repartition) excluded from the timed window.

    The timed job is the production DAG shape (pipeline.py): spans →
    mention kernel → base triples → distinct → count as ONE action,
    with the span table shared via a LAZY localCheckpoint — the eager
    per-stage materialization barriers of the old protocol were a bench
    artifact (block-manager traffic + GC the real pipeline doesn't do)
    that contends hardest exactly on the multi-core side, understating
    engine scaling."""
    from kgspark.session import get_spark
    from kgspark import extract, fixtures
    from kgspark.pipeline import repartition_docs

    spark = get_spark(app_name="kgspark-scale", master=f"local[{cpus}]",
                      shuffle_partitions=32)
    docs = _scaled_documents(spark, sf_dir, rep)
    rp = repartition_docs(docs, 32).localCheckpoint(eager=True)
    t0 = time.time()
    flat = fixtures.flat_spans(fixtures.with_spans(rp)).localCheckpoint(
        eager=False
    )
    n = extract.base_triples(flat, extract.mentions_df(flat)).count()
    dt = time.time() - t0
    return {
        "value": round(dt, 3),
        "cpus": cpus,
        "replication": rep,
        "n_triples": n,
        "triples_per_sec": round(n / dt, 1),
    }


def _stress(sf_dir: str, cpus: int) -> dict:
    """Scale-stress one notch up (round-4 verdict #8): the headline
    extract pipeline at ×1 vs ×REP identical-content replication
    (per-document work — the 100 TB-dominant term), and the dedup/text
    family at ×1 vs ×REP content-VARIED replication (independent-corpus
    growth; see _varied_documents).  REP defaults to 10 — sf0.1×10 ≈
    sf1-equivalent.  Reports per-stage times at both levels and the
    time ratio; on a fixed-size machine linear data scaling is ratio ≈
    REP, so a stage is flagged when ratio > 2·REP (a skew/memory cliff
    the sf0.1 numbers hide)."""
    from pyspark.sql import functions as F

    from kgspark.session import get_spark
    from kgspark import dedup as D
    from kgspark import textstats as TS

    rep = int(os.environ.get("SPARK_GRAFT_STRESS_REP", "10"))
    # local mode runs everything in ONE JVM: the ×REP working set
    # (replicated spans + lazy localCheckpoint blocks) needs a heap
    # sized for it — the default 8g GCLocker-thrashes at ×10/32 threads
    # (measured; the first stress finding).  On a real cluster this is
    # ordinary per-executor memory, not driver memory.
    os.environ.setdefault("KGSPARK_DRIVER_MEM", "48g")
    spark = get_spark(app_name="kgspark-stress", master=f"local[{cpus}]")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # JVM/codegen warm-up: one untimed ×1 pass so the ×1 sample is not
    # paying first-job compilation that the ×rep sample amortizes
    _staged_pipeline(spark, _scaled_documents(spark, sf_dir, 1), emb, {}, {})
    levels: dict[str, dict] = {}
    for r in (1, rep):
        timings: dict[str, float] = {}
        stages: dict[str, dict] = {}
        docs = _scaled_documents(spark, sf_dir, r)
        _staged_pipeline(spark, docs, emb, timings, stages)

        vd = _varied_documents(spark, sf_dir, r).localCheckpoint(eager=True)

        def timed(name, fn):
            t0 = time.time()
            n = fn()
            dt = round(time.time() - t0, 3)
            timings[name] = dt
            stages[name] = {"rows": n, "sec": dt}

        timed("dedup_minhash_pairs", lambda: D.minhash_lsh_pairs(vd).count())
        timed("dedup_simhash_pairs", lambda: D.simhash_pairs(vd).count())
        timed("ngram_jaccard_pairs", lambda: D.ngram_jaccard_pairs(vd).count())
        timed("langid", lambda: TS.langid(spark, vd).count())

        # --- store / SPARQL surface (round-6 verdict #7) ------------
        # GRAPH-pruned store scan: the store grows ×r (same ≤512-graph
        # partition set — the 1e9 doc_id offset is ≡0 mod 512, so
        # replicas land in existing graphs), and the pruned query must
        # track ONE graph's growth, never the store's.
        import shutil
        import tempfile

        from kgspark import rdfio
        from kgspark import sparql as SQ

        store = tempfile.mkdtemp(prefix="kgspark_stress_store_")
        quads = docs.select(
            F.concat(F.lit("doc://"),
                     F.pmod(F.col("doc_id"), F.lit(512)).cast("string"))
            .alias("g"),
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string"))
            .alias("s"),
            F.lit("ex:from").alias("p"),
            F.col("source").alias("o"),
        )
        timed("store_write", lambda: (
            rdfio.write_nquads_store(quads, store), quads.count())[1])
        timed("store_sparql_pruned", lambda: SQ.store_sparql(
            spark, store, "SELECT ?s ?o WHERE { ?s ex:from ?o }",
            graph="doc://7").count())
        timed("store_sparql_full", lambda: SQ.store_sparql(
            spark, store,
            "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s ex:from ?o } "
            "GROUP BY ?o").count())
        shutil.rmtree(store)

        # SPARQL path closure at scale: the ×1 pipeline's sameAs graph
        # replicated r× into DISJOINT node namespaces (components ×r,
        # component SIZES preserved — independent-corpus growth, the
        # shape Caesar-varied docs can't produce because rotation
        # breaks entity-token detection).  Cost must track components,
        # i.e. stay ~linear in r.
        from kgspark.pipeline import run_pipeline_cached

        t1 = run_pipeline_cached(spark, sf_dir).triples
        ri = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_r")
        is_same = F.col("p") == "owl:sameAs"
        reptri = (
            t1.select("s", "p", "o", ri)
            .select(
                F.concat("s", F.lit("#r"), F.col("_r")).alias("s"),
                "p",
                F.when(is_same,
                       F.concat("o", F.lit("#r"), F.col("_r")))
                .otherwise(F.col("o")).alias("o"),
            )
        )
        timed("sparql_path_star", lambda: SQ.sparql_select(
            reptri,
            """
            SELECT DISTINCT ?x ?y WHERE {
              ?x rdf:type ex:Commerce .
              ?x owl:sameAs* ?y .
              ?y ex:score ?n
            }
            """).count())
        levels[f"x{r}"] = {"timings": timings, "stages": stages}

    # Closure guard must TRIP on a giant component: one 20k-node sameAs
    # chain is a single symmetric component ⇒ Σ|comp|² ≈ 4·10⁸ >
    # MAX_CLOSURE_PAIRS — the Σ|comp|² PRE-check (bgp.py
    # symmetric_closure_pairs) has to raise from the component-size
    # aggregate BEFORE materializing any of the quadratic pairs, so the
    # trip itself is seconds, not a melt-down.
    from kgspark import sparql as SQ

    chain = spark.range(20000).select(
        F.concat(F.lit("c"), F.col("id")).alias("s"),
        F.lit("owl:sameAs").alias("p"),
        F.concat(F.lit("c"), F.col("id") + 1).alias("o"),
    )
    t0 = time.time()
    try:
        SQ.sparql_select(
            chain,
            "SELECT ?x ?y WHERE { ?x (owl:sameAs|^owl:sameAs)+ ?y }",
        ).count()
        guard = {"tripped": False, "sec": round(time.time() - t0, 3)}
    except ValueError as e:
        guard = {"tripped": True, "sec": round(time.time() - t0, 3),
                 "error": str(e)[:160]}
    t1 = levels["x1"]["timings"]
    t10 = levels[f"x{rep}"]["timings"]
    ratios = {
        k: round(t10[k] / t1[k], 2)
        for k in t1
        if k in t10 and t1[k] > 0 and k not in ("doc_parallel_sec",)
    }
    flagged = [k for k, v in ratios.items() if v > 2 * rep]
    return {
        "metric": f"stress_x{rep}",
        "value": t10["kg_pipeline_e2e"],
        "unit": "sec",
        "sf": sf_dir,
        "cpus": cpus,
        "replication": rep,
        "ratios_vs_x1": ratios,
        "linear_ratio": rep,
        "flagged_over_2x_linear": flagged,
        "closure_guard": guard,
        "x1": t1,
        f"x{rep}": t10,
        "stages": levels[f"x{rep}"]["stages"],
    }


if __name__ == "__main__":
    main()
