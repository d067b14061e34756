"""Streaming semantics (O40–O43): AvailableNow micro-batch ingest
through the SAME kernels as batch; watermark windows; stateful counts."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from kgspark import extract, fixtures, streaming as S


@pytest.fixture()
def doc_stream_dir(spark, sf_dir, tmp_path):
    """Split documents into 3 parquet files → 3 micro-batches."""
    out = str(tmp_path / "docs_stream")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.withColumn("_b", F.pmod(F.col("doc_id"), F.lit(3))).repartition(
        3, "_b"
    ).drop("_b").write.mode("overwrite").parquet(out)
    return out


def test_stream_mentions_match_batch(spark, sf_dir, doc_stream_dir, tmp_path):
    stream = S.read_documents_stream(spark, doc_stream_dir)
    q = (
        S.stream_mentions(stream)
        .writeStream.format("memory")
        .queryName("m_out")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT doc_id, span_pos, mention_ord, mention_iri FROM m_out"
        ).collect()
    }
    batch = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    want = {
        tuple(r)
        for r in batch.select(
            "doc_id", "span_pos", "mention_ord", "mention_iri"
        ).collect()
    }
    assert got == want


def test_stream_event_window(spark, sf_dir, tmp_path):
    # readStream needs a directory source — stage the events table
    ev_dir = str(tmp_path / "events_stream")
    spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode("overwrite").parquet(ev_dir)
    events = spark.readStream.schema(S.EVENTS_SCHEMA).parquet(ev_dir)
    q = (
        S.stream_event_window(events)
        .writeStream.format("memory")
        .queryName("w_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cpw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT sum(n) FROM w_out").collect()[0][0] or 0
    # append mode emits only windows sealed by the watermark — a strict
    # subset of all events, never more
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert 0 <= got <= total
    # the windowed aggregation itself is exact in complete mode against
    # a batch groupBy — verified via batch equivalence:
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.window(F.col("ts").cast("timestamp"), "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    assert batch.agg(F.sum("n")).collect()[0][0] == total


def test_stream_stateful_counts(spark, sf_dir, doc_stream_dir, tmp_path):
    stream = S.read_documents_stream(spark, doc_stream_dir)
    q = (
        S.stream_entity_counts(S.stream_mentions(stream))
        .writeStream.format("memory")
        .queryName("s_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cps"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # the LAST update per norm equals the batch count
    import pandas as pd

    upd = spark.sql("SELECT norm_text, total FROM s_out").toPandas()
    final = upd.groupby("norm_text")["total"].max()
    batch = (
        extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
        .groupBy("norm_text")
        .count()
        .toPandas()
        .set_index("norm_text")["count"]
    )
    assert final.sort_index().equals(batch.sort_index().astype(final.dtype))


def test_stream_to_catalog_exactly_once(spark, sf_dir, doc_stream_dir, tmp_path):
    from kgspark import checkpoint as CP
    from kgspark.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path / "wh"), 8)
    cp_dir = str(tmp_path / "scp")
    S.stream_to_catalog(spark, doc_stream_dir, cat, cp_dir)
    got = {
        tuple(r)
        for r in cat.read(spark, "stream_mentions")
        .select("doc_id", "span_pos", "mention_ord", "mention_iri")
        .collect()
    }
    batch = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    want = {
        tuple(r)
        for r in batch.select("doc_id", "span_pos", "mention_ord", "mention_iri").collect()
    }
    assert got == want
    # replay with a FRESH streaming checkpoint (simulated redelivery of
    # every batch): catalog fingerprints make it a no-op
    n_cp = cat.read(spark, CP.CHECKPOINT_TABLE).count()
    S.stream_to_catalog(spark, doc_stream_dir, cat, str(tmp_path / "scp2"))
    assert cat.read(spark, CP.CHECKPOINT_TABLE).count() == n_cp
    got2 = {
        tuple(r)
        for r in cat.read(spark, "stream_mentions")
        .select("doc_id", "span_pos", "mention_ord", "mention_iri")
        .collect()
    }
    assert got2 == want


def test_stream_triples_match_batch(spark, sf_dir, doc_stream_dir, tmp_path):
    """The streaming triple sink produces the same per-graph quad set
    as the batch base_quads stage (stream == batch through the full
    term model)."""
    from kgspark.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path / "wh_t"), 8)
    S.stream_to_catalog(spark, doc_stream_dir, cat, str(tmp_path / "scp_t"))
    cols = ["g", "s", "p", "o", "o_kind", "o_lang", "o_datatype"]
    got = {
        tuple(r)
        for r in cat.read(spark, "stream_base_triples").select(*cols).collect()
    }
    flat = fixtures.flat_spans(spark, sf_dir)
    want = {
        tuple(r)
        for r in extract.base_quads(flat, extract.mentions_df(flat))
        .select(*cols)
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_quads_serialize_identically(spark, sf_dir, doc_stream_dir, tmp_path):
    """O40 × O11: exporting the STREAM-produced quad table as N-Quads
    yields byte-identical lines to exporting the batch quad table — a
    graph-scoped export is independent of the ingestion path."""
    from kgspark import rdfio
    from kgspark.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path / "wh_q"), 8)
    S.stream_to_catalog(spark, doc_stream_dir, cat, str(tmp_path / "scp_q"))
    cols = ["g", "s", "p", "o", "o_kind", "o_lang", "o_datatype"]
    streamed = cat.read(spark, "stream_base_triples").select(*cols)
    flat = fixtures.flat_spans(spark, sf_dir)
    batch = extract.base_quads(flat, extract.mentions_df(flat)).select(*cols)

    got = {r["line"] for r in rdfio.to_nquads(streamed).collect()}
    want = {r["line"] for r in rdfio.to_nquads(batch).collect()}
    assert got == want and len(want) > 0
    # and the round-trip of the streamed export is lossless
    back = {
        tuple(r)
        for r in rdfio.parse_nquads(rdfio.to_nquads(streamed)).select(*cols).collect()
    }
    assert back == {tuple(r) for r in streamed.collect()}


def test_stream_entity_index_equals_batch(spark, sf_dir, doc_stream_dir, tmp_path):
    """O32 × O40: the continuously-maintained entity index (per-batch
    incremental regeneration) converges to the from-scratch batch index
    after the stream drains — attrs AND props."""
    from kgspark import cc, generate as gen, grammar as G, link
    from kgspark.catalog import ParquetCatalog

    cat = ParquetCatalog(str(tmp_path / "wh_idx"), 8)
    S.stream_entity_index(
        spark,
        doc_stream_dir,
        cat,
        str(tmp_path / "scp_idx"),
        embeddings_path=f"{sf_dir}/embeddings.parquet",
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flat = fixtures.flat_spans(fixtures.with_spans(docs))
    m = extract.mentions_df(flat).localCheckpoint()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = link.scored_edges(m, emb, n_embeddings=500,
                              vocab=sorted(G.ENTITY_TOKENS))
    labels = cc.connected_components(
        edges, m.select(F.col("norm_text").alias("node")).distinct()
    ).localCheckpoint()

    got_attrs = {tuple(r) for r in cat.read(spark, "live_attrs").collect()}
    want_attrs = {tuple(r) for r in gen.entity_attrs_df(m, labels).collect()}
    assert got_attrs == want_attrs and len(want_attrs) > 0

    got_props = {tuple(r) for r in cat.read(spark, "live_props").collect()}
    want_props = {tuple(r) for r in gen.entity_props(m, labels).collect()}
    assert got_props == want_props

    # redelivery idempotence: re-running the drained stream with the
    # SAME checkpoint is a no-op (AvailableNow + checkpoint), and the
    # live tables are unchanged
    S.stream_entity_index(
        spark, doc_stream_dir, cat, str(tmp_path / "scp_idx"),
        embeddings_path=f"{sf_dir}/embeddings.parquet",
    )
    assert {tuple(r) for r in cat.read(spark, "live_attrs").collect()} == want_attrs


def test_stream_sessions_converge_to_batch(spark, sf_dir, tmp_path):
    """Continuous sessionization == batch lag+cumsum when events arrive
    per-user time-ordered across micro-batches (files staged as
    consecutive time ranges, one file per trigger)."""
    import kgspark.queries as Q

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev_dir = str(tmp_path / "ev_sessions")
    # stage 3 time-ordered chunks: lexicographic file listing must
    # match time order (part names carry the chunk index)
    qs = ev.approxQuantile("value", [0.0], 0.0)  # force materialization once
    bounds = ev.selectExpr(
        "percentile(unix_micros(ts), array(0.34, 0.67)) AS b"
    ).collect()[0]["b"]
    lo, hi = int(bounds[0]), int(bounds[1])
    us = F.unix_micros(F.col("ts"))
    for i, pred in enumerate([us <= lo, (us > lo) & (us <= hi), us > hi]):
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage{i}")
        )
    import glob
    import os
    import shutil

    os.makedirs(ev_dir)
    # FileStreamSource orders files by MODIFICATION TIME at millisecond
    # granularity (not by name); back-to-back copies land in the same
    # millisecond and the tie order is arbitrary, so the chunk mtimes
    # are pinned a full second apart to make arrival order = time order
    # (the operator's documented convergence precondition).
    import time

    t0 = int(time.time()) - 100
    for i in range(3):
        src = glob.glob(str(tmp_path / f"stage{i}" / "part-*.parquet"))[0]
        dst = os.path.join(ev_dir, f"chunk-{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    events = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    q = (
        S.stream_event_sessions(events)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cpsess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_id"], r["session_id"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["session_id"])
        for r in Q.event_sessions(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_attribution_converges_to_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join == the batch view×purchase interval
    join once all data is processed (availableNow drains everything, so
    every in-bound pair crosses the watermark and emits)."""
    import glob
    import os

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev_dir = str(tmp_path / "ev_attr")
    os.makedirs(ev_dir)
    # two time-ordered chunks, mtimes pinned (FileStreamSource orders
    # by ms-granularity modification time)
    mid = ev.selectExpr("percentile(unix_micros(ts), 0.5) AS m").collect()[0]["m"]
    us = F.unix_micros(F.col("ts"))
    t0 = int(__import__("time").time()) - 100
    for i, pred in enumerate([us <= int(mid), us > int(mid)]):
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"astage{i}")
        )
        src = glob.glob(str(tmp_path / f"astage{i}" / "part-*.parquet"))[0]
        dst = os.path.join(ev_dir, f"chunk-{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    events = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    q = (
        S.stream_view_purchase_attribution(events)
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cpattr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    v = ev.filter("event_type = 'view'").selectExpr(
        "user_id", "event_id AS view_id", "ts AS view_ts"
    )
    p = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id", "event_id AS purchase_id", "ts AS purchase_ts"
    )
    want = {
        (r["user_id"], r["view_id"], r["purchase_id"])
        for r in v.join(p, "user_id")
        .filter(
            "purchase_ts >= view_ts AND "
            "purchase_ts <= view_ts + interval 30 minutes"
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_static_enrichment_converges_to_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast join + running aggregate == the batch
    join+aggregate once the stream drains; events missing a dimension
    row survive with NULL segment."""
    from kgspark.streaming import stream_enriched_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # deterministic user dimension; hold out users % 7 == 0 to exercise
    # the left-join NULL-segment path
    dim = (
        ev.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 7 != 0)
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 4))
    )
    dim_path = str(tmp_path / "dim")
    dim.write.parquet(dim_path)
    dim_static = spark.read.parquet(dim_path)

    ev_dir = str(tmp_path / "ev_enrich")
    import os
    import shutil
    import time

    os.makedirs(ev_dir)
    chunks = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    t0 = int(time.time()) - 100
    for i, c in enumerate(chunks):
        stage = str(tmp_path / f"enr_stage{i}")
        c.coalesce(1).write.mode("overwrite").parquet(stage)
        import glob

        src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(ev_dir, f"chunk-{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    q = (
        stream_enriched_counts(stream, dim_static)
        .writeStream.format("memory")
        .queryName("enriched_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_enr"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value_e6"])
        for r in spark.sql("SELECT * FROM enriched_counts").collect()
    }
    batch = {
        (r["segment"], r["event_type"]): (r["n"], r["sum_value_e6"])
        for r in ev.join(dim_static, "user_id", "left")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.expr("CAST(floor(1000000 * value) AS BIGINT)")
            ).alias("sum_value_e6"),
        )
        .collect()
    }
    assert got == batch
    assert any(k[0] is None for k in got)  # held-out users surfaced


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Replayed chunk (at-least-once redelivery) is fully suppressed:
    the deduped stream's event_id multiset equals the distinct batch
    set, even though chunk 1 is delivered twice."""
    from kgspark.streaming import stream_dedup_events

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    chunks = ev.randomSplit([1.0, 1.0], seed=11)
    ev_dir = str(tmp_path / "ev_dedup")
    import glob
    import os
    import shutil
    import time

    os.makedirs(ev_dir)
    t0 = int(time.time()) - 100
    # chunk0, chunk1, then chunk1 AGAIN (redelivery)
    stages = [chunks[0], chunks[1], chunks[1]]
    for i, c in enumerate(stages):
        stage = str(tmp_path / f"dd_stage{i}")
        c.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(ev_dir, f"chunk-{i}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema(S.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    q = (
        stream_dedup_events(stream)
        .select("event_id")
        .writeStream.format("memory")
        .queryName("dedup_events")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [
        r["event_id"]
        for r in spark.sql("SELECT event_id FROM dedup_events").collect()
    ]
    assert len(got) == len(set(got))  # no duplicate survived
    assert sorted(got) == sorted(
        r["event_id"] for r in ev.select("event_id").distinct().collect()
    )
