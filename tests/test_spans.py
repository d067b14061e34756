"""Span synthesis + the span-sequence invariant (BASELINE.json:15):
exact per-document equality of (kind, text, media_ref, order) — and
offset — between the Spark table and the reference oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures


def test_span_sequence_equality(spark, sf_dir, oracle):
    ds = fixtures.docs_spans(spark, sf_dir)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in ds.collect()
    }
    want = {}
    for r in oracle["spans"].itertuples():
        want.setdefault(r.doc_id, []).append(
            (r.kind, r.text, r.media_ref, r.offset)
        )
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], f"span sequence differs for {doc_id}"


def test_flat_spans_preserve_positions(spark, sf_dir):
    flat = fixtures.flat_spans(spark, sf_dir)
    # positions are dense 0..n-1 per doc (posexplode, never bare explode)
    agg = flat.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.min("span_pos").alias("mn"),
        F.max("span_pos").alias("mx"),
    )
    bad = agg.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0


def test_interleaving_shape(spark, sf_dir):
    flat = fixtures.flat_spans(spark, sf_dir)
    # every media span is immediately preceded by a text span
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("span_pos")
    x = flat.withColumn("prev_kind", F.lag("kind").over(w))
    bad = x.filter((F.col("kind") == "media") & (F.col("prev_kind") != "text")).count()
    assert bad == 0
    # media refs well-formed
    badref = flat.filter(
        (F.col("kind") == "media")
        & ~F.col("media_ref").rlike(r"^media://vec/[0-9]+$")
    ).count()
    assert badref == 0


def test_media_spans_direct_equals_exploded(spark, sf_dir):
    """r7: the closed-form media-span frame (no text-chunk synthesis)
    must equal extract.media_spans over the exploded span view —
    row-for-row (doc_id, span_pos, media_ref)."""
    from kgspark import extract

    exploded = extract.media_spans(fixtures.flat_spans(spark, sf_dir))
    direct = fixtures.media_spans_direct(spark, sf_dir)
    a = sorted(map(tuple, exploded.select("doc_id", "span_pos", "media_ref").collect()))
    b = sorted(map(tuple, direct.select("doc_id", "span_pos", "media_ref").collect()))
    assert a == b
