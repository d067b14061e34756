"""Extraction stage: the mapInPandas kernel vs the native-expr extractor
vs the reference oracle; dispatch/quarantine path (O15/O44)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import extract, fixtures


def _mention_set(df):
    return set(
        map(
            tuple,
            df.select(
                "doc_id", "span_pos", "mention_ord", "mention_text",
                "norm_text", "mention_iri",
            ).collect(),
        )
    )


def test_kernel_matches_native(spark, sf_dir):
    flat = fixtures.flat_spans(spark, sf_dir).cache()
    k = _mention_set(extract.mentions_df(flat))
    n = _mention_set(extract.mentions_df_native(flat))
    assert k == n
    flat.unpersist()


def test_kernel_matches_oracle(spark, sf_dir, oracle):
    flat = fixtures.flat_spans(spark, sf_dir)
    got = _mention_set(extract.mentions_df(flat))
    om = oracle["mentions"]
    want = set(
        map(
            tuple,
            om[
                ["doc_id", "span_pos", "mention_ord", "mention_text",
                 "norm_text", "mention_iri"]
            ].itertuples(index=False),
        )
    )
    assert got == want


def test_quarantine_unknown_kind(spark):
    rows = [
        ("d1", "en", "s1", 0, "weird", "payload", "", 0),
        ("d1", "en", "s1", 1, "text", "table key", "", 10),
    ]
    flat = spark.createDataFrame(
        rows,
        "doc_id string, lang string, source string, span_pos int, "
        "kind string, text string, media_ref string, offset int",
    )
    q = extract.quarantine_spans(flat)
    assert [r["kind"] for r in q.collect()] == ["weird"]
    # unknown kinds never reach the text kernel
    m = extract.mentions_df(flat)
    assert m.count() == 1


def test_degenerate_docs(spark):
    pdf = spark.createDataFrame(
        [(1, "the a fast slow", "en", "sX"), (2, "table", "de", "sY"),
         (3, "a", "zh", "sZ")],
        "doc_id long, text string, lang string, source string",
    )
    flat = fixtures.flat_spans(fixtures.with_spans(pdf))
    m = extract.mentions_df(flat).collect()
    assert len(m) == 1 and m[0]["mention_iri"] == "ex://sY/table"
    t = extract.base_triples(flat, extract.mentions_df(flat))
    assert t.count() == 5  # 3 lang + 1 mention + 1 type


def test_media_decode_stub_is_marked():
    from kgspark.processors.media import decode_media_kernel

    with pytest.raises(NotImplementedError):
        next(decode_media_kernel(iter([])))


def test_media_features(spark, sf_dir):
    flat = fixtures.flat_spans(spark, sf_dir)
    feats = extract.media_features_df(flat)
    n_media = flat.filter(F.col("kind") == "media").count()
    assert feats.count() == n_media
    bad = feats.filter(
        (F.col("media_kind") != "media") | (F.col("vec_id") < 0)
        | (F.col("ref_bytes") != F.length("media_ref"))
    ).count()
    assert bad == 0


def test_xml_template_transform_kernel(spark):
    """O12 XSLT-analogue: template transform emits full-term triples;
    unknown elements and id-less payloads drop."""
    from kgspark.processors.xml import XML_TRIPLES_DDL, xml_transform_kernel

    rows = [
        ('<doc id="7"><title xml:lang="en">a &amp; b</title>'
         "<lang>en</lang><size>42</size>"
         "<link>http://example.org/kg#thing</link></doc>",),
        ('<doc id="8"><title>x</title><junk>ignored</junk></doc>',),
        ("<notadoc><title>skip</title></notadoc>",),
    ]
    lines = spark.createDataFrame(rows, "line string")
    got = {
        tuple(r)
        for r in lines.mapInPandas(
            xml_transform_kernel, schema=XML_TRIPLES_DDL
        ).collect()
    }
    assert ("doc://7", "rdfs:label", "a & b", "literal", "en", "") in got
    assert ("doc://7", "ex:size", "42", "literal", "", "xsd:integer") in got
    assert ("doc://7", "ex:mentions", "ex:thing", "iri", "", "") in got
    assert ("doc://8", "rdfs:label", "x", "literal", "", "") in got
    assert not any(s == "doc://8" and p == "ex:junk" for s, p, *_ in got)
    assert not any("skip" in t for t in {r[2] for r in got})
