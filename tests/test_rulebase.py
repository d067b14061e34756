"""Rulebase-as-data (SURVEY D7): the grammar rule constants round-trip
through the engine's own Turtle writer+parser, and the generate stage
produces identical results with file-sourced rules."""

from __future__ import annotations

from kgspark import extract, fixtures, generate as gen, grammar as G
from kgspark import rulebase as RB


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_rulebase_ttl_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rulebase.ttl")
    RB.write_rulebase_ttl(spark, path)

    # the artifact is real Turtle of the engine's subset: every line
    # parses and the triple set round-trips exactly
    reparsed = _rows(RB._parsed(spark, path))
    assert reparsed == _rows(RB.rulebase_triples(spark))

    cls = RB.load_class_rules(spark, path)
    assert set(cls.columns) == {"tok", "class", "rule_score"}
    assert _rows(cls) == set(G.CLASS_RULES)

    props = RB.load_property_rules(spark, path)
    assert set(props.columns) == {"pred", "shape", "priority", "lang_pref"}
    assert _rows(props) == set(G.PROPERTY_RULES)


def test_generate_with_file_rules_matches_constants(spark, sf_dir, tmp_path):
    path = str(tmp_path / "rulebase.ttl")
    RB.write_rulebase_ttl(spark, path)

    m = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    from kgspark import cc as cc_mod
    from pyspark.sql import functions as F
    from kgspark import link

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = link.scored_edges(m, emb)
    labels = cc_mod.connected_components(
        edges, m.select(F.col("norm_text").alias("node")).distinct()
    ).localCheckpoint(eager=False)

    const_cls = _rows(gen.entity_classes(m, labels))
    file_cls = _rows(
        gen.entity_classes(m, labels, rules=gen.rulebase_df(spark, ttl_path=path))
    )
    assert const_cls == file_cls and const_cls

    const_props = _rows(gen.entity_props(m, labels))
    file_props = _rows(
        gen.entity_props(
            m, labels, rules=gen.property_rules_df(spark, ttl_path=path)
        )
    )
    assert const_props == file_props and const_props
