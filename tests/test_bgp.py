"""SPARQL BGP matcher semantics on a synthetic triple table."""

from __future__ import annotations

import pytest

from kgspark.bgp import bgp_match

TRIPLES = [
    ("ex:a", "rdf:type", "ex:Person"),
    ("ex:a", "rdfs:label", "alice"),
    ("ex:a", "ex:knows", "ex:b"),
    ("ex:b", "rdf:type", "ex:Person"),
    ("ex:b", "rdfs:label", "bob"),
    ("ex:b", "ex:knows", "ex:a"),
    ("ex:c", "rdf:type", "ex:Robot"),
    ("ex:c", "rdfs:label", "carl"),
    ("ex:self", "ex:knows", "ex:self"),
]


@pytest.fixture()
def tri(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_constants_filter_and_vars_project(tri):
    out = bgp_match(tri, [("?e", "rdf:type", "ex:Person"), ("?e", "rdfs:label", "?l")])
    assert set(out.columns) == {"e", "l"}
    assert _rows(out.select("e", "l")) == {("ex:a", "alice"), ("ex:b", "bob")}


def test_join_chain_three_patterns(tri):
    out = bgp_match(
        tri,
        [
            ("?x", "ex:knows", "?y"),
            ("?x", "rdfs:label", "?lx"),
            ("?y", "rdfs:label", "?ly"),
        ],
    )
    assert _rows(out.select("x", "y", "lx", "ly")) == {
        ("ex:a", "ex:b", "alice", "bob"),
        ("ex:b", "ex:a", "bob", "alice"),
    }


def test_variable_in_predicate_position(tri):
    out = bgp_match(tri, [("ex:c", "?p", "?o")])
    assert _rows(out.select("p", "o")) == {
        ("rdf:type", "ex:Robot"),
        ("rdfs:label", "carl"),
    }


def test_repeated_variable_within_pattern(tri):
    # {?x ex:knows ?x} — only the self-loop matches
    out = bgp_match(tri, [("?x", "ex:knows", "?x")])
    assert _rows(out.select("x")) == {("ex:self",)}


def test_disjoint_patterns_cross_product(tri):
    out = bgp_match(
        tri, [("ex:a", "rdfs:label", "?la"), ("ex:c", "rdfs:label", "?lc")]
    )
    assert _rows(out.select("la", "lc")) == {("alice", "carl")}


def test_empty_bgp_raises(tri):
    with pytest.raises(ValueError):
        bgp_match(tri, [])


def test_optional_binds_null_when_unmatched(tri):
    out = bgp_match(
        tri,
        [("?x", "rdf:type", "?t")],
        optionals=[[("?x", "ex:knows", "?y")]],
    )
    rows = _rows(out.select("x", "t", "y"))
    assert ("ex:a", "ex:Person", "ex:b") in rows
    assert ("ex:c", "ex:Robot", None) in rows  # carl knows nobody


def test_not_exists_removes_bindings(tri):
    out = bgp_match(
        tri,
        [("?x", "rdf:type", "?t")],
        anti=[[("?x", "ex:knows", "?y")]],
    )
    assert _rows(out.select("x")) == {("ex:c",)}


def test_optional_after_anti_compose(tri):
    out = bgp_match(
        tri,
        [("?x", "rdfs:label", "?l")],
        anti=[[("?x", "rdf:type", "ex:Robot")]],
        optionals=[[("?x", "ex:knows", "?y")]],
    )
    rows = _rows(out.select("x", "l", "y"))
    assert rows == {
        ("ex:a", "alice", "ex:b"),
        ("ex:b", "bob", "ex:a"),
    }


def test_disjoint_optional_raises(tri):
    with pytest.raises(ValueError):
        bgp_match(tri, [("?x", "rdf:type", "?t")],
                  optionals=[[("ex:a", "rdfs:label", "?only")]])
