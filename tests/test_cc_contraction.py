"""Large-star/small-star contraction CC: label-identical to the
driver union-find and the min-label loop, and convergent on
high-diameter graphs where min-propagation's round count explodes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kgspark import cc


def _labels(df):
    return {(r["node"], r["label"]) for r in df.collect()}


def _mk(spark, pairs, extra_nodes=()):
    edges = spark.createDataFrame(pairs, "norm_a string, norm_b string")
    nodes = (
        edges.select(F.col("norm_a").alias("node"))
        .unionByName(edges.select(F.col("norm_b").alias("node")))
        .distinct()
    )
    if extra_nodes:
        nodes = nodes.unionByName(
            spark.createDataFrame([(n,) for n in extra_nodes], "node string")
        ).distinct()
    return edges, nodes


def test_contraction_matches_union_find_random(spark):
    rng = random.Random(7)
    ids = [f"n{i:04d}" for i in range(120)]
    pairs = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges, nodes = _mk(spark, pairs, extra_nodes=["iso1", "iso2"])
    uf = _labels(cc._driver_union_find(edges, nodes, "node"))
    ct = _labels(cc.connected_components(edges, nodes, algorithm="contraction"))
    assert ct == uf


def test_contraction_converges_on_long_chain(spark):
    """A 400-node path graph: min-propagation needs ~400 rounds (the
    distributed loop raises at max_iter=50); contraction converges in
    O(log n) rounds and matches the exact union-find labels."""
    n = 400
    # shuffled ids so the chain's min is NOT an endpoint
    rng = random.Random(3)
    ids = [f"c{i:05d}" for i in range(n)]
    rng.shuffle(ids)
    pairs = list(zip(ids, ids[1:]))
    edges, nodes = _mk(spark, pairs)

    with pytest.raises(RuntimeError):
        cc._distributed_cc(edges, nodes, "node", 20, 1)

    ct = cc.connected_components(
        edges, nodes, algorithm="contraction", max_iter=25
    )
    got = _labels(ct)
    want_label = min(ids)
    assert got == {(i, want_label) for i in ids}


def test_contraction_singletons_and_self_edges(spark):
    edges, nodes = _mk(
        spark, [("a", "b"), ("b", "a"), ("x", "x")], extra_nodes=["solo"]
    )
    ct = _labels(cc.connected_components(edges, nodes, algorithm="contraction"))
    assert ct == {("a", "a"), ("b", "a"), ("x", "x"), ("solo", "solo")}


def test_algorithm_param_routing(spark):
    edges, nodes = _mk(spark, [("a", "b")])
    ml = _labels(
        cc.connected_components(edges, nodes, algorithm="minlabel")
    )
    ct = _labels(
        cc.connected_components(edges, nodes, algorithm="contraction")
    )
    auto = _labels(cc.connected_components(edges, nodes))
    assert ml == ct == auto == {("a", "a"), ("b", "a")}
