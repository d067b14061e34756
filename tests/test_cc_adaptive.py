"""Adaptive CC: the driver-local union-find and the distributed
min-label loop must produce identical labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import cc, extract, fixtures, link


def test_paths_agree_on_fixture(spark, sf_dir):
    m = extract.mentions_df(fixtures.flat_spans(spark, sf_dir))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    edges = link.scored_edges(m, emb).localCheckpoint()
    nodes = m.select(F.col("norm_text").alias("node")).distinct().localCheckpoint()
    local = {(r["node"], r["label"]) for r in cc._driver_union_find(edges, nodes, "node").collect()}
    dist = {
        (r["node"], r["label"])
        for r in cc._distributed_cc(edges, nodes, "node", 50, 1).collect()
    }
    assert local == dist


def test_driver_path_never_collects_singletons(spark):
    """Round-2 verdict #3: the driver union-find must only ever collect
    edge endpoints — a corpus with few edges but a huge singleton node
    set stays distributed-side.  Guarded by banning DataFrame.collect on
    anything except the (tiny) edge frame, then checking labels."""
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "norm_a string, norm_b string")
    DataFrame = type(edges)  # the concrete (classic) class overrides collect
    singles = spark.range(2000).select(
        F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("node")
    )
    nodes = singles.unionByName(
        spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    )

    real_collect = DataFrame.collect
    collected_schemas = []

    def spying(self):
        collected_schemas.append(set(self.columns))
        return real_collect(self)

    DataFrame.collect = spying
    try:
        out = cc._driver_union_find(edges, nodes, "node")
        plan_built = True
    finally:
        DataFrame.collect = real_collect
    assert plan_built
    # the only collect during UF construction is the edge frame
    assert collected_schemas == [{"norm_a", "norm_b"}]

    rows = {(r["node"], r["label"]) for r in out.collect()}
    assert ("a", "a") in rows and ("b", "a") in rows and ("c", "a") in rows
    assert ("s000000", "s000000") in rows and ("s001999", "s001999") in rows
    assert len(rows) == 2003


def test_threshold_routing(spark):
    edges = spark.createDataFrame([("a", "b")], "norm_a string, norm_b string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    # tiny graph → driver path; force distributed with threshold=0
    small = {(r["node"], r["label"]) for r in cc.connected_components(edges, nodes).collect()}
    forced = {
        (r["node"], r["label"])
        for r in cc.connected_components(edges, nodes, driver_threshold=0).collect()
    }
    assert small == forced == {("a", "a"), ("b", "a"), ("c", "c")}


def test_driver_threshold_default_and_env(monkeypatch, spark):
    """Round-5 (verdict #7): the adaptive switchover defaults to 500k
    edges (50 MB collected, safe on a shared driver) and the
    distributed path engages past it — proven by making the driver
    path explode."""
    from kgspark import cc as cc_mod

    assert cc_mod.DEFAULT_DRIVER_THRESHOLD == 500_000
    monkeypatch.setenv("KGSPARK_CC_DRIVER_THRESHOLD", "10")
    assert cc_mod._driver_threshold_default() == 10

    edges = spark.createDataFrame(
        [(f"v{i}", f"v{i+1}") for i in range(20)],
        "norm_a string, norm_b string",
    )
    nodes = (
        edges.selectExpr("norm_a as node")
        .union(edges.selectExpr("norm_b as node"))
        .distinct()
    )

    def boom(*a, **k):
        raise AssertionError("driver path used above threshold")

    monkeypatch.setattr(cc_mod, "_driver_union_find", boom)
    # 20 edges > threshold 10 → distributed path, identical labels
    labels = {
        (r["node"], r["label"])
        for r in cc_mod.connected_components(edges, nodes).collect()
    }
    assert all(lab == "v0" for _, lab in labels) and len(labels) == 21

    # ≤ threshold → the driver path IS used (make distributed explode)
    monkeypatch.setattr(cc_mod, "_driver_union_find", boom)
    small = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "norm_a string, norm_b string"
    )
    small_nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "node string"
    )
    with pytest.raises(AssertionError, match="driver path"):
        cc_mod.connected_components(small, small_nodes)
