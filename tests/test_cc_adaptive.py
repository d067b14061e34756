"""Adaptive CC: the driver-local union-find and the distributed
min-label loop must produce identical labels."""

from __future__ import annotations

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
