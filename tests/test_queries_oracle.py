"""Smoke the driver contract: every queries() entry runs at sf0.001 and
matches its oracle_sql() under the driver's comparison semantics.
(The heavy KG queries are covered at sf0.01 by tests/compare.py runs and
by the driver itself; here we gate the fast ones on every pytest run.)
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from tests.compare import TABLES, canon

FAST = [
    "kg_spans_flat", "kg_span_invariant", "kg_mentions", "kg_mention_counts",
    "kg_media_features", "tpch_q1", "revenue_by_nation",
    "customers_without_orders", "order_priorities_with_lineitems",
    "top2_lineitems_per_order", "event_gaps", "top10_orders",
    "lineitem_except_all", "distinct_segments", "events_isin_counts",
    "events_json_k", "best_order_per_customer", "event_type_stats",
    "latest_event_per_user", "norm_iri_demo",
    # round-4 additions (pipeline-derived ones amortize the memoized
    # _labels/run_pipeline_cached chain)
    "event_value_percentiles", "event_value_pivot", "distinct_kmv_sketch",
    "kg_entity_media", "kg_media_triples", "kg_bgp_filter", "kg_bgp_union", "kg_sameas_closure", "kg_sameas_degree",
    "kg_sparql_topk", "kg_sparql_construct", "kg_sparql_groupby", "kg_sparql_lang", "kg_sparql_graph",
    "doc_pack_assign", "training_export",
    # round-6 additions
    "pii_scrub", "pii_rate_by_source", "kg_sparql_update", "para_dedup",
    "kg_sparql_select_expr", "rdf_jsonld_compacted_roundtrip",
    "kg_sparql_optional_exists", "kg_sparql_modify",
    # round-6c additions
    "term_pmi", "embedding_srp_buckets", "event_value_histogram",
    "vocab_growth", "doc_surprisal_heldout", "dedup_incremental_pairs",
    "dedup_minhash_calibration", "embedding_label_centroids",
    "embedding_kmeans_assign", "embedding_kmeans_inertia",
    "doc_type_token_ratio", "event_type_transitions",
    "corpus_stats_by_source", "event_user_lifetime", "event_debounce",
    # round-6e additions
    "scd2_user_state", "kg_entity_provenance", "dedup_winnow_pairs",
    "kg_void_summary", "kg_graph_hash", "event_ewma", "tpch_q4",
    "tpch_q14", "tpch_q19", "doc_zorder_key", "embedding_pq_codes",
    "kg_store_merge", "kg_component_size_hist", "embedding_knn_graph",
    "nation_coverage_full_join", "orders_above_avg",
    "event_trending_daily", "event_value_pctrank", "kg_store_diff",
    "event_stats_unpivot", "part_price_quartiles",
    "priority_revenue_share", "revenue_grouping_sets",
    "kg_parse_error_stats", "user_event_diversity", "embedding_dim_stats",
    "event_hourly_seasonality", "kg_attr_coverage",
    "orders_monthly_growth", "kg_label_collisions",
    "doc_prefix_dup_groups",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    sdf = E.queries()[name](spark, sf_dir).toPandas()
    odf = duck.execute(E.oracle_sql()[name]).df()
    assert canon(sdf) == canon(odf)


def test_every_query_has_oracle_or_is_flagged():
    qs, osql = E.queries(), E.oracle_sql()
    missing = [k for k in osql if k not in qs]
    assert not missing, f"oracle without query: {missing}"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"s", "p", "o"}
