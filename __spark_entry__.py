"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``kgspark`` package; this module is the
thin binding.  Column names/types are aligned pairwise between each
Spark builder (kgspark/queries.py) and its DuckDB SQL
(kgspark/oracle_sql.py); floats are emitted as floor(1e6*x) BIGINT on
both sides, timestamps as unix micros.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kgspark import oracle_sql as OS
from kgspark import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG-construction pipeline on sf0.001 —
    documents → interleaved spans → mention extraction → LSH-blocked
    link scoring → connected components → canonical entities → the
    final distinct (s,p,o) triple set."""
    from kgspark.pipeline import run_pipeline

    return run_pipeline(spark, SF_SMOKE).triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG pipeline (SURVEY.md §2.2/§2.4/§2.5; BASELINE.json north_star)
        "kg_spans_flat": Q.kg_spans_flat,           # O13/O29 span synthesis
        "kg_span_invariant": Q.kg_span_invariant,   # BASELINE.json:15
        "kg_mentions": Q.kg_mentions,               # O14 mapInPandas kernel
        "kg_mention_counts": Q.kg_mention_counts,   # O26
        "kg_link_edges": Q.kg_link_edges,           # O21+O22
        "kg_entities": Q.kg_entities,               # O20+O34
        "kg_entity_attrs": Q.kg_entity_attrs,       # O24/O25/O28 + O7
        "kg_triples": Q.kg_triples,                 # end-to-end (flagship)
        "kg_triples_full": Q.kg_triples_full,       # D3 full term model
        "kg_graph_counts": Q.kg_graph_counts,       # D4 named graphs
        "kg_entity_class": Q.kg_entity_class,       # O25 rulebase classes
        "kg_entity_props": Q.kg_entity_props,       # O24 property rulebase (r3)
        "kg_props_triples": Q.kg_props_triples,     # D7→D3 props as triples (r3)
        "kg_entity_cooccurrence": Q.kg_entity_cooccurrence,  # entity graph edges (r3)
        "entity_pagerank": Q.entity_pagerank,       # int-exact centrality (r5)
        "entity_triangle_counts": Q.entity_triangle_counts,  # clustering signal (r5)
        "entity_kcore": Q.entity_kcore,                      # 3-core peeling fixpoint (r6b)
        "entity_communities": Q.entity_communities,          # sync LPA communities (r6b)
        "entity_hops": Q.entity_hops,                        # multi-source BFS, 4 rounds (r6)
        "kg_bgp_match": Q.kg_bgp_match,             # SPARQL BGP over triples (r3)
        "kg_bgp_optional": Q.kg_bgp_optional,       # SPARQL OPTIONAL (r3)
        "kg_bgp_filter": Q.kg_bgp_filter,           # SPARQL FILTER+SELECT DISTINCT (r4)
        "kg_bgp_union": Q.kg_bgp_union,             # SPARQL UNION (r4)
        "kg_sameas_closure": Q.kg_sameas_closure,   # property path (sameAs|^sameAs)+ (r4)
        "kg_sameas_degree": Q.kg_sameas_degree,     # closure degree, linear form (r4)
        "kg_entity_media": Q.kg_entity_media,       # license/media selection rules (r4)
        "kg_media_triples": Q.kg_media_triples,     # D7→D3 license/media triples (r4)
        "kg_sparql_topk": Q.kg_sparql_topk,         # SPARQL text front-end (r4)
        "kg_sparql_construct": Q.kg_sparql_construct,  # SPARQL CONSTRUCT (r4)
        "kg_sparql_groupby": Q.kg_sparql_groupby,      # SPARQL GROUP BY agg (r4)
        "kg_sparql_lang": Q.kg_sparql_lang,            # SPARQL LANG() filter (r4)
        "kg_sparql_graph": Q.kg_sparql_graph,          # SPARQL GRAPH clause (r4)
        "kg_sparql_path_seq": Q.kg_sparql_path_seq,    # sequence path p1/p2 (r5)
        "kg_sparql_path_star": Q.kg_sparql_path_star,  # zero-or-more path (r5)
        "kg_sparql_subquery": Q.kg_sparql_subquery,    # { SELECT … } subquery (r5)
        "kg_sparql_union_nested": Q.kg_sparql_union_nested,  # nested-group UNION (r5)
        "kg_sparql_avg": Q.kg_sparql_avg,              # AVG sum/count e6 bridge (r5)
        "kg_sparql_optional_filter": Q.kg_sparql_optional_filter,  # OPTIONAL{FILTER}+COALESCE (r5)
        "kg_sparql_group_concat": Q.kg_sparql_group_concat,  # GROUP_CONCAT/SAMPLE (r5)
        "kg_sparql_update": Q.kg_sparql_update,        # UPDATE verbs on the store (r6)
        "kg_sparql_modify": Q.kg_sparql_modify,        # DELETE/INSERT…WHERE (r6)
        "kg_sparql_select_expr": Q.kg_sparql_select_expr,  # (expr AS ?v) + ORDER BY expr (r6)
        "kg_sparql_optional_exists": Q.kg_sparql_optional_exists,  # null-compat EXISTS (r6)
        "kg_sparql_builtins": Q.kg_sparql_builtins,    # scalar-builtin surface (r6)
        "kg_sparql_term_fns": Q.kg_sparql_term_fns,    # isIRI/LANGMATCHES (r6)
        "kg_sparql_isnumeric": Q.kg_sparql_isnumeric,  # numeric-datatype test (r6c)
        "kg_sparql_sameterm": Q.kg_sparql_sameterm,    # RDF-term identity (r6c)
        "kg_sparql_encode": Q.kg_sparql_encode,        # ENCODE_FOR_URI chain (r6c)
        "kg_sparql_term_ctors": Q.kg_sparql_term_ctors,  # STRLANG/STRDT/IRI (r6c)
        "kg_sparql_construct_where": Q.kg_sparql_construct_where,  # §10.2.2 shorthand (r6)
        "kg_sparql_load": Q.kg_sparql_load,            # LOAD file-ingest verb (r6)
        "kg_sparql_from": Q.kg_sparql_from,            # FROM/FROM NAMED dataset (r6)
        "kg_media_features": Q.kg_media_features,   # O3 multimodal stub
        # relational operator coverage (SURVEY.md §2 oracle sketches)
        "tpch_q1": Q.tpch_q1,                                       # O26 agg
        "revenue_by_nation": Q.revenue_by_nation,                   # O19 join
        "customers_without_orders": Q.customers_without_orders,     # O23 anti
        "order_priorities_with_lineitems": Q.order_priorities_with_lineitems,  # O23 semi
        "top2_lineitems_per_order": Q.top2_lineitems_per_order,     # O28 window
        "tpch_q3_topk": Q.tpch_q3_topk,                             # 3-way join + topk
        "tpch_q5": Q.tpch_q5,                                       # 6-table star join (r6c)
        "scd2_user_state": Q.scd2_user_state,                       # SCD-2 CDC history (r6e)
        "dedup_winnow_pairs": Q.dedup_winnow_pairs,                 # MOSS winnowing pairs (r6e)
        "kg_store_merge": Q.kg_store_merge,                         # CDC MERGE upsert into store (r6e)
        "kg_store_diff": Q.kg_store_diff,                           # anti-entropy replica diff (r6e)
        "kg_parse_error_stats": Q.kg_parse_error_stats,             # ingest drop-rate metric (r6e)
        "kg_void_summary": Q.kg_void_summary,                       # VoID dataset stats (r6e)
        "kg_graph_hash": Q.kg_graph_hash,                           # canonical graph hash (r6e)
        "kg_component_size_hist": Q.kg_component_size_hist,         # CC size distribution (r6e)
        "event_ewma": Q.event_ewma,                                 # 8-tap integer EWMA (r6e)
        "event_trending_daily": Q.event_trending_daily,             # per-day trending top-k (r6e)
        "event_value_pctrank": Q.event_value_pctrank,               # integer percent_rank (r6e)
        "user_event_diversity": Q.user_event_diversity,             # bitlen entropy feature (r6e)
        "embedding_dim_stats": Q.embedding_dim_stats,               # per-dim standardization stats (r6e)
        "event_hourly_seasonality": Q.event_hourly_seasonality,     # hour-of-day profile (r6e)
        "kg_attr_coverage": Q.kg_attr_coverage,                     # KG completeness metric (r6e)
        "kg_label_collisions": Q.kg_label_collisions,               # label ambiguity metric (r6e)
        "doc_prefix_dup_groups": Q.doc_prefix_dup_groups,           # truncation-dup detector (r6e)
        "orders_monthly_growth": Q.orders_monthly_growth,           # MoM growth, sign-split DIV (r6e)
        "tpch_q4": Q.tpch_q4,                                       # EXISTS semi-join Q4 (r6e)
        "tpch_q14": Q.tpch_q14,                                     # promo share, pushed month filter (r6e)
        "tpch_q19": Q.tpch_q19,                                     # OR-of-conjunctions join (r6e)
        "nation_coverage_full_join": Q.nation_coverage_full_join,   # FULL OUTER shape (r6e)
        "orders_above_avg": Q.orders_above_avg,                     # scalar-subquery shape (r6e)
        "event_stats_unpivot": Q.event_stats_unpivot,               # UNPIVOT/melt shape (r6e)
        "part_price_quartiles": Q.part_price_quartiles,             # NTILE window shape (r6e)
        "priority_revenue_share": Q.priority_revenue_share,         # ratio-to-report window (r6e)
        "revenue_grouping_sets": Q.revenue_grouping_sets,           # explicit GROUPING SETS (r6e)
        "doc_zorder_key": Q.doc_zorder_key,                         # Morton export layout key (r6e)
        "embedding_pq_codes": Q.embedding_pq_codes,                 # product quantization (r6e)
        "embedding_knn_graph": Q.embedding_knn_graph,               # kNN graph build (r6e)
        "kg_entity_provenance": Q.kg_entity_provenance,             # proxy provenance audit (r6e)
        "event_moving_sum": Q.event_moving_sum,                     # RANGE-frame window
        "event_asof_join": Q.event_asof_join,                       # as-of via union+window (r3)
        "event_range_join": Q.event_range_join,                     # banded interval join (r3)
        "event_hypertable_rollup": Q.event_hypertable_rollup,       # multi-res rollup (r3)
        "event_gaps": Q.event_gaps,                                 # O29 lead
        "top10_orders": Q.top10_orders,                             # O31 top-k
        "lineitem_except_all": Q.lineitem_except_all,               # O32 set op
        "distinct_segments": Q.distinct_segments,                   # O27
        "events_isin_counts": Q.events_isin_counts,                 # O15/O16
        "events_json_k": Q.events_json_k,                           # O39 JSON
        "best_order_per_customer": Q.best_order_per_customer,       # O24 max_by
        "event_type_stats": Q.event_type_stats,                     # O26
        "latest_event_per_user": Q.latest_event_per_user,           # O30
        "norm_iri_demo": Q.norm_iri_demo,                           # O33
        "revenue_rollup": Q.revenue_rollup,                         # rollup
        "revenue_cube": Q.revenue_cube,                             # cube (r3)
        "nation_intersect": Q.nation_intersect,                     # intersect (r3)
        "event_value_percentiles": Q.event_value_percentiles,       # exact pct (r3)
        "event_value_outliers": Q.event_value_outliers,             # median/MAD rule (r6c)
        "event_session_window_stats": Q.event_session_window_stats,  # native session_window (r6c)
        "event_value_pivot": Q.event_value_pivot,                   # pivot
        "event_sessions": Q.event_sessions,                         # sessionize
        # training-data-pipeline operators (task brief: dedup/ANN/text)
        "dedup_exact": Q.dedup_exact,
        "contamination_check": Q.contamination_check,  # train/eval leak detector (r5)
        "dedup_minhash_pairs": Q.dedup_minhash_pairs,       # MinHash+LSH
        "dedup_clusters": Q.dedup_clusters,
        "dedup_keep_best": Q.dedup_keep_best,      # quality-aware keeper (r6c)                 # near-dup keeper decision
        "dedup_rate_by_source": Q.dedup_rate_by_source,     # per-source drop metric (r5)
        "para_dedup": Q.para_dedup,                         # paragraph boilerplate pairs (r6)
        "doc_repetition_stats": Q.doc_repetition_stats,     # Gopher repetition flags (r6b)
        "boilerplate_rate": Q.boilerplate_rate,             # exact cross-doc para dedup (r6b)
        "doc_simhash": Q.doc_simhash,
        "dedup_simhash_pairs": Q.dedup_simhash_pairs,
        "ngram_jaccard_pairs": Q.ngram_jaccard_pairs,
        "dedup_containment": Q.dedup_containment,  # asymmetric C>=0.8 (r6c)
        "embedding_neardup": Q.embedding_neardup,
        "embedding_neardup_trained": Q.embedding_neardup_trained,  # Lloyd-assigned cells
        "ann_topk": Q.ann_topk,                             # brute-force ANN
        "ann_ivf": Q.ann_ivf,                               # IVF-cell ANN
        "ann_ivf_probe": Q.ann_ivf_probe,                   # trained IVF, nprobe=2
        "ann_recall": Q.ann_recall,
        "ann_mips": Q.ann_mips,                    # int-exact inner-product top-k (r6c)                         # recall@k eval (r3)
        "distinct_kmv_sketch": Q.distinct_kmv_sketch,       # KMV sketch (r3)
        "doc_split_assign": Q.doc_split_assign,             # det. train/val/test (r3)
        "doc_quota_sample": Q.doc_quota_sample,             # balanced per-stratum top-k (r5)
        "doc_resample": Q.doc_resample,                     # source-weighted resampling (r6)
        "doc_bigram_surprisal": Q.doc_bigram_surprisal,     # integer perplexity proxy (r6)
        "doc_chunk": Q.doc_chunk,                           # RAG token-window chunking (r6)
        "event_session_stats": Q.event_session_stats,       # per-session rollup (r6)
        "dedup_ngram_coverage": Q.dedup_ngram_coverage,     # dup-shingle fraction (r6)
        "rdf_turtle_bnode_roundtrip": Q.rdf_turtle_bnode_roundtrip,  # [ ] / ( ) forms (r6)
        "entity_link_prediction": Q.entity_link_prediction,  # common-neighbor cn>=2 (r6)
        "entity_link_adamic": Q.entity_link_adamic,  # bitlen AA + e6 Jaccard (r6c)
        "kg_negative_edges": Q.kg_negative_edges,    # deterministic corruption sampling (r6c)
        "entity_neighbor_agg": Q.entity_neighbor_agg,  # one message-passing round (r6c)
        "entity_clustering_coef": Q.entity_clustering_coef,  # e6 local clustering (r6c)
        "entity_degree_hist": Q.entity_degree_hist,    # log2 degree distribution (r6c)
        "entity_ppr": Q.entity_ppr,                    # personalized PageRank (r6c)
        "term_pmi": Q.term_pmi,                        # log-domain PMI collocations (r6c)
        "embedding_srp_buckets": Q.embedding_srp_buckets,  # SRP-LSH histogram (r6c)
        "dedup_incremental_pairs": Q.dedup_incremental_pairs,  # arriving-batch LSH (r6c)
        "entity_top_neighbors": Q.entity_top_neighbors,  # related-entities top-3 (r6c)
        "dedup_minhash_calibration": Q.dedup_minhash_calibration,  # estimator error (r6c)
        "doc_surprisal_heldout": Q.doc_surprisal_heldout,  # cross-split LM filter (r6c)
        "event_value_histogram": Q.event_value_histogram,  # equi-width e6 buckets (r6c)
        "kg_sparql_values": Q.kg_sparql_values,        # VALUES + MIN/MAX aggs (r6c)
        "kg_sparql_path_nps": Q.kg_sparql_path_nps,    # negated property set (r6c)
        "embedding_label_centroids": Q.embedding_label_centroids,  # k-means M-step (r6c)
        "embedding_kmeans_assign": Q.embedding_kmeans_assign,  # k-means E-step (r6c)
        "embedding_kmeans_inertia": Q.embedding_kmeans_inertia,  # convergence metric (r6c)
        "embedding_kmeans_train": Q.embedding_kmeans_train,  # 2 Lloyd rounds unrolled (r6c)
        "doc_type_token_ratio": Q.doc_type_token_ratio,  # lexical diversity e6 (r6c)
        "kg_class_cooccurrence": Q.kg_class_cooccurrence,  # schema-level affinity (r6c)
        "entity_degree_moments": Q.entity_degree_moments,  # assortativity moments (r6c)
        "vocab_growth": Q.vocab_growth,                # Heaps-law growth curve (r6c)
        "entity_neighbor_sample": Q.entity_neighbor_sample,  # GraphSAGE fanout sample (r6c)
        "event_debounce": Q.event_debounce,            # spam/sensor suppression (r6c)
        "event_type_transitions": Q.event_type_transitions,  # Markov flow matrix (r6c)
        "dedup_cluster_size_hist": Q.dedup_cluster_size_hist,  # cluster-size readout (r6c)
        "corpus_stats_by_source": Q.corpus_stats_by_source,  # per-source corpus card (r6c)
        "event_user_lifetime": Q.event_user_lifetime,  # LTV/churn base table (r6c)
        "embedding_quantize": Q.embedding_quantize,          # int8 SQ + recon error (r6)
        "event_funnel": Q.event_funnel,
        "event_retention_cohorts": Q.event_retention_cohorts,  # cohort x offset (r6c)
        "event_cumulative_users": Q.event_cumulative_users,    # distinct-user growth curve (r6c)
        "kg_label_index": Q.kg_label_index,                    # O7 inverted label index (r6c)
        "doc_search_topk": Q.doc_search_topk,                  # BM25-shaped top-10 search (r6c)
        "heavy_hitters_cms": Q.heavy_hitters_cms,            # count-min sketch top-k (r6)
        "bpe_merge_pairs": Q.bpe_merge_pairs,                # BPE pair counts round 1 (r6)
        "bpe_vocab_merges": Q.bpe_vocab_merges,              # iterative 3-round BPE (r6c)
        "bpe_encode_counts": Q.bpe_encode_counts,            # tokenizer application (r6c)
        "kg_sparql_ask": Q.kg_sparql_ask,                    # ASK existence probes (r6)
        "kg_sparql_describe": Q.kg_sparql_describe,          # DESCRIBE outgoing edges (r6)
        "doc_pack_assign": Q.doc_pack_assign,               # sequence packing (r4)
        "training_export": Q.training_export,               # curate→split→pack composed (r4)
        "training_export_clean": Q.training_export_clean,   # + contamination gate (r5)
        "top_terms_tfidf": Q.top_terms_tfidf,               # int-exact tf-idf top-k (r3)
        "text_quality": Q.text_quality,
        "token_counts": Q.token_counts,
        "doc_fingerprint": Q.doc_fingerprint,
        "langid": Q.langid,
        "langid_confusion": Q.langid_confusion,    # classifier eval matrix (r6c)                                 # full oracle (r2)
        "pii_scrub": Q.pii_scrub,                           # PII redaction (r6)
        "pii_rate_by_source": Q.pii_rate_by_source,         # PII filter-rate metric (r6)
        "curate_corpus": Q.curate_corpus,                   # composed keep/drop decision
        # RDF serialization round-trips (O9-O11 reference parity)
        "rdf_ntriples_roundtrip": Q.rdf_ntriples_roundtrip,
        "rdf_turtle_roundtrip": Q.rdf_turtle_roundtrip,
        "rdf_turtle_doc_roundtrip": Q.rdf_turtle_doc_roundtrip,  # @prefix doc grammar (r5)
        "rdf_xml_roundtrip": Q.rdf_xml_roundtrip,
        "rdf_jsonld_roundtrip": Q.rdf_jsonld_roundtrip,
        "rdf_jsonld_expanded_roundtrip": Q.rdf_jsonld_expanded_roundtrip,  # expanded profile (r5)
        "rdf_jsonld_compacted_roundtrip": Q.rdf_jsonld_compacted_roundtrip,
        "rdf_jsonld_list_roundtrip": Q.rdf_jsonld_list_roundtrip,  # @list chains + unroll (r6c)
        "xml_transform": Q.xml_transform,           # O12 XSLT-analogue
        "kg_predicate_counts": Q.kg_predicate_counts,
        # graph-carrying quad round-trips (O11 N-Quads/TriG, r3)
        "kg_quads_full": Q.kg_quads_full,           # D4 quad model
        "rdf_nquads_roundtrip": Q.rdf_nquads_roundtrip,
        "rdf_trig_roundtrip": Q.rdf_trig_roundtrip,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "kg_spans_flat": OS.SPANS_SQL,
        "kg_span_invariant": OS.SPAN_INVARIANT_SQL,
        "kg_mentions": OS.MENTIONS_SQL,
        "kg_mention_counts": OS.MENTION_COUNTS_SQL,
        "kg_link_edges": OS.EDGES_SQL,
        "kg_entities": OS.ENTITIES_SQL,
        "kg_entity_attrs": OS.ENTITY_ATTRS_SQL,
        "kg_triples": OS.TRIPLES_SQL,
        "kg_triples_full": OS.TRIPLES_FULL_SQL,
        "kg_graph_counts": OS.GRAPH_COUNTS_SQL,
        "kg_entity_class": OS.ENTITY_CLASS_SQL,
        "kg_entity_props": OS.ENTITY_PROPS_SQL,
        "kg_props_triples": OS.PROPS_TRIPLES_SQL,
        "kg_entity_cooccurrence": OS.ENTITY_COOCCURRENCE_SQL,
        "kg_bgp_match": OS.BGP_MATCH_SQL,
        "kg_bgp_optional": OS.BGP_OPTIONAL_SQL,
        "kg_bgp_filter": OS.BGP_FILTER_SQL,
        "kg_bgp_union": OS.BGP_UNION_SQL,
        "kg_sameas_closure": OS.SAMEAS_CLOSURE_SQL,
        "kg_sameas_degree": OS.SAMEAS_DEGREE_SQL,
        "kg_entity_media": OS.ENTITY_MEDIA_SQL,
        "kg_media_triples": OS.MEDIA_TRIPLES_SQL,
        "kg_sparql_topk": OS.SPARQL_TOPK_SQL,
        "kg_sparql_construct": OS.SPARQL_CONSTRUCT_SQL,
        "kg_sparql_groupby": OS.SPARQL_GROUPBY_SQL,
        "kg_sparql_lang": OS.SPARQL_LANG_SQL,
        "kg_sparql_graph": OS.SPARQL_GRAPH_SQL,
        "kg_sparql_path_seq": OS.SPARQL_PATH_SEQ_SQL,
        "kg_sparql_path_star": OS.SPARQL_PATH_STAR_SQL,
        "kg_sparql_subquery": OS.SPARQL_SUBQUERY_SQL,
        "kg_sparql_union_nested": OS.SPARQL_UNION_NESTED_SQL,
        "kg_sparql_avg": OS.SPARQL_AVG_SQL,
        "kg_sparql_optional_filter": OS.SPARQL_OPTIONAL_FILTER_SQL,
        "kg_sparql_group_concat": OS.SPARQL_GROUP_CONCAT_SQL,
        "kg_sparql_update": OS.KG_SPARQL_UPDATE_SQL,
        "kg_sparql_modify": OS.KG_SPARQL_MODIFY_SQL,
        "kg_sparql_from": OS.KG_SPARQL_FROM_SQL,
        "kg_sparql_select_expr": OS.SPARQL_SELECT_EXPR_SQL,
        "kg_sparql_optional_exists": OS.SPARQL_OPTIONAL_EXISTS_SQL,
        "kg_sparql_builtins": OS.SPARQL_BUILTINS_SQL,
        "kg_sparql_term_fns": OS.SPARQL_TERM_FNS_SQL,
        "kg_sparql_isnumeric": OS.SPARQL_ISNUMERIC_SQL,
        "event_value_outliers": OS.EVENT_OUTLIERS_SQL,
        "event_session_window_stats": OS.EVENT_SESSION_WINDOW_SQL,
        "kg_sparql_sameterm": OS.SPARQL_SAMETERM_SQL,
        "kg_sparql_encode": OS.SPARQL_ENCODE_SQL,
        "kg_sparql_term_ctors": OS.SPARQL_TERM_CTORS_SQL,
        "kg_sparql_construct_where": OS.SPARQL_CONSTRUCT_WHERE_SQL,
        "kg_sparql_load": OS.KG_SPARQL_LOAD_SQL,
        "contamination_check": OS.CONTAMINATION_SQL,
        "entity_pagerank": OS.ENTITY_PAGERANK_SQL,
        "entity_triangle_counts": OS.ENTITY_TRIANGLES_SQL,
        "entity_kcore": OS.ENTITY_KCORE_SQL,
        "entity_communities": OS.ENTITY_COMMUNITIES_SQL,
        "entity_hops": OS.ENTITY_HOPS_SQL,
        "training_export_clean": OS.TRAINING_EXPORT_CLEAN_SQL,
        "doc_quota_sample": OS.DOC_QUOTA_SAMPLE_SQL,
        "doc_resample": OS.DOC_RESAMPLE_SQL,
        "doc_bigram_surprisal": OS.DOC_BIGRAM_SURPRISAL_SQL,
        "doc_chunk": OS.DOC_CHUNK_SQL,
        "event_session_stats": OS.EVENT_SESSION_STATS_SQL,
        "dedup_ngram_coverage": OS.DEDUP_NGRAM_COVERAGE_SQL,
        "rdf_turtle_bnode_roundtrip": OS.RDF_TURTLE_BNODE_SQL,
        "entity_link_prediction": OS.ENTITY_LINK_PRED_SQL,
        "entity_link_adamic": OS.ENTITY_LINK_ADAMIC_SQL,
        "kg_negative_edges": OS.KG_NEGATIVE_EDGES_SQL,
        "entity_neighbor_agg": OS.ENTITY_NEIGHBOR_AGG_SQL,
        "entity_clustering_coef": OS.ENTITY_CLUSTERING_SQL,
        "entity_degree_hist": OS.ENTITY_DEGREE_HIST_SQL,
        "entity_ppr": OS.ENTITY_PPR_SQL,
        "term_pmi": OS.TERM_PMI_SQL,
        "embedding_srp_buckets": OS.EMBEDDING_SRP_SQL,
        "dedup_incremental_pairs": OS.DEDUP_INCREMENTAL_SQL,
        "entity_top_neighbors": OS.ENTITY_TOP_NEIGHBORS_SQL,
        "dedup_minhash_calibration": OS.DEDUP_MINHASH_CALIB_SQL,
        "doc_surprisal_heldout": OS.DOC_SURPRISAL_HELDOUT_SQL,
        "event_value_histogram": OS.EVENT_VALUE_HISTOGRAM_SQL,
        "kg_sparql_values": OS.SPARQL_VALUES_SQL,
        "kg_sparql_path_nps": OS.SPARQL_PATH_NPS_SQL,
        "embedding_label_centroids": OS.EMBEDDING_CENTROIDS_SQL,
        "embedding_kmeans_assign": OS.EMBEDDING_KMEANS_ASSIGN_SQL,
        "embedding_kmeans_inertia": OS.EMBEDDING_KMEANS_INERTIA_SQL,
        "embedding_kmeans_train": OS.EMBEDDING_KMEANS_TRAIN_SQL,
        "doc_type_token_ratio": OS.DOC_TTR_SQL,
        "kg_class_cooccurrence": OS.KG_CLASS_COOCC_SQL,
        "entity_degree_moments": OS.ENTITY_DEGREE_MOMENTS_SQL,
        "vocab_growth": OS.VOCAB_GROWTH_SQL,
        "entity_neighbor_sample": OS.ENTITY_NEIGHBOR_SAMPLE_SQL,
        "event_debounce": OS.EVENT_DEBOUNCE_SQL,
        "event_type_transitions": OS.EVENT_TRANSITIONS_SQL,
        "dedup_cluster_size_hist": OS.DEDUP_CLUSTER_HIST_SQL,
        "corpus_stats_by_source": OS.CORPUS_STATS_SQL,
        "event_user_lifetime": OS.EVENT_USER_LIFETIME_SQL,
        "embedding_quantize": OS.EMBEDDING_QUANTIZE_SQL,
        "event_funnel": OS.EVENT_FUNNEL_SQL,
        "event_retention_cohorts": OS.EVENT_RETENTION_SQL,
        "event_cumulative_users": OS.EVENT_CUM_USERS_SQL,
        "kg_label_index": OS.KG_LABEL_INDEX_SQL,
        "doc_search_topk": OS.DOC_SEARCH_TOPK_SQL,
        "scd2_user_state": OS.SCD2_USER_STATE_SQL,
        "dedup_winnow_pairs": OS.DEDUP_WINNOW_SQL,
        "kg_void_summary": OS.KG_VOID_SUMMARY_SQL,
        "kg_graph_hash": OS.KG_GRAPH_HASH_SQL,
        "kg_store_merge": OS.KG_STORE_MERGE_SQL,
        "kg_store_diff": OS.KG_STORE_DIFF_SQL,
        "kg_parse_error_stats": OS.KG_PARSE_ERROR_STATS_SQL,
        "embedding_dim_stats": OS.EMBEDDING_DIM_STATS_SQL,
        "kg_attr_coverage": OS.KG_ATTR_COVERAGE_SQL,
        "kg_label_collisions": OS.KG_LABEL_COLLISIONS_SQL,
        "kg_component_size_hist": OS.KG_COMPONENT_SIZE_HIST_SQL,
        "embedding_pq_codes": OS.EMBEDDING_PQ_CODES_SQL,
        "embedding_knn_graph": OS.EMBEDDING_KNN_GRAPH_SQL,
        "kg_entity_provenance": OS.ENTITY_PROVENANCE_SQL,
        "heavy_hitters_cms": OS.HEAVY_HITTERS_CMS_SQL,
        "bpe_merge_pairs": OS.BPE_MERGE_PAIRS_SQL,
        "bpe_vocab_merges": OS.BPE_VOCAB_MERGES_SQL,
        "bpe_encode_counts": OS.BPE_ENCODE_SQL,
        "kg_sparql_ask": OS.SPARQL_ASK_SQL,
        "kg_sparql_describe": OS.SPARQL_DESCRIBE_SQL,
        "dedup_rate_by_source": OS.DEDUP_RATE_BY_SOURCE_SQL,
        "para_dedup": OS.PARA_DEDUP_SQL,
        "doc_repetition_stats": OS.DOC_REPETITION_SQL,
        "boilerplate_rate": OS.BOILERPLATE_RATE_SQL,
        "kg_media_features": OS.MEDIA_FEATURES_SQL,
    }
    out.update(OS.RELATIONAL_SQL)
    out.update(
        {
            "dedup_exact": OS.DEDUP_EXACT_SQL,
            "dedup_minhash_pairs": OS.MINHASH_LSH_PAIRS_SQL,
            "dedup_clusters": OS.DEDUP_CLUSTERS_SQL,
            "dedup_keep_best": OS.DEDUP_KEEP_BEST_SQL,
            "doc_simhash": OS.DOC_SIMHASH_SQL,
            "dedup_simhash_pairs": OS.SIMHASH_PAIRS_SQL,
            "ngram_jaccard_pairs": OS.NGRAM_JACCARD_SQL,
            "dedup_containment": OS.DEDUP_CONTAINMENT_SQL,
            "embedding_neardup": OS.EMBEDDING_NEARDUP_SQL,
            "embedding_neardup_trained": OS.EMBEDDING_NEARDUP_TRAINED_SQL,
            "ann_topk": OS.ANN_TOPK_SQL,
            "ann_ivf": OS.ANN_IVF_SQL,
            "ann_ivf_probe": OS.ANN_IVF_PROBE_SQL,
            "ann_recall": OS.ANN_RECALL_SQL,
        "ann_mips": OS.ANN_MIPS_SQL,
            "distinct_kmv_sketch": OS.KMV_SKETCH_SQL,
            "doc_split_assign": OS.DOC_SPLIT_SQL,
            "doc_pack_assign": OS.DOC_PACK_SQL,
            "training_export": OS.TRAINING_EXPORT_SQL,
            "top_terms_tfidf": OS.TOP_TERMS_TFIDF_SQL,
            "text_quality": OS.TEXT_QUALITY_SQL,
            "token_counts": OS.TOKEN_COUNTS_SQL,
            "doc_fingerprint": OS.DOC_FINGERPRINT_SQL,
            "langid": OS.LANGID_SQL,
        "langid_confusion": OS.LANGID_CONFUSION_SQL,
        "pii_scrub": OS.PII_SCRUB_SQL,
        "pii_rate_by_source": OS.PII_RATE_BY_SOURCE_SQL,
            "curate_corpus": OS.CURATE_SQL,
            # round-trips must reproduce the independent FULL-TERM oracle
            # (lossless including @lang tags and ^^datatypes)
            "rdf_ntriples_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_turtle_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_turtle_doc_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_xml_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_jsonld_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_jsonld_expanded_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_jsonld_compacted_roundtrip": OS.TRIPLES_FULL_SQL,
            "rdf_jsonld_list_roundtrip": OS.JSONLD_LIST_SQL,
            "xml_transform": OS.XML_TRANSFORM_SQL,
            "kg_predicate_counts": OS.PREDICATE_COUNTS_SQL,
            # quad round-trips reproduce the independent QUAD oracle
            # (lossless including the named graph g)
            "kg_quads_full": OS.QUADS_FULL_SQL,
            "rdf_nquads_roundtrip": OS.QUADS_FULL_SQL,
            "rdf_trig_roundtrip": OS.QUADS_FULL_SQL,
        }
    )
    return out
