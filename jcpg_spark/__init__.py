"""jcpg_spark — PySpark-native knowledge-graph construction over agent transcripts.

A brand-new engine (NOT a port) with the capabilities of the reference
``nashid/JCPG`` (a Java code-property-graph generator), reinterpreted per
BASELINE.json's north rule as partition-parallel (subj, pred, obj) triple
extraction over tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Layer map (reference -> this engine):

- AST layer (``JavacpgCFGBuilder`` hierarchy edges)      -> ``ast.*`` triples
- CFG layer (``FLOWS_TO`` threading)                     -> ``flow.*`` triples
- ICFG layer (``CALLS``/``RETURN``)                      -> ``call``/``return``
- DDG layer (``DDG_U``/``DDG_D``/``SELF_FLOW`` def-use)  -> ``ref.*`` triples
- iterative fixpoint (``JavacpgDDGBuilder.java:102-117``) -> connected-components
  canonicalization -> ``same_as`` triples

Everything is DataFrame-first: stable turn ordering via a window over
``(conv_id, turn_idx)``, vectorized pandas/Arrow UDFs for text work,
broadcast joins for the entity dictionary, and driver-coordinated iterative
connected components for canonicalization.
"""

from jcpg_spark.session import get_spark
from jcpg_spark.pipeline import build_graph, edge_layers, node_layers, PipelineResult
from jcpg_spark.caching import clear_caches
from jcpg_spark.operators.canonicalize import connected_components, er_quality
from jcpg_spark.io import compaction_plan
from jcpg_spark.operators.bpe import pair_counts as bpe_pair_counts, train as bpe_train
from jcpg_spark.operators.curation import (
    corpus_build,
    k_anonymity_audit,
    k_anonymize,
    log_odds_drift,
    sft_pairs,
    weighted_sample_topk,
    corpus_profile_approx,
    zipf_fit,
    curation_decision,
    temperature_mix,
)
from jcpg_spark.operators.lm import (
    bigram_lm_scores,
    burrows_delta,
    kn_bigram_scores,
    sequence_transitions,
    sequence_typicality,
    ccnet_buckets,
    dsir_weights,
    ppmi_weights,
    skipgram_counts,
)
from jcpg_spark.operators.linking import (
    alias_priors,
    fuzzy_link,
    interval_join,
    link_asof,
    refresh_dictionary,
)
from jcpg_spark.operators.query import (
    ask,
    predicate_stats,
    reorder_patterns,
    construct,
    describe,
    match_pattern,
    match_query,
    union_patterns,
    update_graph,
)
from jcpg_spark.operators.reasoning import ifp_same_as, owl_entail, rdfs_entail, shacl_validate
from jcpg_spark.operators.retrieval import bm25_topk, tfidf_keywords
from jcpg_spark.operators.flow import interarrival_stats, topic_segments
from jcpg_spark.operators.structural import conversation_audit
from jcpg_spark.operators.subgraph import graph_asof, graph_diff, induced_subgraph
from jcpg_spark.operators.decontaminate import corpus_overlap
from jcpg_spark.operators.dedup import (
    boilerplate_spans,
    containment_pairs,
    boilerplate_texts,
    decontaminate,
    duplicate_spans,
    jaccard_pairs_prefix,
    keep_list,
    leakage_safe_split,
    scrub_boilerplate_spans,
    scrub_duplicate_spans,
    semantic_dedup,
)
from jcpg_spark.operators.similarity import (
    bitext_mine,
    class_centroids,
    pq_codebooks,
    pq_encode,
    pq_topk,
)
from jcpg_spark.operators.graph_analytics import (
    harmonic_centrality,
    attribute_assortativity,
    butterfly_counts,
    densest_subgraph,
    triad_census,
    link_predict_scores,
    bfs_distances,
    modularity,
    neighbor_sample,
    random_walks,
    rank_eval,
    cardinality_audit,
    characteristic_sets,
    entity_lifespan,
    negative_triples,
    resolve_functional,
    schema_graph,
    co_mention_edges,
    component_sizes,
    cooccurrence_lift,
    effective_diameter,
    graph_stats,
    neighborhood_function,
    scc,
    entity_salience,
    fastrp,
    hits,
    kcore,
    khop_counts,
    link_predict_common_neighbors,
    link_predict_resource_allocation,
    pagerank,
    triangle_counts,
    vertex_features,
    wl_fingerprint,
)
from jcpg_spark.plans.materialize import (
    append_conversations,
    read_graph_edges,
    run_pipeline,
)

__all__ = [
    "alias_priors",
    "attribute_assortativity",
    "burrows_delta",
    "butterfly_counts",
    "containment_pairs",
    "densest_subgraph",
    "graph_asof",
    "ifp_same_as",
    "interarrival_stats",
    "k_anonymity_audit",
    "k_anonymize",
    "kn_bigram_scores",
    "log_odds_drift",
    "predicate_stats",
    "refresh_dictionary",
    "reorder_patterns",
    "sequence_transitions",
    "sequence_typicality",
    "sft_pairs",
    "tfidf_keywords",
    "topic_segments",
    "triad_census",
    "weighted_sample_topk",
    "get_spark",
    "build_graph",
    "resolve_functional",
    "decontaminate",
    "corpus_overlap",
    "characteristic_sets",
    "schema_graph",
    "edge_layers",
    "node_layers",
    "PipelineResult",
    "clear_caches",
    "connected_components",
    "er_quality",
    "jaccard_pairs_prefix",
    "keep_list",
    "leakage_safe_split",
    "compaction_plan",
    "corpus_build",
    "corpus_profile_approx",
    "zipf_fit",
    "curation_decision",
    "temperature_mix",
    "bpe_pair_counts",
    "bpe_train",
    "graph_diff",
    "induced_subgraph",
    "bfs_distances",
    "bigram_lm_scores",
    "boilerplate_spans",
    "boilerplate_texts",
    "duplicate_spans",
    "class_centroids",
    "co_mention_edges",
    "component_sizes",
    "scc",
    "graph_stats",
    "neighborhood_function",
    "effective_diameter",
    "cooccurrence_lift",
    "link_predict_common_neighbors",
    "entity_salience",
    "modularity",
    "rank_eval",
    "bm25_topk",
    "ask",
    "construct",
    "describe",
    "harmonic_centrality",
    "link_predict_scores",
    "match_pattern",
    "owl_entail",
    "rdfs_entail",
    "shacl_validate",
    "match_query",
    "union_patterns",
    "update_graph",
    "bitext_mine",
    "neighbor_sample",
    "random_walks",
    "conversation_audit",
    "kcore",
    "khop_counts",
    "pagerank",
    "triangle_counts",
    "dsir_weights",
    "semantic_dedup",
    "scrub_boilerplate_spans",
    "scrub_duplicate_spans",
    "skipgram_counts",
    "ppmi_weights",
    "pq_codebooks",
    "pq_encode",
    "pq_topk",
    "fastrp",
    "hits",
    "link_predict_resource_allocation",
    "append_conversations",
    "read_graph_edges",
    "run_pipeline",
    "link_asof",
    "fuzzy_link",
    "interval_join",
    "vertex_features",
    "wl_fingerprint",
]
__version__ = "0.1.0"
