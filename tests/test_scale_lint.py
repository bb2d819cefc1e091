"""Scale-safety lint: no NEW corpus-pinning call sites.

The engine's design rule (SURVEY.md §6: "no stage may materialize the
corpus") is enforced here structurally: every ``materialize()`` /
``take_all()`` / ``to_pandas()`` call inside the package must appear in
the audited allowlist below with a boundedness class.  Adding one
without extending the list fails this test — the point is to force the
same audit the round-2/3 verdicts ran by hand (the stage-B triples pin
and the minhash signature pin were exactly this bug class).

Boundedness classes:
  batch-local   to_pandas on ONE batch inside a map_batches fn — never
                the dataset (the batch is already in worker memory)
  node-sided    O(V) graph-side table (rides broadcast_join's size gate)
  group-sized   post-aggregation result (rows = #groups, not #records)
  k-sized       top-k / sketch / quantile output (rows = k)
  sample-sized  bounded hash-sample or benchmark-sized input
  serving       LocalKG / daemon pull, hard byte budget with early abort
  shard-scoped  per-shard checkpoint inside the resume unit
  iterative     per-round reuse in a bounded driver loop over an
                edge-or-node-sided working set (the documented cost of
                iterative analytics; re-derived, never the input corpus)
"""

import ast
import os

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "neo4j_document_pipeline_ray")

WATCHED = {"materialize", "take_all", "to_pandas", "to_arrow_refs"}

# (relpath-in-package :: dotted enclosing scope) -> boundedness class
ALLOWED = {
    "cli.py::cmd_build": "group-sized",          # post-build stats row
    "cli.py::cmd_query": "k-sized",
    "cli.py::cmd_stats.counts": "group-sized",
    "extras/decontam.py::benchmark_gram_set": "sample-sized",  # size-guarded
    "extras/dedup.py::_doc_segments": "batch-local",
    "extras/dedup.py::connected_components": "iterative",  # node-sided labels
    "extras/dedup.py::near_dedup_keep": "group-sized",  # pair/cluster tables
    "extras/dedup.py::ngram_jaccard_pairs": "group-sized",  # capped pair set
    "extras/dedup.py::segment_dedup": "group-sized",  # duplicated-seg keys
    "extras/dedup.py::simhash_near_pairs": "group-sized",  # banded candidates
    "extras/importance.py::dsir_importance": "k-sized",  # hashed gram counts
    "extras/importance.py::dsir_importance.partial_counts": "batch-local",
    "extras/importance.py::dsir_importance.score": "batch-local",
    "extras/similarity.py::_hash_sample": "sample-sized",
    "extras/similarity.py::_hash_sample.keep": "batch-local",
    "extras/similarity.py::bitext_mine": "node-sided",  # size-gated src matrix
    "extras/similarity.py::build_ann_index": "k-sized",  # bucket manifest
    "extras/similarity.py::doc_hybrid_topk": "group-sized",  # scalar stats
    "extras/textstats.py::distinct_tokens_kmv": "k-sized",
    "extras/textstats.py::grouped_distinct_tokens_kmv.partial_kmin":
        "batch-local",  # ONE key column of one batch, for the group map
    "extras/textstats.py::familiarity_bucket": "k-sized",  # 2 cut points
    "extras/textstats.py::familiarity_bucket.fam": "batch-local",
    "extras/textstats.py::length_quantiles": "k-sized",
    "extras/textstats.py::repetition_batch": "batch-local",
    "extras/textstats.py::salient_terms.tf_batch": "batch-local",
    "extras/textstats.py::salient_terms.topk": "batch-local",
    "extras/textstats.py::unigram_logprob": "k-sized",  # vocab table
    "extras/textstats.py::unigram_logprob.score": "batch-local",
    "extras/bpe.py::bpe_train": "iterative",  # vocab table per round; top-1 take
    "pipelines/graph_algo.py::betweenness_approx": "iterative",
    "pipelines/graph_algo.py::rule_mining": "k-sized",  # top-k rules + corr probe
    "pipelines/graph_algo.py::bfs_distances": "iterative",
    "pipelines/graph_algo.py::harmonic_centrality_approx": "iterative",
    "pipelines/graph_algo.py::minimum_spanning_forest": "iterative",
    "pipelines/graph_algo.py::neighborhood_function": "iterative",
    "pipelines/graph_algo.py::neighborhood_function.nf_estimate":
        "group-sized",  # one partial-sum row per block
    "pipelines/graph_algo.py::cooccurrence_topk": "node-sided",
    # rows = #distinct rel_types (schema-sized)
    "pipelines/graph_algo.py::relation_cardinality._small": "group-sized",
    # O(#hosts) score table; empty-set guard for all-intra-host crawls
    "extras/urls.py::host_harmonic": "node-sided",
    # max(k, rerank) candidate head pulled for the exact re-rank filter
    "extras/similarity.py::pq_topk": "k-sized",
    # bounded driver loop: frontier <= seeds * fanout^hop per round
    "pipelines/graph_algo.py::ego_net_sample": "iterative",
    # O(k x n_cols x n_batches) sketch partials, corpus-independent
    "extras/profile.py::table_profile": "k-sized",
    # post-limit(k) head converted to a TYPED arrow table
    "extras/urls.py::_typed_head": "k-sized",
    "pipelines/graph_algo.py::hits": "iterative",
    "pipelines/graph_algo.py::hits._max_of": "group-sized",  # 1 row
    "pipelines/graph_algo.py::kcore": "iterative",
    "pipelines/graph_algo.py::label_prop_communities": "iterative",
    "pipelines/graph_algo.py::link_prediction_ra_topk": "iterative",
    "pipelines/graph_algo.py::link_prediction_topk": "iterative",
    "pipelines/graph_algo.py::node_similarity_topk": "iterative",
    "pipelines/graph_algo.py::pagerank": "iterative",
    "pipelines/graph_algo.py::personalized_pagerank": "iterative",
    "pipelines/graph_algo.py::random_walks": "iterative",  # walk frontier
    "pipelines/graph_algo.py::related_docs_topk": "node-sided",  # doc sizes
    "pipelines/graph_algo.py::shortest_path_between": "iterative",
    "pipelines/graph_algo.py::sssp_weighted": "iterative",
    "pipelines/graph_algo.py::sssp_weighted._fingerprint": "group-sized",
    "pipelines/graph_algo.py::_triangle_hits": "iterative",
    "pipelines/graphrag.py::_bm25_corpus_stats": "group-sized",
    "pipelines/graphrag.py::_bm25_with_retry": "k-sized",
    "pipelines/graphrag.py::build_text_index": "group-sized",  # df meta row
    "pipelines/graphrag.py::doc_titles_for_nodes": "k-sized",
    "pipelines/graphrag.py::fetch_rel_payload": "k-sized",
    "pipelines/graphrag.py::first_doc_for_nodes": "k-sized",
    "pipelines/graphrag.py::graphrag": "k-sized",
    "pipelines/graphrag.py::hybrid_candidates._kw": "k-sized",
    "pipelines/graphrag.py::hybrid_candidates._vec": "k-sized",
    "pipelines/graphrag.py::traverse_neighbors": "k-sized",  # frontier ids
    "pipelines/graphrag_local.py::LocalKG.__init__": "serving",
    "pipelines/kg_build.py::build_kg": "group-sized",  # post-agg tables
    "pipelines/snapshot.py::run_extraction_shard": "shard-scoped",
    "pipelines/windows.py::q_events_late_data": "group-sized",  # K-range span
    "pipelines/windows.py::q_events_retention": "group-sized",  # (user,day)
    "serve.py::GraphRAGService.documents.compute": "group-sized",
    "serve.py::GraphRAGService.graph_schema.compute": "group-sized",
    "serve.py::GraphRAGService.graph_stats.compute.counts": "group-sized",
    "serve.py::GraphRAGService.search": "k-sized",
    "serve.py::_load_tables": "serving",
    # per-query k-sized heads only (truth + two pruned index probes)
    "extras/similarity.py::ann_recall_report": "k-sized",
    # (lang, token) fixed-point model table, vocab-sized like
    # unigram_logprob's; min-df prune prescribed at open-web scale
    "extras/textstats.py::nb_lang_classifier": "k-sized",
    "extras/textstats.py::nb_lang_classifier.score": "batch-local",
    # WL refinement: node-sided label table re-materialized per round
    "pipelines/graph_algo.py::wl_roles": "iterative",
    # SCC label refinement: shrinking edge set + node-sided (f, b)
    # labels per outer round; fingerprint is one scalar row
    "pipelines/graph_algo.py::strongly_connected_components": "iterative",
    "pipelines/graph_algo.py::strongly_connected_components._fingerprint":
        "group-sized",
    "pipelines/graph_algo.py::strongly_connected_components._min_prop":
        "iterative",
    # k-truss peeling: shrinking edge set re-materialized per round
    "pipelines/graph_algo.py::ktruss": "iterative",
    # bowtie: SCC output + frontier BFS over edge/node-sided tables
    "pipelines/graph_algo.py::bowtie_classes": "iterative",
    "pipelines/graph_algo.py::bowtie_classes._reach": "iterative",
    # dyad-state table: one row per undirected edge, stamped onto the
    # streaming triangle pass by three size-gated joins
    "pipelines/graph_algo.py::triad_census": "iterative",
    # edge-sided distinct pair/degree tables, each reused by several
    # consumers; moments fold to ONE row (re-derived, never the corpus)
    "pipelines/graph_algo.py::structural_profile": "iterative",
    "stages/grouped.py::broadcast_join": "node-sided",  # size-gated right
    "stages/grouped.py::drop_empty_blocks": "group-sized",  # Ray 2.49 bug tax
    "stages/grouped.py::partitioned_group_map.add_pk": "batch-local",
    # adaptive=True fast path only: callers opt into pinning their
    # exchange INPUT (node/edge/schema-sided partials per the doc);
    # corpus-keyed callers keep the default streaming sort path
    "stages/grouped.py::partitioned_group_map": "group-sized",
    # typed distinct edge set pinned for the fused in-task closure
    # (edge-sided, same class as the module's other edge pins)
    "pipelines/graph_algo.py::rule_mining._pin": "iterative",
}


def _collect():
    found = {}
    for root, _, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            rel = os.path.relpath(p, PKG)
            tree = ast.parse(open(p).read())

            def walk(node, stack):
                for child in ast.iter_child_nodes(node):
                    ns = stack
                    if isinstance(child, (ast.FunctionDef,
                                          ast.AsyncFunctionDef,
                                          ast.ClassDef)):
                        ns = stack + [child.name]
                    if (isinstance(child, ast.Call)
                            and isinstance(child.func, ast.Attribute)
                            and child.func.attr in WATCHED):
                        key = f"{rel}::{'.'.join(stack) or '<module>'}"
                        found.setdefault(key, set()).add(child.func.attr)
                    walk(child, ns)

            walk(tree, [])
    return found


class TestScaleLint:
    def test_no_unaudited_pin_sites(self):
        found = _collect()
        new = sorted(set(found) - set(ALLOWED))
        assert not new, (
            "NEW materialize/take_all/to_pandas call sites — audit each "
            "for boundedness at 100 TB and extend ALLOWED with its class "
            f"(or restructure to stream): {new}")

    def test_allowlist_has_no_dead_entries(self):
        found = _collect()
        dead = sorted(set(ALLOWED) - set(found))
        assert not dead, f"stale allowlist entries (code moved): {dead}"
