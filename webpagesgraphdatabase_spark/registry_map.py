"""The registry's documented merge map (VERDICT r13 item 7).

The driver's correctness gate hashes a ~50-row window, while the engine
carries far more operators than rows — so many registry rows are tagged
unions or keyed joins of several operators ("legs"). This module is the
lookup that replaces archaeology: for every ``queries()`` row, which
operator each of its legs carries and where that operator lives.
``python tools/check_oracle.py --list`` prints it (rows → legs, plus
the inverted operator → row index);
``tests/test_registry_plans.py`` pins that the map and the registry
never drift apart.

Leg entries are ``(leg, operator)`` pairs: ``leg`` is how the row
surfaces the operator (a tag-column value, a joined column group, or
``row`` when the whole row IS the operator); ``operator`` names the
implementation (module.function, SURVEY §2 IDs where one applies).
"""

MERGE_MAP: dict[str, list[tuple[str, str]]] = {
    # ---- scalar/function rows -------------------------------------
    "f_url_normalize": [
        ("row", "F1 functions.normalize_url (+F10 scheme check)"),
    ],
    "f_parse_enrichment": [
        ("row", "F2 functions.parse_category_and_keywords "
                "(allowlist + fallback, 19-branch CASE oracle)"),
    ],
    "f_fenced_json": [
        ("fenced_json", "F3 functions.strip_json_fence + parse"),
        ("truncate cols", "F4 truncation family"),
        ("trim cols", "F5 trim/strip"),
    ],
    # ---- mutation / crawl-state rows ------------------------------
    "m_mutation_counts": [
        ("merge counts", "M1/M2/M3 graph.mutations MERGE node/SET/rel"),
        ("delete counts", "M4/M5 DETACH DELETE + orphan DELETE"),
        ("cdc leg", "catalog.Warehouse CDC diff"),
    ],
    "w_rule_memory": [
        ("leg=rules", "crawl_state rule memory: latest-per-host "
                      "REPLACE, NULL-marker CLEAR, compaction-proof "
                      "reads (registry_mut.py)"),
        ("leg=allowed", "robots RFC 9309 longest-match adjudication "
                        "(allow wins ties, CLEAR/ruleless pass — "
                        "registry_mut.py:309)"),
    ],
    # ---- graph rows ------------------------------------------------
    "g_pagerank": [
        ("rank col", "graph.algorithms.pagerank (5 supersteps)"),
        ("ppr col", "personalized PageRank, data-derived seed"),
    ],
    "g_components": [
        ("component col", "graph.algorithms.connected_components"),
        ("reach cols", "bounded_reach (Cypher [*1..h] analog)"),
        ("community col", "label_propagation"),
        ("triangles col", "triangle_counts over "
                          "keyword_cooccurrence_edges"),
        ("dist_from_seed col", "bfs_distances (SSSP leg)"),
    ],
    "g_links_with_categories": [
        ("row", "P1/P9/J1 queries.links_with_categories"),
    ],
    "g_links_with_keywords": [("row", "J2 queries.links_with_keywords")],
    "g_interconnect_canonical": [
        ("row", "J3/O1 queries.interconnections_canonical "
                "(flagship 4-way join, top-k)"),
    ],
    "g_interconnect_symmetric": [
        ("row", "J3/P5 queries.interconnections_symmetric"),
    ],
    "g_interconnect_pair_counts": [
        ("row", "J3 queries.interconnection_pair_counts"),
    ],
    "g_links_per_category": [
        ("category rows", "A1 queries.links_per_category"),
        ("NULL-category row", "A1 queries.count_links (total)"),
    ],
    "g_integrity_checks": [
        ("check=orphan/Keyword", "J5 queries.orphan_keywords"),
        ("check=orphan/Category", "J5 queries.orphan_categories"),
        ("check=dup_id", "A4 queries.duplicate_node_ids"),
    ],
    "g_export_nodes": [("row", "S9/U1/P4 queries.export_nodes")],
    "g_export_edges": [("row", "S9/U1 queries.export_edges")],
    "g_top_keywords": [
        ("row", "A3/O5/F6/F7 queries.top_keywords (split+explode+"
                "value_counts desc)"),
    ],
    "g_distinct_categories": [
        ("row", "A2 via graph.cypher (translator oracle-checked; "
                "≡ queries.distinct_categories)"),
    ],
    "g_point_lookup": [("row", "P2 queries.point_lookup")],
    "g_sample_links": [("row", "O4 queries.sample_links (seeded)")],
    "g_viz_slice": [("row", "O2 queries.viz_slice (plain LIMIT)")],
    "g_motif_two_hop": [
        ("row", "graph.motif.motif_match 2-hop pattern"),
    ],
    # ---- dedup rows -----------------------------------------------
    "d_dedup_exact": [
        ("exact cols", "dedup.dedup_exact (digest-keyed keeper)"),
        ("n_segs/n_dropped/clean", "dedup.paragraph_dedup "
                                   "(CCNet-style segment dedup)"),
        ("cdc keep-set", "dedup.cdc_dedup (shifted-duplicate "
                         "content-defined chunking)"),
    ],
    "d_minhash_signatures": [("row", "dedup.minhash_signatures")],
    "d_lsh_candidates": [("row", "dedup.lsh_candidates (band-bucket)")],
    "d_neardup_jaccard": [
        ("row", "dedup.neardup_jaccard (shingle→minhash→LSH→verify)"),
    ],
    "d_simhash": [("row", "dedup.simhash (+ banded candidates)")],
    "d_dedup_clusters": [
        ("row", "dedup.dedup_clusters (pairs→components→keepers)"),
    ],
    "d_contamination": [
        ("row", "dedup.contamination (broadcast shingle semi-join "
                "decontamination)"),
    ],
    # ---- similarity rows ------------------------------------------
    "s_cosine_neardup": [
        ("part=pair", "similarity.cosine_neardup (exact block-matmul)"),
        ("part=semdedup", "similarity.semantic_dedup (cluster-bucketed "
                          "SemDeDup verdicts)"),
    ],
    "s_ann_methods": [
        ("method=exact", "similarity.ann_bruteforce (baseline)"),
        ("method=lsh", "similarity.ann_lsh (hyperplane LSH)"),
        ("method=ivf", "similarity.ann_ivf (auto-sized lists)"),
        ("method=sq8", "similarity.ann_sq8 (int8 + exact re-rank)"),
        ("method=bin", "similarity.ann_bin (1-bit signs, asymmetric)"),
        ("method=rrf", "search.rrf_fuse hybrid BM25+vector"),
    ],
    # ---- text rows ------------------------------------------------
    "t_lang_quality": [
        ("lang cols", "textstats.lang_id (n-gram heuristic)"),
        ("quality cols", "textstats quality features + Gopher rules"),
        ("token cols", "tokenize token counting"),
        ("pii cols", "pii.scan/redact (planted deterministic PII)"),
        ("lm cols", "textstats trigram/bigram LM fluency"),
        ("dsir col", "sampling.dsir_weights (importance to the "
                     "English target)"),
    ],
    "t_fingerprints": [
        ("fingerprint cols", "textstats min-shingle + Rabin-Karp "
                             "rolling fingerprints"),
        ("span cols", "dedup.duplicated_window_stats (Lee et al.)"),
        ("strip col", "dedup.strip_duplicated_spans (hashed rewrite)"),
        ("bm25 cols", "search.bm25_topk (ln-parity leg)"),
    ],
    "t_top_terms": [("row", "textstats.top_terms (tf-idf style)")],
    "t_repetition": [("row", "textstats.repetition (dup n-gram "
                             "ratios)")],
    "t_curation": [
        ("row", "curation keep/drop report (composition; WITH "
                "RECURSIVE oracle)"),
    ],
    "t_pack": [
        ("tok=ws", "packing.pack_sequences + tokenize.whitespace"),
        ("tok=bpe", "same packing under the BPE-ish regex tokenizer"),
        ("chunk fp", "packing.chunk_stats (RAG sliding-window "
                     "chunker)"),
    ],
    "t_stratified_sample": [
        ("mode=uniform", "sampling.stratified_sample (k per stratum)"),
        ("mode=weighted", "sampling.mixture_sample (per-lang quotas)"),
    ],
    # ---- multimodal rows ------------------------------------------
    "mm_byte_histogram": [
        ("row", "multimodal.byte_histogram (Arrow/pandas-UDF path)"),
    ],
    "mm_frame_sample": [("row", "multimodal.frame_sample")],
    "mm_decode_resize": [
        ("image cols", "multimodal fake-decode image meta + resize "
                       "arithmetic"),
        ("audio cols", "multimodal fake-decode audio features"),
    ],
    # ---- events rows ----------------------------------------------
    "e_user_rollup": [
        ("rollup cols", "events.user_rollup"),
        ("funnel cols", "events.funnel (ordered view→click→purchase)"),
        ("cohort cols", "events.user_cohort (retention basis)"),
    ],
    "e_top_events_per_user": [
        ("row", "events top-n per user (window rank)"),
    ],
    "e_sessionize": [("row", "events.sessionize (gap sessions)")],
    "e_windowed_counts": [
        ("window cols", "events tumbling window counts"),
        ("n_active_sessions", "events.range_join (bucketized interval "
                              "containment)"),
    ],
    "e_props_extract": [
        ("props cols", "events JSON prop extraction"),
        ("asof cols", "events as-of join (latest strictly-prior "
                      "click)"),
    ],
    # ---- analytics rows -------------------------------------------
    "a_lineitem_rollup": [("row", "TPC-H Q1-shaped rollup")],
    "a_events_cube": [("row", "CUBE/grouping-sets aggregate")],
    "a_region_revenue": [
        ("leg=region_revenue", "TPC-H Q5-shaped star join rollup"),
        ("leg=intersect", "INTERSECT set-op (SURVEY §2.6)"),
        ("leg=except", "EXCEPT set-op (SURVEY §2.6)"),
    ],
    "a_events_sketch": [
        ("percentile cols", "exact interpolated percentiles"),
        ("kmv cols", "sketches KMV distinct-count"),
        ("overlap cols", "sketches.kmv_pair_overlap (theta-style "
                         "audience overlap)"),
    ],
}


def operator_index() -> dict[str, list[tuple[str, str]]]:
    """Inverted view: operator description -> [(row, leg)]."""
    inv: dict[str, list[tuple[str, str]]] = {}
    for row, legs in MERGE_MAP.items():
        for leg, op in legs:
            inv.setdefault(op, []).append((row, leg))
    return inv
