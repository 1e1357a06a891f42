"""Operator library: every entry here is exported through
``__ray_entry__.queries()`` with (where SQL-expressible) a DuckDB oracle in
``__ray_entry__.oracle_sql()``. See SURVEY.md §2 for the reference mapping.
"""

from . import (attach, cluster, components, curate, dedup, engine_queries,
               external, genotype, hgvs, lm, mixture, multimodal, nomen,
               process, relational, relational2, rules, rules2, sampling,
               similarity, sql_surface, text, token_ids, tokens, variants,
               variants2, vcf_ops, vfix, windows)
from . import bigbin

MODULES = [relational, text, windows, dedup, similarity, rules, variants,
           variants2, engine_queries, process, vcf_ops, genotype, nomen,
           rules2, sql_surface, external, multimodal, tokens, sampling, lm,
           token_ids, components, cluster, mixture, curate, attach,
           relational2, hgvs, bigbin]


def all_queries():
    """name -> callable(sf_dir) for every implemented operator."""
    q = {
        # relational
        "pricing_summary": relational.pricing_summary,
        "counts_by_source": relational.counts_by_source,
        "value_stats": relational.value_stats,
        "spectrum": relational.spectrum,
        "union_counts": relational.union_counts,
        "filter_project": relational.filter_project,
        "join_broadcast": relational.join_broadcast,
        "join_hash": relational.join_hash,
        "join_native": relational.join_native,
        "range_join_bands": relational.range_join_bands,
        "topk_orders": relational.topk_orders,
        "distinct_langs": relational.distinct_langs,
        "string_agg_by_nation": relational.string_agg_by_nation,
        "median_by_type": relational.median_by_type,
        "latest_order_per_customer": relational.latest_order_per_customer,
        "parts_by_brand": relational.parts_by_brand,
        "supplier_by_region": relational.supplier_by_region,
        "join_left_outer": relational2.join_left_outer,
        "rollup_revenue": relational2.rollup_revenue,
        "pivot_orders": relational2.pivot_orders,
        # text analysis
        "explode_word_counts": text.explode_word_counts,
        "parse_props": text.parse_props,
        "token_stats": text.token_stats,
        "quality_by_source": text.quality_by_source,
        "lang_id": text.lang_id,
        "fingerprints": text.fingerprints,
        "redact_terms": text.redact_terms,
        "repetition_filter": text.repetition_filter,
        "tfidf_topk": text.tfidf_topk,
        "quality_topk_by_source": text.quality_topk_by_source,
        # windows / stream-shaped
        "window_hourly": windows.window_hourly,
        "asof_prev_event": windows.asof_prev_event,
        "sessionize": windows.sessionize,
        "window_sliding": windows.window_sliding,
        "funnel_steps": windows.funnel_steps,
        "retention_hourly": windows.retention_hourly,
        # dedup
        "dedup_exact": dedup.dedup_exact,
        "dedup_minhash_candidates": dedup.dedup_minhash_candidates,
        "dedup_ngram_verified": dedup.dedup_ngram_verified,
        "dedup_jaccard_join": dedup.dedup_jaccard_join,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_neardup": dedup.simhash_neardup,
        "dedup_embedding": dedup.dedup_embedding,
        "dedup_components": components.dedup_components,
        "dedup_survivors": components.dedup_survivors,
        "dup_ngram_spans": dedup.dup_ngram_spans,
        "dup_passages": dedup.dup_passages,
        "scrub_passages": dedup.scrub_passages,
        # similarity
        "ann_cosine_topk": similarity.ann_cosine_topk,
        "ann_lsh_buckets": similarity.ann_lsh_buckets,
        "knn_label_vote": similarity.knn_label_vote,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_recall": similarity.ann_recall,
        "ann_pq_topk": similarity.ann_pq_topk,
        # rule engine
        "rule_score_docs": rules.rule_score_docs,
        # HOWARD-semantics family over the variants_like fixture (F2)
        "explode_infos": variants.explode_infos,
        "pack_info": variants.pack_info,
        "vartype_counts": variants.vartype_counts,
        "variant_ids": variants.variant_ids,
        "annotate_exact": variants.annotate_exact,
        "annotate_regions": variants.annotate_regions,
        "genotype_calcs": variants.genotype_calcs,
        "ann_explode": variants.ann_explode,
        "snpeff_hgvs": variants.snpeff_hgvs,
        "trio_classify": variants2.trio_classify,
        "rename_info_fields": variants2.rename_info_fields,
        "hgvs_name": variants2.hgvs_name,
        "transcript_rank": variants2.transcript_rank,
        "rank_within_chrom": variants2.rank_within_chrom,
        "anti_join_unmatched": variants2.anti_join_unmatched,
        "annotate_update": variants2.annotate_update,
        "hgvs_transcript": variants2.hgvs_transcript,
        "hgvs_context": variants2.hgvs_context,
        "hgvs_cdna": hgvs.hgvs_cdna,
        "hgvs_protein": hgvs.hgvs_protein,
        "extann_join": hgvs.extann_join,
        "annotate_bigbin": bigbin.annotate_bigbin,
        "transcripts_to_json": variants2.transcripts_to_json,
        # composite flagship pipeline (howard process analog)
        "process_pipeline": process.process_pipeline,
        # engine round-trips with SQL oracles + streaming running total
        "roundtrip_documents": engine_queries.roundtrip_documents,
        "roundtrip_lineitem": engine_queries.roundtrip_lineitem,
        "roundtrip_embeddings": engine_queries.roundtrip_embeddings,
        "pushdown_filter_decode": engine_queries.pushdown_filter_decode,
        "running_total": engine_queries.running_total,
        "roundtrip_pruned": engine_queries.roundtrip_pruned,
        "store_append": engine_queries.store_append,
        "store_delete": engine_queries.store_delete,
        "store_derive": engine_queries.store_derive,
        "store_time_travel": engine_queries.store_time_travel,
        "store_alter": engine_queries.store_alter,
        "store_lookup": engine_queries.store_lookup,
        "store_upsert": engine_queries.store_upsert,
        "store_changes": engine_queries.store_changes,
        "store_view": engine_queries.store_view,
        "store_schema_evolution": engine_queries.store_schema_evolution,
        "join_spj": engine_queries.join_spj,
        "store_token_lookup": engine_queries.store_token_lookup,
        "store_recluster": engine_queries.store_recluster,
        # multimodal (stubbed decoder, real Ray plumbing)
        "media_features": multimodal.media_features,
        "media_frame_sample": multimodal.media_frame_sample,
        "media_resize": multimodal.media_resize,
        # external-tool shell-out stage (SURVEY.md 2.10)
        "external_gzip_compress": external.external_gzip_compress,
        # VCF format surface over the sf-scaled fixture
        "vcf_roundtrip": vcf_ops.vcf_roundtrip,
        "vcf_region": vcf_ops.vcf_region,
        "explode_infos_hdr": vcf_ops.explode_infos_hdr,
        # genotype calculation family (sf-scaled fixture)
        "genotype_concordance": genotype.genotype_concordance,
        "vaf_normalize": genotype.vaf_normalize,
        "vaf_stats": genotype.vaf_stats,
        "barcode_family": genotype.barcode_family,
        # full NOMEN extraction (candidate scoring + preferred transcripts)
        "nomen_extract": nomen.nomen_extract,
        # prioritization completeness: PZ field family + transcript-level
        "rule_pz_full": rules2.rule_pz_full,
        "rule_pz_transcripts": rules2.rule_pz_transcripts,
        # token-stream training-data preparation
        "sequence_pack": tokens.sequence_pack,
        "decontaminate": tokens.decontaminate,
        "token_bigrams": tokens.token_bigrams,
        # deterministic sampling / splits / sketches
        "split_assign": sampling.split_assign,
        "sample_topk_hash": sampling.sample_topk_hash,
        "heavy_hitters": sampling.heavy_hitters,
        "approx_distinct_words": sampling.approx_distinct_words,
        "sample_stratified": sampling.sample_stratified,
        "quantiles_exact": sampling.quantiles_exact,
        "quantiles_by_source": sampling.quantiles_by_source,
        "export_split_shards": sampling.export_split_shards,
        # bigram LM train + perplexity inference (model-scorer shape)
        "lm_perplexity": lm.lm_perplexity,
        # token-id analytics over the north-star corpus table
        "token_freq_topk": token_ids.token_freq_topk,
        "token_entropy_by_source": token_ids.token_entropy_by_source,
        "bpe_merges": token_ids.bpe_merges,
        "bpe_apply": token_ids.bpe_apply,
        "pack_sequences": token_ids.pack_sequences,
        # distributed k-means over embeddings (broadcast centroids +
        # combiner partials; full-algorithm SQL twin)
        "kmeans_assign": cluster.kmeans_assign,
        "embed_quantize": cluster.embed_quantize,
        # data-mixture curation
        "mixture_sample": mixture.mixture_sample,
        "length_buckets": mixture.length_buckets,
        # composite curation + mixture plan + epoch shards
        "curate_pipeline": curate.curate_pipeline,
        "mixture_plan": curate.mixture_plan,
        "shuffle_shards": curate.shuffle_shards,
        "curate_store": curate.curate_store,
        # database-attach sources as value-checked round-trips + the
        # percentile quality gate (aggregate -> broadcast -> filter)
        "duckdb_attach": attach.duckdb_attach,
        "sqlite_attach": attach.sqlite_attach,
        "quality_gate": attach.quality_gate,
    }
    # SQL query surface: same SQL text on both engines
    q.update(sql_surface.QUERIES)
    # sf-independent fixture twins the oracle SQL reads by absolute path —
    # materialize before the driver runs either side (the sf-scaled variants
    # themselves are closed-form CTEs, nothing to materialize)
    vfix.ensure_genome()
    multimodal.ensure_media_fixture()
    token_ids.ensure_tokens_fixture()
    # plugin surface (reference plugins/, SURVEY.md §2.14)
    from ..plugins import discover_plugins
    q.update(discover_plugins().queries)
    return q


def all_oracle_sql():
    """name -> DuckDB SQL for every SQL-expressible operator."""
    sql: dict[str, str] = {}
    for m in MODULES:
        sql.update(m.SQL)
    from ..plugins import discover_plugins
    sql.update(discover_plugins().oracle_sql)
    return sql
