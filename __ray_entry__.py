"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing in
here (or the sprout_ray library) calls ray.init()/ray.shutdown().

``queries()`` maps every implemented operator/pipeline (SURVEY.md §2 plus the
training-data ops) to a callable over ``sf_dir``; ``oracle_sql()`` provides
DuckDB twins for the exact ones. Sketch outputs are approximate by design and
take the driver's rows-only check; their error bounds are gated by pytest
(tests/test_sketches.py, tests/test_pipelines.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from sprout_ray.pipelines import analytics as A
from sprout_ray.pipelines.flagship import flagship_over_documents
from sprout_ray.tuning import quiet_cosmetic_ray_warnings

quiet_cosmetic_ray_warnings()  # logging filter only — no Ray session touched


def entry() -> Any:
    """Flagship sketch battery over /root/testdata/sf0.001 (one streaming
    pass building bloom/sbf/hll/cms/tdigest/kll + the sha256 invariant)."""
    return flagship_over_documents("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # exact (DuckDB-oracle checked)
        "exact_distinct_source": A.exact_distinct_source,
        "exact_lang_counts": A.exact_lang_counts,
        "exact_dedup_first": A.exact_dedup_first,
        "token_counts": A.token_counts,
        "doc_quality": A.doc_quality,
        "nchars_stats_by_lang": A.nchars_stats_by_lang,
        "moments_by_type": A.moments_by_type,
        "fd_spectral_head": A.fd_spectral_head,
        "cbf_open_orders_lineitems": A.cbf_open_orders_lineitems,
        "q1_pricing_summary": A.q1_pricing_summary,
        "event_type_counts": A.event_type_counts,
        "top_event_types": A.top_event_types,
        "events_tumbling_hourly": A.events_tumbling_hourly,
        "events_hopping_15m": A.events_hopping_15m,
        "hourly_active_users": A.hourly_active_users,
        "exact_quantiles_by_lang": A.exact_quantiles_by_lang,
        "user_sessions": A.user_sessions,
        "orders_semi_join": A.orders_semi_join,
        "lang_sources_matrix": A.lang_sources_matrix,
        "exact_dup_pairs": A.exact_dup_pairs,
        "exact_dup_clusters": A.exact_dup_clusters,
        # sketches / approximate (rows-only driver check; pytest-bound-gated)
        "bloom_build_stats": A.bloom_build_stats,
        "sbf_build_stats": A.sbf_build_stats,
        "sbf_build_stats_exact": A.sbf_build_stats_exact,
        "bloom_probe_prune": A.bloom_probe_prune,
        "hll_cardinalities": A.hll_cardinalities,
        "hll_by_lang": A.hll_by_lang,
        "hll_by_lang_salted": A.hll_by_lang_salted,
        "cms_heavy_hitters": A.cms_heavy_hitters,
        "mg_heavy_hitters": A.mg_heavy_hitters,
        "mg_event_type_exact": A.mg_event_type_exact,
        "kmv_distinct_sample": A.kmv_distinct_sample,
        "kmv_distinct_langs_exact": A.kmv_distinct_langs_exact,
        "kmv_user_overlap": A.kmv_user_overlap,
        "kmv_sources_by_lang_exact": A.kmv_sources_by_lang_exact,
        "top_source_per_lang": A.top_source_per_lang,
        "quantile_sketches": A.quantile_sketches,
        # training-data ops
        "clicks_last_purchase": A.clicks_last_purchase,
        "purchases_clicks_1h": A.purchases_clicks_1h,
        "revenue_by_nation": A.revenue_by_nation,
        "customers_no_orders": A.customers_no_orders,
        "ngram_jaccard_pairs": A.ngram_jaccard_pairs,
        "ngram_containment_pairs": A.ngram_containment_pairs,
        "minhash_neardup": A.minhash_neardup,
        "simhash_neardup": A.simhash_neardup,
        "minhash_neardup_exact": A.minhash_neardup_exact,
        "simhash_neardup_exact": A.simhash_neardup_exact,
        "embedding_neardup": A.embedding_neardup,
        "embedding_neardup_exact": A.embedding_neardup_exact,
        "embedding_neardup_planted": A.embedding_neardup_planted,
        "curation_survivors": A.curation_survivors,
        "token_jaccard_top1": A.token_jaccard_top1,
        "ann_brute_topk": A.ann_brute_topk,
        "ann_ivf_topk": A.ann_ivf_topk,
        "ann_ivf_exact": A.ann_ivf_exact,
        "kll_quantiles_exact": A.kll_quantiles_exact,
        "fingerprint_distinctness": A.fingerprint_distinctness,
        "langid_predictions": A.langid_predictions,
        "doc_fingerprints": A.doc_fingerprints,
        "media_features": A.media_features,
        "media_ppm_features": A.media_ppm_features,
        "media_wav_features": A.media_wav_features,
        # no SQL oracle (FFT): rows-only; accuracy rides in-band
        # (expected_mel from the synth sine contract + band_match)
        "media_spectrogram": A.media_spectrogram,
        # rows-only; in-band planted-pair retrieval certificate
        "media_audio_neardup": A.media_audio_neardup,
        "media_phash_pairs": A.media_phash_pairs,
        "media_dedup": A.media_dedup,
        "media_resize": A.media_resize,
        "media_frames": A.media_frames,
        # corpus composition + inverted index
        "corpus_mix_quota": A.corpus_mix_quota,
        "corpus_split_mod_exact": A.corpus_split_mod_exact,
        "corpus_split_hash": A.corpus_split_hash,
        "token_df_top": A.token_df_top,
        "cms_event_type_exact": A.cms_event_type_exact,
        "doc_top_term": A.doc_top_term,
        "kll_by_lang_exact": A.kll_by_lang_exact,
        "clicks_next_purchase": A.clicks_next_purchase,
        "events_window_dedup": A.events_window_dedup,
        "benchmark_contamination": A.benchmark_contamination,
        "decontaminated_ids": A.decontaminated_ids,
        "sequence_packing": A.sequence_packing,
        "repetition_stats": A.repetition_stats,
        "token_entropy": A.token_entropy,
        "canonical_docs": A.canonical_docs,
        "embedding_kmeans": A.embedding_kmeans,
        "normalized_docs": A.normalized_docs,
        "pii_redacted": A.pii_redacted,
        "span_dedup_stats": A.span_dedup_stats,
        "bm25_topk": A.bm25_topk,
        "neardup_dedup_survivors": A.neardup_dedup_survivors,
        "corpus_shuffle_head": A.corpus_shuffle_head,
        "corpus_temperature_sample": A.corpus_temperature_sample,
        "table_profile": A.table_profile,
        "length_band_survivors": A.length_band_survivors,
        "incremental_dedup_survivors": A.incremental_dedup_survivors,
        "unigram_quality": A.unigram_quality,
        "dsir_scores": A.dsir_scores,
        "key_skew_profile": A.key_skew_profile,
        "pmi_top_bigrams": A.pmi_top_bigrams,
        "leakage_safe_split": A.leakage_safe_split,
        "length_histogram": A.length_histogram,
        "top3_sources_per_lang": A.top3_sources_per_lang,
        "winnow_shared": A.winnow_shared,
        "negative_pairs": A.negative_pairs,
        "value_rank_by_type": A.value_rank_by_type,
        "value_mad_by_type": A.value_mad_by_type,
        "ams_f2_skew": A.ams_f2_skew,
        "user_running_value": A.user_running_value,
        "semdedup_survivors": A.semdedup_survivors,
        "gopher_rules": A.gopher_rules,
        "window_top_event": A.window_top_event,
        "weighted_doc_sample": A.weighted_doc_sample,
        "shared_gram_docs": A.shared_gram_docs,
        "pretrain_gate_ids": A.pretrain_gate_ids,
        "value_zscore_by_type": A.value_zscore_by_type,
        "supplier_region_revenue": A.supplier_region_revenue,
        "promo_brand_revenue": A.promo_brand_revenue,
        "late_shipment_priority": A.late_shipment_priority,
        "q13_customer_distribution": A.q13_customer_distribution,
        "q17_small_quantity_revenue": A.q17_small_quantity_revenue,
        "q21_waiting_suppliers": A.q21_waiting_suppliers,
        "q22_idle_balance": A.q22_idle_balance,
        "q6_forecast_revenue": A.q6_forecast_revenue,
        "q14_promo_effect": A.q14_promo_effect,
        "q19_discount_revenue": A.q19_discount_revenue,
        "q10_returned_items": A.q10_returned_items,
        "q12_priority_classes": A.q12_priority_classes,
        "q15_top_supplier": A.q15_top_supplier,
        "q8_market_share": A.q8_market_share,
        "q9_product_profit": A.q9_product_profit,
        "q2_min_balance_supplier": A.q2_min_balance_supplier,
        "q11_important_parts": A.q11_important_parts,
        "q16_supplier_part_counts": A.q16_supplier_part_counts,
        "q20_volume_share_suppliers": A.q20_volume_share_suppliers,
        "user_gap_stats": A.user_gap_stats,
        "cont_quantiles_by_lang": A.cont_quantiles_by_lang,
        "ann_filtered_topk": A.ann_filtered_topk,
        "hybrid_rrf_topk": A.hybrid_rrf_topk,
        "classifier_scores": A.classifier_scores,
        "bloom_set_cardinalities": A.bloom_set_cardinalities,
        "hll_hourly_users": A.hll_hourly_users,
        "type_weighted_value_salted": A.type_weighted_value_salted,
        "tdigest_hourly_value": A.tdigest_hourly_value,
        "doc_embedding_coverage": A.doc_embedding_coverage,
        "user_trailing_hour_value": A.user_trailing_hour_value,
        "hll_hopping_users": A.hll_hopping_users,
        "label_centroids": A.label_centroids,
        "lang_source_rollup": A.lang_source_rollup,
        "nation_revenue_share": A.nation_revenue_share,
        "snapshot_changes": A.snapshot_changes,
        "fuzzy_top1": A.fuzzy_top1,
        "value_time_corr": A.value_time_corr,
        "props_key_stats": A.props_key_stats,
        "user_moving_value": A.user_moving_value,
        "user_time_weighted_value": A.user_time_weighted_value,
        "embedding_dim_stats": A.embedding_dim_stats,
        "lang_sources_concat": A.lang_sources_concat,
        "latest_user_event": A.latest_user_event,
        "user_retention_cohorts": A.user_retention_cohorts,
        "event_transitions": A.event_transitions,
        "funnel_stage_counts": A.funnel_stage_counts,
        "weighted_median_price": A.weighted_median_price,
        "peak_concurrent_sessions": A.peak_concurrent_sessions,
        "value_quartile_rollup": A.value_quartile_rollup,
        "nation_account_coverage": A.nation_account_coverage,
        "q3_shipping_priority": A.q3_shipping_priority,
        "fk_integrity_report": A.fk_integrity_report,
        "ohlc_hourly": A.ohlc_hourly,
        "lang_stats_unpivot": A.lang_stats_unpivot,
        "type_cooccurrence": A.type_cooccurrence,
        "event_session_assignment": A.event_session_assignment,
        "user_lifespan_histogram": A.user_lifespan_histogram,
        "phrase_occurrences": A.phrase_occurrences,
        "anomalous_days": A.anomalous_days,
        "longest_daily_streak": A.longest_daily_streak,
        # join-size estimation via CMS inner product (no SQL twin: the
        # estimate is approximate by design; exact size + bound ride in
        # band as self-evidence, and the kernel is property-tested)
        "cms_join_size": A.cms_join_size,
        "user_type_entropy": A.user_type_entropy,
        "large_volume_customers": A.large_volume_customers,
        "orders_above_cust_avg": A.orders_above_cust_avg,
        "daily_activity_union": A.daily_activity_union,
        "user_setops": A.user_setops,
        "cube_type_weekday": A.cube_type_weekday,
        "nations_volume_shipping": A.nations_volume_shipping,
        "kmv_overlap_exact": A.kmv_overlap_exact,
        "parts_pareto": A.parts_pareto,
        "daily_counts_dense": A.daily_counts_dense,
        "orders_late_exists": A.orders_late_exists,
        "daily_delta": A.daily_delta,
        "docs_grouping_sets": A.docs_grouping_sets,
        "user_growth_accounting": A.user_growth_accounting,
        "revenue_concentration": A.revenue_concentration,
        "doc_chunks": A.doc_chunks,
        "type_decay_scores": A.type_decay_scores,
        "user_value_intervals": A.user_value_intervals,
        "type_jaccard_pairs": A.type_jaccard_pairs,
        "trimmed_value_sums": A.trimmed_value_sums,
        "pagerank_user_types": A.pagerank_user_types,
        "user_type_degree_histogram": A.user_type_degree_histogram,
        "events_zorder_head": A.events_zorder_head,
        "events_range_layout": A.events_range_layout,
        "customer_rfm_segments": A.customer_rfm_segments,
        # no SQL oracle (eigenvector): rows-only driver check; accuracy
        # rides in-band (rayleigh_monotone/residual_ratio/within_bound)
        # and pytest pins loadings against numpy.linalg.eigh
        "embedding_top_component": A.embedding_top_component,
    }


# shared by bm25_topk and hybrid_rrf_topk: the WITH-chain ending in the
# per-query BM25 ranking (rn = row_number over score DESC, doc ASC)
_BM25_RANKED_CTES = (
    "WITH toks AS (SELECT doc_id, unnest(string_split_regex("
    "lower(trim(text, ' ')), '\\s+')) AS tok FROM documents), "
    "tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
    "tf AS (SELECT doc_id, tok, count(*) AS c FROM tok2 "
    "GROUP BY doc_id, tok), "
    "dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id), "
    "stats AS (SELECT (SELECT count(*) FROM documents) AS nd, "
    "(SELECT count(*) FROM tok2) AS tt), "
    "q AS (SELECT DISTINCT doc_id AS qid, tok FROM tok2 "
    "WHERE doc_id < 10), "
    "df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok2 "
    "WHERE tok IN (SELECT tok FROM q) GROUP BY tok), "
    "scored AS (SELECT q.qid, tf.doc_id, "
    "CAST(sum(CAST(floor(ln((CAST(s.nd AS DOUBLE) - "
    "CAST(df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5) "
    "+ 1.0) * ((CAST(tf.c AS DOUBLE) * 2.5) / (CAST(tf.c AS DOUBLE) "
    "+ 1.5 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / "
    "(CAST(s.tt AS DOUBLE) / CAST(s.nd AS DOUBLE)))))) "
    "* 100000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro "
    "FROM q JOIN tf ON q.tok = tf.tok AND tf.doc_id <> q.qid "
    "JOIN df ON df.tok = q.tok "
    "JOIN dl ON dl.doc_id = tf.doc_id "
    "CROSS JOIN stats s "
    "GROUP BY q.qid, tf.doc_id), "
    "ranked AS (SELECT qid, doc_id, score_micro, row_number() OVER "
    "(PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS rn "
    "FROM scored)"
)

_PLANTED_DUP_PAIRS_SQL = (
    "WITH corpus AS ("
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents "
    "UNION ALL "
    "SELECT CAST(doc_id + 1000000 AS BIGINT), text "
    "FROM documents WHERE doc_id < 100) "
    "SELECT a.doc_id AS left_id, b.doc_id AS right_id "
    "FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id "
    "ORDER BY left_id, right_id"
)


# 3-iteration bipartite PageRank, unrolled (pagerank_user_types twin):
# node ids = user_id for users, -(vocab rank) for types; integer 10^12-unit
# scores; every division is `//` over non-negative operands so DuckDB's
# truncation == numpy's floor and the distributed sums are order-free.
def _pagerank_sql(iterations: int = 3) -> str:
    ctes = [
        "WITH pairs AS (SELECT DISTINCT user_id, event_type FROM events)",
        "tmap AS (SELECT event_type, -CAST(row_number() OVER "
        "(ORDER BY event_type) AS BIGINT) AS tid "
        "FROM (SELECT DISTINCT event_type FROM events))",
        "e AS (SELECT p.user_id AS src, m.tid AS dst FROM pairs p "
        "JOIN tmap m USING (event_type) "
        "UNION ALL SELECT m.tid AS src, p.user_id AS dst FROM pairs p "
        "JOIN tmap m USING (event_type))",
        "deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS d "
        "FROM e GROUP BY src)",
        "np AS (SELECT count(*) AS n FROM deg)",
        "s0 AS (SELECT id, 1000000000000 // n AS s FROM deg, np)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        ctes.append(
            f"a{i} AS (SELECT e.dst AS id, CAST(sum(s{p}.s // deg.d) "
            f"AS BIGINT) AS agg FROM e JOIN s{p} ON e.src = s{p}.id "
            "JOIN deg ON e.src = deg.id GROUP BY e.dst)"
        )
        ctes.append(
            f"s{i} AS (SELECT s{p}.id, 15 * (1000000000000 // n) // 100 + "
            f"85 * COALESCE(a{i}.agg, 0) // 100 AS s "
            f"FROM s{p} LEFT JOIN a{i} USING (id), np)"
        )
    last = f"s{iterations}"
    return (
        ", ".join(ctes)
        + " SELECT node_id, pagerank_units FROM ("
        + f"SELECT id AS node_id, s AS pagerank_units FROM {last} WHERE id < 0 "
        + "UNION ALL SELECT node_id, pagerank_units FROM ("
        + f"SELECT id AS node_id, s AS pagerank_units FROM {last} "
        + "WHERE id >= 0 ORDER BY s DESC, id ASC LIMIT 20)) "
        + "ORDER BY pagerank_units DESC, node_id ASC"
    )


def _zorder_head_sql() -> str:
    from sprout_ray.functions.zorder import morton_key_sql

    z = morton_key_sql("user_id", "epoch_us(ts) // 60000000")
    return (
        f"SELECT CAST(event_id AS BIGINT) AS event_id, {z} AS zkey "
        "FROM events ORDER BY zkey, event_id LIMIT 20"
    )


def oracle_sql() -> dict[str, str]:
    return {
        # the reference's parameter derivation (bloom.go:100-114) as a
        # closed form of count(*): capacity = max(int(n*1.2), 11),
        # k = ceil(log2(1/eps)), M = int(cap*|ln eps|/ln(2)^2), m = M//k,
        # size = M//8+8 — all IEEE-double expressions evaluated with the
        # same literals/grouping as the Python build, so the distributed
        # build's stats row hash-matches SQL deriving it independently
        "bloom_build_stats": (
            "WITH n AS (SELECT count(*) AS n FROM documents), "
            "p AS (SELECT n, GREATEST(CAST(trunc(n * CAST(1.2 AS DOUBLE)) "
            "AS BIGINT), 11) AS capacity FROM n), "
            "d AS (SELECT n, capacity, "
            "CAST(ceil(log2(1.0 / CAST(0.001 AS DOUBLE))) AS BIGINT) AS k, "
            "CAST(trunc(capacity * abs(ln(CAST(0.001 AS DOUBLE))) / "
            "(ln(CAST(2.0 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE)))) AS BIGINT) "
            "AS m_bits FROM p) "
            "SELECT capacity, CAST(n AS BIGINT) AS count, "
            "m_bits // 8 + 8 AS size, m_bits // k AS m, k, "
            "CAST(0.001 AS DOUBLE) AS prob FROM d"
        ),
        # the scalable filter's growth schedule (scalable_bloom.go:161,
        # 174-178 + bloom.go:100-114 per stage) as closed-form IEEE-double
        # expressions of count(*): err_i = err0*0.9^i, cap_i =
        # trunc(m0*2^(i-1)*ln2) floored at 11, stage used iff the
        # cumulative capacity before it is < n (sequential fill), per-stage
        # fill = min(capacity, n - before). Operand grouping mirrors the
        # Python build exactly (see the stage-sweep boundary test).
        "sbf_build_stats_exact": (
            "WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents), "
            "base AS (SELECT n, GREATEST(n // 8, 11) AS cap0 FROM nn), "
            "d0 AS (SELECT n, cap0, "
            "CAST(trunc(cap0 * abs(ln(CAST(0.001 AS DOUBLE))) / "
            "(ln(CAST(2.0 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE)))) AS BIGINT) "
            "// CAST(ceil(log2(1.0 / CAST(0.001 AS DOUBLE))) AS BIGINT) "
            "AS m0 FROM base), "
            # sequential fill: recurse one stage at a time while rows
            # remain, so the geometric capacity schedule is only ever
            # evaluated for stages that exist (no int64 overflow at
            # stage 60 of a never-used tail). cap_{i+1} uses 2^i = the
            # anchor's stage index; (m0_double * 2^i) is the correctly
            # rounded exact product = Python's int->double conversion.
            "fill AS ("
            "SELECT 0 AS stage, cap0 AS capacity, CAST(0 AS BIGINT) "
            "AS before, n, m0 FROM d0 "
            "UNION ALL SELECT stage + 1, "
            "GREATEST(CAST(trunc((CAST(m0 AS DOUBLE) * "
            "power(CAST(2.0 AS DOUBLE), stage)) * ln(CAST(2.0 AS DOUBLE))) "
            "AS BIGINT), 11), before + capacity, n, m0 "
            "FROM fill WHERE before + capacity < n), "
            "geom AS (SELECT stage, "
            "CAST(0.001 AS DOUBLE) * power(CAST(0.9 AS DOUBLE), stage) "
            "AS err, capacity, before, n FROM fill), "
            "geom2 AS (SELECT stage, err, capacity, before, n, "
            "CAST(ceil(log2(1.0 / err)) AS BIGINT) AS k, "
            "CAST(trunc(capacity * abs(ln(err)) / "
            "(ln(CAST(2.0 AS DOUBLE)) * ln(CAST(2.0 AS DOUBLE)))) AS BIGINT) "
            "AS m_bits FROM geom) "
            "SELECT stage, err AS err_rate, capacity, k, m_bits // k AS m, "
            "m_bits // 8 + 8 AS size, "
            "CAST(SUM(m_bits // 8 + 8) OVER (ORDER BY stage) AS BIGINT) "
            "AS cum_size, "
            "GREATEST(LEAST(capacity, n - before), 0) AS n_added "
            "FROM geom2 ORDER BY stage"
        ),
        "curation_survivors": (
            "WITH winners AS (SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY text), "
            "feat AS (SELECT doc_id, lang, "
            "CAST(CASE WHEN trim(text, ' ') = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text, ' '), '\\s+')) END AS BIGINT) "
            "AS token_count, "
            "round((len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))) "
            "/ greatest(len(text), 1), 6) AS punct_ratio FROM documents) "
            "SELECT CAST(f.doc_id AS BIGINT) AS doc_id, f.lang AS lang "
            "FROM feat f JOIN winners w USING (doc_id) "
            "WHERE f.token_count >= 30 AND f.punct_ratio <= 0.3 "
            "ORDER BY f.doc_id"
        ),
        "token_jaccard_top1": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(list_distinct(string_split_regex(lower(trim(text, ' ')), '\\s+'))) AS tok "
            "FROM documents WHERE trim(text, ' ') <> ''), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id), "
            "q AS (SELECT doc_id AS qid, tok FROM toks WHERE doc_id < 20), "
            "qsizes AS (SELECT qid, count(*) AS n FROM q GROUP BY qid), "
            "inter AS (SELECT q.qid, t.doc_id, count(*) AS i FROM toks t "
            "JOIN q ON t.tok = q.tok WHERE t.doc_id <> q.qid "
            "GROUP BY q.qid, t.doc_id), "
            "scored AS (SELECT inter.qid, inter.doc_id, "
            "CAST(inter.i AS DOUBLE) / (qs.n + s.n - inter.i) AS j "
            "FROM inter JOIN sizes s ON inter.doc_id = s.doc_id "
            "JOIN qsizes qs ON inter.qid = qs.qid), "
            "ranked AS (SELECT qid, doc_id, j, row_number() OVER "
            "(PARTITION BY qid ORDER BY j DESC, doc_id) AS rn FROM scored) "
            "SELECT CAST(qid AS BIGINT) AS query_id, "
            "CAST(doc_id AS BIGINT) AS match_id, round(j, 6) AS jaccard "
            "FROM ranked WHERE rn = 1 ORDER BY query_id"
        ),
        # same SQL as ann_brute_topk: at nprobe=nlist the IVF scan probes
        # every bucket, degenerating to exact brute-force cosine top-k
        "ann_ivf_exact": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 4), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS s FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, s, "
            "row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn "
            "FROM scored) "
            "SELECT query_id, vec_id, round(s, 6) AS score FROM ranked "
            "WHERE rn <= 10 ORDER BY query_id, vec_id"
        ),
        # exact lower quantile at rank ceil(q*n) — the definition KLL's
        # weighted searchsorted computes when nothing ever compacts (k > n);
        # VALUES literals are DECIMAL, so qq*n is exact arithmetic
        "kll_quantiles_exact": (
            "WITH s AS (SELECT n_chars, "
            "row_number() OVER (ORDER BY n_chars) AS rn, "
            "count(*) OVER () AS n FROM documents) "
            "SELECT t.label AS q, CAST(s.n_chars AS DOUBLE) AS value "
            "FROM (VALUES ('p01', 0.01), ('p25', 0.25), ('p50', 0.50), "
            "('p75', 0.75), ('p99', 0.99)) AS t(label, qq) "
            "JOIN s ON s.rn = GREATEST(1, CAST(ceil(t.qq * s.n) AS BIGINT)) "
            "ORDER BY q"
        ),
        # fingerprint injectivity: distinct fingerprints == distinct texts
        "fingerprint_distinctness": (
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_fingerprints, "
            "CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts "
            "FROM documents"
        ),
        "ann_brute_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 4), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS s FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, s, "
            "row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn "
            "FROM scored) "
            "SELECT query_id, vec_id, round(s, 6) AS score FROM ranked "
            "WHERE rn <= 10 ORDER BY query_id, vec_id"
        ),
        "clicks_last_purchase": (
            "SELECT l.user_id, l.event_id, "
            "CAST(epoch_us(l.ts) AS BIGINT) AS ts_us, "
            "CAST(r.event_id AS DOUBLE) AS purchase_event_id, "
            "CAST(epoch_us(r.ts) AS DOUBLE) AS purchase_ts_us, "
            "CAST(r.value AS DOUBLE) AS purchase_value "
            "FROM (SELECT * FROM events WHERE event_type='click') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts "
            "ORDER BY l.event_id"
        ),
        # language-ID heuristic is SQL-expressible because BOTH engines run
        # RE2 (pyarrow count_substring_regex / duckdb regexp_extract_all):
        # same marker alternations (sorted, as stages/text.LangId builds
        # them), same non-overlapping match counts; argmax tie-break is
        # first-wins in [en, de, fr, es] order (np.argmax), replicated by
        # the >= CASE chain; all-zero hits -> 'unknown'
        "langid_predictions": (
            "WITH s AS (SELECT lang, "
            "len(regexp_extract_all(text, "
            "'\\b(and|for|in|is|of|that|the|to|was|with)\\b', 0, 'i')) AS s_en, "
            "len(regexp_extract_all(text, "
            "'\\b(auf|das|der|die|ein|ist|mit|nicht|sich|und)\\b', 0, 'i')) AS s_de, "
            "len(regexp_extract_all(text, "
            "'\\b(dans|des|est|et|la|le|les|pour|que|une)\\b', 0, 'i')) AS s_fr, "
            "len(regexp_extract_all(text, "
            "'\\b(con|de|el|en|la|los|por|que|un|y)\\b', 0, 'i')) AS s_es "
            "FROM documents), "
            "p AS (SELECT lang, CASE "
            "WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown' "
            "WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
            "WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
            "WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred FROM s) "
            "SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM p "
            "GROUP BY lang, lang_pred ORDER BY lang, lang_pred"
        ),
        # forward as-of: next purchase at-or-after each click
        "clicks_next_purchase": (
            "SELECT l.user_id, l.event_id, "
            "CAST(epoch_us(l.ts) AS BIGINT) AS ts_us, "
            "CAST(r.event_id AS DOUBLE) AS purchase_event_id, "
            "CAST(epoch_us(r.ts) AS DOUBLE) AS purchase_ts_us, "
            "CAST(r.value AS DOUBLE) AS purchase_value "
            "FROM (SELECT * FROM events WHERE event_type='click') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') r "
            "ON l.user_id = r.user_id AND l.ts <= r.ts "
            "ORDER BY l.event_id"
        ),
        "revenue_by_nation": (
            "SELECT n.n_name AS nation, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_centicents, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name ORDER BY nation"
        ),
        "purchases_clicks_1h": (
            "SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks "
            "FROM (SELECT * FROM events WHERE event_type='purchase') p "
            "LEFT JOIN (SELECT * FROM events WHERE event_type='click') c "
            "ON c.user_id = p.user_id AND c.ts > p.ts - INTERVAL 1 HOUR "
            "AND c.ts <= p.ts "
            "GROUP BY p.event_id ORDER BY p.event_id"
        ),
        "customers_no_orders": (
            "SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name AS c_name "
            "FROM customer c LEFT JOIN "
            "(SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 350000) o "
            "ON c.c_custkey = o.o_custkey "
            "WHERE o.o_custkey IS NULL ORDER BY c_custkey"
        ),
        # SemDeDup exact degenerate regime (k=1): survivor iff no lower-id
        # row is cosine >= 0.4 — the near-dup twin of exact dedup's
        # keep-first
        "semdedup_survivors": (
            "SELECT CAST(a.vec_id AS BIGINT) AS vec_id FROM embeddings a "
            "WHERE NOT EXISTS (SELECT 1 FROM embeddings b "
            "WHERE b.vec_id < a.vec_id AND "
            "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4) ORDER BY vec_id"
        ),
        "embedding_neardup_exact": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])), 6) AS score "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4 "
            "ORDER BY id_a, id_b"
        ),
        "exact_distinct_source": (
            "SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_distinct FROM documents"
        ),
        "exact_lang_counts": (
            "SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"
        ),
        "exact_dedup_first": (
            "SELECT text, CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text"
        ),
        "token_counts": (
            "SELECT doc_id, CAST(CASE WHEN trim(text, ' ') = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text, ' '), '\\s+')) END AS BIGINT) AS token_count, "
            "CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')) AS BIGINT) AS bpe_tokens "
            "FROM documents"
        ),
        "doc_quality": (
            "SELECT doc_id, "
            "CAST(CASE WHEN trim(text, ' ') = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text, ' '), '\\s+')) END AS BIGINT) AS token_count, "
            "round((len(text) - len(regexp_replace(text, '[^\\w\\s]', '', 'g'))) "
            "/ greatest(len(text), 1), 6) AS punct_ratio, "
            "round((len(text) - len(regexp_replace(text, '[A-Za-z]', '', 'g'))) "
            "/ greatest(len(text), 1), 6) AS alpha_ratio "
            "FROM documents"
        ),
        "nchars_stats_by_lang": (
            "SELECT lang, CAST(min(n_chars) AS BIGINT) AS min_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"
        ),
        "cbf_open_orders_lineitems": (
            "SELECT l_linestatus, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM lineitem "
            "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
            "WHERE o_orderstatus <> 'F') GROUP BY l_linestatus"
        ),
        "moments_by_type": (
            # expression trees mirror kernel/moments.derived_stats token-for-
            # token so the doubles match bit-exactly (sums are exact integers
            # on both sides; int->double casts and IEEE ops are deterministic)
            "WITH cents AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events), "
            "base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(c) AS BIGINT) AS s1, CAST(min(c) AS BIGINT) AS mn, "
            "CAST(max(c) AS BIGINT) AS mx, sum(CAST(c AS HUGEINT) * c) AS s2, "
            "sum(CAST(c AS HUGEINT) * c * c) AS s3, "
            "sum(CAST(c AS HUGEINT) * c * c * c) AS s4 FROM cents GROUP BY event_type), "
            # HUGEINT -> DOUBLE via the floor-mod 3-limb tree mirrored by
            # kernel/moments.limb_double (DuckDB's CAST(HUGEINT AS DOUBLE)
            # is off by an ulp vs correctly-rounded conversion)
            "lb AS (SELECT *, "
            "((s2 % 4294967296) + 4294967296) % 4294967296 AS s2l0, "
            "((s3 % 4294967296) + 4294967296) % 4294967296 AS s3l0, "
            "((s4 % 4294967296) + 4294967296) % 4294967296 AS s4l0 FROM base), "
            "lq AS (SELECT *, (s2 - s2l0) // 4294967296 AS s2q, "
            "(s3 - s3l0) // 4294967296 AS s3q, (s4 - s4l0) // 4294967296 AS s4q FROM lb), "
            "lm AS (SELECT *, ((s2q % 4294967296) + 4294967296) % 4294967296 AS s2l1, "
            "((s3q % 4294967296) + 4294967296) % 4294967296 AS s3l1, "
            "((s4q % 4294967296) + 4294967296) % 4294967296 AS s4l1 FROM lq), "
            "d AS (SELECT *, CAST(n AS DOUBLE) AS n_d, CAST(s1 AS DOUBLE) AS s1_d, "
            "CAST((s2q - s2l1) // 4294967296 AS DOUBLE) * 18446744073709551616.0 "
            "+ (CAST(s2l1 AS DOUBLE) * 4294967296.0 + CAST(s2l0 AS DOUBLE)) AS s2_d, "
            "CAST((s3q - s3l1) // 4294967296 AS DOUBLE) * 18446744073709551616.0 "
            "+ (CAST(s3l1 AS DOUBLE) * 4294967296.0 + CAST(s3l0 AS DOUBLE)) AS s3_d, "
            "CAST((s4q - s4l1) // 4294967296 AS DOUBLE) * 18446744073709551616.0 "
            "+ (CAST(s4l1 AS DOUBLE) * 4294967296.0 + CAST(s4l0 AS DOUBLE)) AS s4_d FROM lm), "
            "m1 AS (SELECT *, s1_d / n_d AS mean FROM d), "
            "m2t AS (SELECT *, s2_d / n_d - mean * mean AS m2, "
            "s3_d / n_d - 3.0 * mean * (s2_d / n_d) + 2.0 * (mean * mean * mean) AS m3, "
            "s4_d / n_d - 4.0 * mean * (s3_d / n_d) + 6.0 * (mean * mean) * (s2_d / n_d) "
            "- 3.0 * (mean * mean) * (mean * mean) AS m4 FROM m1) "
            "SELECT event_type, n, s1 AS sum_c, mn AS min_c, mx AS max_c, "
            "s2_d AS sum_c2_d, s3_d AS sum_c3_d, s4_d AS sum_c4_d, "
            "round(mean, 6) AS mean_c, round(m2, 6) AS var_c, "
            "round(CASE WHEN m2 > 0.0 THEN m3 / sqrt(m2 * m2 * m2) ELSE 0.0 END, 6) AS skew, "
            "round(CASE WHEN m2 > 0.0 THEN m4 / (m2 * m2) - 3.0 ELSE 0.0 END, 6) AS kurt "
            "FROM m2t"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_centicents, "
            "CAST(count(*) AS BIGINT) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "event_type_counts": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type"
        ),
        "mg_event_type_exact": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "kmv_distinct_langs_exact": (
            "SELECT DISTINCT lang FROM documents ORDER BY lang"
        ),
        "kmv_sources_by_lang_exact": (
            "SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        # NOTE: kmv_user_overlap deliberately has NO SQL twin — its oracle
        # would only be valid in the sketch's exact regime (distinct users
        # < k), which holds at sf0.01 but not sf0.1; a scale-conditional
        # oracle is a footgun. Estimator bounds are pytest-gated instead
        # (test_kmv_user_overlap_bounds covers both regimes).
        "top_source_per_lang": (
            "SELECT lang, source AS top_source FROM ("
            "SELECT lang, source, row_number() OVER "
            "(PARTITION BY lang ORDER BY count(*) DESC, source) AS rn "
            "FROM documents GROUP BY lang, source) WHERE rn = 1 ORDER BY lang"
        ),
        "top_event_types": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY event_type ORDER BY n DESC LIMIT 3"
        ),
        "events_tumbling_hourly": (
            "SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS window, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_value_micro "
            "FROM events GROUP BY event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT)"
        ),
        "events_hopping_15m": (
            # window w covers [w*hop, w*hop+size): w from (us-size)//hop+1
            # to us//hop inclusive (integer microseconds, non-negative)
            "WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events) "
            "SELECT event_type, CAST(w AS BIGINT) AS window, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) "
            "AS sum_value_micro "
            "FROM e, LATERAL unnest(generate_series("
            "(us - 3600000000) // 900000000 + 1, us // 900000000)) AS t(w) "
            "GROUP BY event_type, w"
        ),
        # window-scoped idempotency dedup: distinct (user, type) per hour
        "events_window_dedup": (
            "WITH e AS (SELECT epoch_us(ts) // 3600000000 AS w, "
            "user_id, event_type FROM events), "
            "d AS (SELECT w, count(*) AS n_unique FROM "
            "(SELECT DISTINCT w, user_id, event_type FROM e) GROUP BY w), "
            "t AS (SELECT w, count(*) AS n_events FROM e GROUP BY w) "
            "SELECT CAST(t.w AS BIGINT) AS window, "
            "CAST(d.n_unique AS BIGINT) AS n_unique, "
            "CAST(t.n_events AS BIGINT) AS n_events "
            'FROM t JOIN d USING (w) ORDER BY "window"'
        ),
        # word-4-gram decontamination: bench = doc_id % 20 == 0; the Ray
        # side is bloom-pruned + exact-verified, so counts are exact
        "benchmark_contamination": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string("
            "toks[CAST(i AS BIGINT):CAST(i AS BIGINT)+3], ' ') AS gram "
            "FROM w, UNNEST(range(1, len(toks) - 2)) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0), "
            "corp AS (SELECT DISTINCT doc_id, gram FROM g "
            "WHERE doc_id % 20 <> 0) "
            "SELECT CAST(c.doc_id AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS shared_grams "
            "FROM corp c JOIN bench USING (gram) "
            "GROUP BY c.doc_id ORDER BY doc_id"
        ),
        "decontaminated_ids": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string("
            "toks[CAST(i AS BIGINT):CAST(i AS BIGINT)+3], ' ') AS gram "
            "FROM w, UNNEST(range(1, len(toks) - 2)) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0), "
            "bad AS (SELECT DISTINCT doc_id FROM g "
            "WHERE doc_id % 20 <> 0 AND gram IN (SELECT gram FROM bench)) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents "
            "WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad) "
            "ORDER BY doc_id"
        ),
        # concatenate-and-cut packing: bin = exclusive token prefix // 512
        "sequence_packing": (
            "WITH t AS (SELECT doc_id, CAST(CASE WHEN trim(text, ' ') = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text, ' '), '\\s+')) END AS BIGINT) "
            "AS tok FROM documents), "
            "s AS (SELECT doc_id, tok, COALESCE(sum(tok) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 "
            "PRECEDING), 0) AS bef FROM t) "
            "SELECT CAST(bef // 512 AS BIGINT) AS bin, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(tok) AS BIGINT) AS sum_tokens "
            "FROM s GROUP BY bin ORDER BY bin"
        ),
        # within-doc repetition signals as exact integers
        "repetition_stats": (
            "WITH d AS (SELECT doc_id, trim(text, ' ') AS tt FROM documents), "
            "tok AS (SELECT doc_id, unnest(string_split_regex(tt, '\\s+')) "
            "AS t FROM d WHERE tt <> ''), "
            "c AS (SELECT doc_id, t, count(*) AS c FROM tok "
            "GROUP BY doc_id, t), "
            "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS distinct_tokens, "
            "CAST(max(c) AS BIGINT) AS top_token_count FROM c "
            "GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens, "
            "COALESCE(distinct_tokens, 0) AS distinct_tokens, "
            "COALESCE(top_token_count, 0) AS top_token_count "
            "FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"
        ),
        # canonical selection: best original (longest raw, min-id tie) per
        # normalized-text cluster, window twin of the packed-argmax groupby
        "canonical_docs": (
            "WITH n AS (SELECT doc_id, length(text) AS raw_len, "
            "regexp_replace(lower(regexp_replace(trim(text, ' '), "
            "'\\s+', ' ', 'g')), '\\d{4,}', '<NUM>', 'g') AS norm_text "
            "FROM documents), "
            "r AS (SELECT doc_id, raw_len, "
            "count(*) OVER (PARTITION BY norm_text) AS n_variants, "
            "row_number() OVER (PARTITION BY norm_text "
            "ORDER BY raw_len DESC, doc_id ASC) AS rn FROM n) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(raw_len AS BIGINT) AS raw_len, "
            "CAST(n_variants AS BIGINT) AS n_variants "
            "FROM r WHERE rn = 1 ORDER BY doc_id"
        ),
        # per-doc Shannon token entropy: c·ln(c) terms floored to integer
        # 1e-8 nats (same glibc ln both engines call), order-free sum
        "token_entropy": (
            "WITH d AS (SELECT doc_id, trim(text, ' ') AS tt FROM documents), "
            "tok AS (SELECT doc_id, unnest(string_split_regex(tt, '\\s+')) "
            "AS t FROM d WHERE tt <> ''), "
            "c AS (SELECT doc_id, t, count(*) AS c FROM tok "
            "GROUP BY doc_id, t), "
            "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
            "CAST(sum(floor(c * ln(c) * 1e8 + 0.5)) AS BIGINT) AS "
            "clogc_micro FROM c GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens, "
            "COALESCE(clogc_micro, 0) AS clogc_micro, "
            "CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0.0 "
            "ELSE round(ln(n_tokens) - (clogc_micro / 1e8) / n_tokens, 6) "
            "END AS entropy "
            "FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"
        ),
        # curation text normalization — both engines run RE2 so the
        # replace semantics line up byte-for-byte
        "normalized_docs": (
            "WITH n AS (SELECT doc_id, regexp_replace(lower("
            "regexp_replace(trim(text, ' '), '\\s+', ' ', 'g')), "
            "'\\d{4,}', '<NUM>', 'g') AS norm_text FROM documents) "
            "SELECT doc_id, norm_text, "
            "CAST(length(norm_text) AS BIGINT) AS norm_len "
            "FROM n ORDER BY doc_id"
        ),
        # end-to-end near-dup dedup in the degenerate exact regime:
        # LSH pairs at threshold 1.0 + exact verify + connected components
        # keep exactly the min-id doc per distinct text of the planted corpus
        "neardup_dedup_survivors": (
            "WITH corpus AS ("
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents "
            "UNION ALL "
            "SELECT CAST(doc_id + 1000000 AS BIGINT), text "
            "FROM documents WHERE doc_id < 100) "
            "SELECT doc_id FROM (SELECT doc_id, "
            "min(doc_id) OVER (PARTITION BY text) AS m FROM corpus) "
            "WHERE doc_id = m ORDER BY doc_id"
        ),
        # exact BM25: per-term contributions rounded to integer 1e-8 units
        # before the (order-free) sum; idf/tf-factor expressions use the
        # IDENTICAL operand grouping as stages/similarity.bm25_topk, and
        # both engines' ln is libm, so score_micro matches bit-for-bit
        "bm25_topk": (
            _BM25_RANKED_CTES
            + " SELECT CAST(qid AS BIGINT) AS query_id, "
            "CAST(doc_id AS BIGINT) AS match_id, score_micro "
            "FROM ranked WHERE rn <= 5 ORDER BY query_id, match_id"
        ),
        # RRF hybrid: integer 1e-8 rank units, 60-smoothed, both heads
        "hybrid_rrf_topk": (
            _BM25_RANKED_CTES
            + ", lexpts AS (SELECT qid AS query_id, doc_id, "
            "100000000 // (60 + rn) AS pts FROM ranked "
            "WHERE rn <= 5 AND qid < 4), "
            "vq AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 4), "
            "vscored AS (SELECT vq.query_id, e.vec_id AS doc_id, "
            "round(list_cosine_similarity(CAST(vq.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])), 6) AS s "
            "FROM vq CROSS JOIN embeddings e), "
            "vranked AS (SELECT query_id, doc_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY s DESC, doc_id) AS rn "
            "FROM vscored), "
            "vecpts AS (SELECT query_id, doc_id, 100000000 // (60 + rn) "
            "AS pts FROM vranked WHERE rn <= 10), "
            "fused AS (SELECT query_id, doc_id, "
            "CAST(sum(pts) AS BIGINT) AS rrf_units FROM "
            "(SELECT * FROM lexpts UNION ALL SELECT * FROM vecpts) "
            "GROUP BY query_id, doc_id), "
            "frank AS (SELECT query_id, doc_id, rrf_units, row_number() "
            "OVER (PARTITION BY query_id ORDER BY rrf_units DESC, doc_id) "
            "AS rn FROM fused) "
            "SELECT CAST(query_id AS BIGINT) AS query_id, "
            "CAST(doc_id AS BIGINT) AS doc_id, rrf_units "
            "FROM frank WHERE rn <= 5 "
            "ORDER BY query_id, rrf_units DESC, doc_id"
        ),
        # LEFT OUTER enrichment twin: misses survive with NULL payload
        "doc_embedding_coverage": (
            "SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(count(e.vec_id) AS BIGINT) AS n_matched "
            "FROM documents d LEFT JOIN "
            "(SELECT vec_id FROM embeddings WHERE label = 3) e "
            "ON d.doc_id = e.vec_id "
            "GROUP BY d.lang ORDER BY d.lang"
        ),
        # salted-join plan twin: weighted rollup through a derived
        # distinct-type dimension; integer micros, half-away rounding
        "type_weighted_value_salted": (
            "WITH d AS (SELECT DISTINCT event_type, "
            "CAST(length(event_type) AS BIGINT) AS mult FROM events) "
            "SELECT e.event_type, "
            "CAST(sum(CAST(round(e.value * 1000000) AS BIGINT) * d.mult) "
            "AS BIGINT) AS wsum_micro, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events e JOIN d USING(event_type) "
            "GROUP BY e.event_type ORDER BY e.event_type"
        ),
        # linear classifier inference: the deterministic weight fixture
        # w_j = (((j*37)%19)-9)/10 is generated identically on both
        # engines; accept gates on the ROUNDED logit (bit-deterministic
        # boundary, same convention as curation_survivors)
        "classifier_scores": (
            "WITH w AS (SELECT list_transform(range(0, 64), "
            "j -> CAST((((j*37)%19)-9) AS DOUBLE)/10.0) AS wv), "
            "s AS (SELECT vec_id, round(list_dot_product("
            "CAST(embedding AS DOUBLE[]), (SELECT wv FROM w)), 6) AS logit "
            "FROM embeddings) "
            "SELECT vec_id, logit, logit >= 0 AS accept "
            "FROM s ORDER BY vec_id"
        ),
        # C4-style span dedup: keep-first over 10-token windows; kept iff
        # the occurrence is the (doc_id, span_no)-lexicographic first of
        # its span text — row_number() = 1 is exactly the min-pack winner
        "span_dedup_stats": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, CAST(i AS BIGINT) AS span_no, "
            "array_to_string(toks[CAST(i*10+1 AS BIGINT):"
            "CAST(i*10+10 AS BIGINT)], ' ') AS span "
            "FROM w, UNNEST(range(0, (len(toks)+9)//10)) AS t(i)), "
            "r AS (SELECT doc_id, span_no, row_number() OVER "
            "(PARTITION BY span ORDER BY doc_id, span_no) AS rn FROM s) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_spans, "
            "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_kept, "
            "CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) "
            "AS n_dropped "
            "FROM r GROUP BY doc_id ORDER BY doc_id"
        ),
        # PII redaction over a deterministically planted corpus: chained
        # regexp_replace mirrors stages/text.redact_pii's sequential
        # email -> IP -> phone pipeline (both engines RE2); counts are
        # non-overlapping matches on the pre-replacement string per stage
        "pii_redacted": (
            "WITH base AS (SELECT doc_id, text || "
            "CASE WHEN doc_id % 7 = 0 THEN ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END || "
            "CASE WHEN doc_id % 11 = 0 "
            "THEN ' call 555-867-5309 from 10.0.0.1' ELSE '' END AS t "
            "FROM documents), "
            "e AS (SELECT doc_id, CAST(len(regexp_extract_all(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_emails, regexp_replace(t, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "'<EMAIL>', 'g') AS t FROM base), "
            "i AS (SELECT doc_id, n_emails, CAST(len(regexp_extract_all(t, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) "
            "AS n_ips, regexp_replace(t, "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') "
            "AS t FROM e), "
            "p AS (SELECT doc_id, n_emails, n_ips, "
            "CAST(len(regexp_extract_all(t, "
            "'\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS BIGINT) AS n_phones, "
            "regexp_replace(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', "
            "'<PHONE>', 'g') AS t FROM i) "
            "SELECT doc_id, t AS clean_text, n_emails, n_ips, n_phones "
            "FROM p ORDER BY doc_id"
        ),
        # deterministic pseudo-shuffle: the rank pins the permutation
        "corpus_shuffle_head": (
            "SELECT * FROM (SELECT CAST(row_number() OVER (ORDER BY "
            "((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) "
            "- 1 AS BIGINT) AS rank, doc_id FROM documents) "
            "WHERE rank < 100 ORDER BY rank"
        ),
        # per-stratum downsampling: rate(lang) = (1 + len(lang) % 3) / 4
        "corpus_temperature_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE (doc_id % 1000) < CAST(round("
            "(1 + (length(lang) % 3)) * 0.25 * 1000) AS BIGINT) "
            "ORDER BY doc_id"
        ),
        # ANALYZE-style profile; distinct counts are KMV-exact-regime
        "table_profile": (
            " UNION ALL ".join(
                "SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n, "
                "CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) "
                "AS BIGINT) AS n_null, "
                "CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
                "CAST(1 AS BOOLEAN) AS distinct_exact, "
                "CAST(min({c}) AS VARCHAR) AS min_value, "
                "CAST(max({c}) AS VARCHAR) AS max_value "
                "FROM documents".format(c=c)
                for c in ["doc_id", "lang", "n_chars", "source", "text"]
            )
        ),
        # per-lang percentile band gate; binary-exact quantiles
        "length_band_survivors": (
            "WITH b AS (SELECT lang, "
            "percentile_disc(0.125) WITHIN GROUP (ORDER BY n_chars) AS lo, "
            "percentile_disc(0.875) WITHIN GROUP (ORDER BY n_chars) AS hi "
            "FROM documents GROUP BY lang) "
            "SELECT d.doc_id, d.lang, d.n_chars FROM documents d "
            "JOIN b USING (lang) "
            "WHERE d.n_chars BETWEEN b.lo AND b.hi ORDER BY d.doc_id"
        ),
        # day-2 ingest gate: new-shard docs whose text is NOT in the old
        # corpus (planted +1M copies of the %10==1 slice must all drop)
        "incremental_dedup_survivors": (
            "WITH old AS (SELECT text FROM documents WHERE doc_id % 10 <> 0), "
            "new AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text "
            "FROM documents WHERE doc_id % 10 = 0 "
            "UNION ALL SELECT CAST(doc_id + 1000000 AS BIGINT), text "
            "FROM documents WHERE doc_id % 10 = 1) "
            "SELECT n.doc_id FROM new n "
            "WHERE n.text NOT IN (SELECT text FROM old) ORDER BY n.doc_id"
        ),
        # two-pass z-score: exact integer-cent moments, then the pinned
        # IEEE sequence mean=s/n, var=(n*q-s*s)/(n*n), std=sqrt, z=(x-m)/sd
        "value_zscore_by_type": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events), "
            "g AS (SELECT event_type, CAST(sum(cents) AS BIGINT) AS s, "
            "CAST(sum(cents * cents) AS BIGINT) AS q, "
            "CAST(count(*) AS BIGINT) AS n FROM c GROUP BY event_type) "
            "SELECT c.event_id, c.event_type, "
            "round((CAST(c.cents AS DOUBLE) - "
            "CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE)) / "
            "sqrt((CAST(g.n AS DOUBLE) * CAST(g.q AS DOUBLE) - "
            "CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)) / "
            "(CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE))), 6) AS z "
            "FROM c JOIN g USING (event_type) ORDER BY event_id"
        ),
        # supply-side region rollup: lineitem x supplier x nation x region
        "supplier_region_revenue": (
            "SELECT r.r_name AS region, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_centicents, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem l "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name ORDER BY region"
        ),
        # conditional revenue split per brand (Q14 flavor, grouped)
        "promo_brand_revenue": (
            "SELECT p.p_brand, "
            "CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN cc ELSE 0 END) "
            "AS BIGINT) AS promo_centicents, "
            "CAST(sum(cc) AS BIGINT) AS revenue_centicents, "
            "CAST(count(*) FILTER (p.p_type = 'PROMO') AS BIGINT) "
            "AS n_promo_items, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem) l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY p.p_brand ORDER BY p_brand"
        ),
        # EXISTS(shipdate > orderdate + 60d) == max(shipdate) beats it
        "late_shipment_priority": (
            "SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_late "
            "FROM orders o JOIN (SELECT l_orderkey, max(l_shipdate) AS m "
            "FROM lineitem GROUP BY l_orderkey) s "
            "ON s.l_orderkey = o.o_orderkey "
            "WHERE s.m > o.o_orderdate + INTERVAL 60 DAY "
            "GROUP BY o.o_orderpriority ORDER BY o_orderpriority"
        ),
        # TPC-H Q13 shape: order-count histogram incl. the zero bucket
        "q13_customer_distribution": (
            "WITH pc AS (SELECT c_custkey, count(o_orderkey) AS c_orders "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey) "
            "SELECT c_orders, CAST(count(*) AS BIGINT) AS n_custs "
            "FROM pc GROUP BY c_orders ORDER BY c_orders"
        ),
        # TPC-H Q17 shape: small-quantity revenue for one brand; the
        # correlated AVG decided in integers (5*q*c < s)
        "q17_small_quantity_revenue": (
            "WITH bl AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_brand = 'Brand#1'), "
            "st AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS s, "
            "CAST(count(*) AS BIGINT) AS c FROM bl GROUP BY l_partkey) "
            "SELECT CAST(COALESCE(sum(b.cents), 0) AS BIGINT) AS "
            "revenue_cents, CAST(count(*) AS BIGINT) AS n_lines "
            "FROM bl b JOIN st USING (l_partkey) WHERE 5 * b.q * c < s"
        ),
        # TPC-H Q21 shape: only-late supplier in multi-supplier orders
        "q21_waiting_suppliers": (
            "WITH pair AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) "
            "AS ms FROM lineitem GROUP BY l_orderkey, l_suppkey), "
            "flag AS (SELECT p.l_orderkey, p.l_suppkey, CASE WHEN p.ms > "
            "o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late "
            "FROM pair p JOIN orders o ON p.l_orderkey = o.o_orderkey), "
            "agg AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS "
            "n_late FROM flag GROUP BY l_orderkey), "
            "winners AS (SELECT f.l_suppkey FROM flag f JOIN agg a "
            "USING (l_orderkey) WHERE a.n_supp >= 2 AND a.n_late = 1 "
            "AND f.late = 1), "
            "cnt AS (SELECT l_suppkey, count(*) AS numwait FROM winners "
            "GROUP BY l_suppkey) "
            "SELECT s.s_name AS s_name, CAST(c.numwait AS BIGINT) AS "
            "numwait FROM cnt c JOIN supplier s ON s.s_suppkey = "
            "c.l_suppkey ORDER BY numwait DESC, s_name LIMIT 10"
        ),
        # TPC-H Q22 shape: above-average-balance customers with no orders,
        # per market segment; predicate in integers (cents*n > s)
        "q22_idle_balance": (
            "WITH pos AS (SELECT c_custkey, CAST(round(c_acctbal * 100) "
            "AS BIGINT) AS cents, c_mktsegment FROM customer), "
            "stats AS (SELECT CAST(sum(CASE WHEN cents > 0 THEN cents "
            "ELSE 0 END) AS BIGINT) AS s, CAST(count(*) FILTER ("
            "WHERE cents > 0) AS BIGINT) AS n FROM pos), "
            "idle AS (SELECT p.* FROM pos p, stats WHERE "
            "p.cents * stats.n > stats.s AND p.c_custkey NOT IN "
            "(SELECT o_custkey FROM orders)) "
            "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs, "
            "CAST(sum(cents) AS BIGINT) AS balance_cents FROM idle "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        # TPC-H Q6: one-scan filter-aggregate; discount in integer percent
        "q6_forecast_revenue": (
            "SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) "
            "AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)), 0) "
            "AS BIGINT) AS revenue_centicents, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM lineitem "
            "WHERE year(l_shipdate) = 1996 AND l_quantity < 24 "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7"
        ),
        # TPC-H Q14: PROMO share of one ship month's revenue, integer ppm
        "q14_promo_effect": (
            "WITH l AS (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem WHERE year(l_shipdate) = 1996 "
            "AND month(l_shipdate) = 3), "
            "j AS (SELECT cc, CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END "
            "AS pr FROM l JOIN part ON p_partkey = l_partkey) "
            "SELECT CAST(COALESCE(sum(CASE WHEN pr = 1 THEN cc END), 0) "
            "AS BIGINT) AS promo_centicents, "
            "CAST(COALESCE(sum(cc), 0) AS BIGINT) AS total_centicents, "
            "CAST(CASE WHEN COALESCE(sum(cc), 0) > 0 THEN "
            "(sum(CASE WHEN pr = 1 THEN cc ELSE 0 END) * 1000000) "
            "// sum(cc) ELSE 0 END AS BIGINT) AS promo_share_ppm, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM j"
        ),
        # TPC-H Q19: disjunctive (brand, size, qty) revenue; p_size stands
        # in for p_container; discount band in integer percent
        "q19_discount_revenue": (
            "SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice * 100) "
            "AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            "), 0) AS BIGINT) AS revenue_centicents, "
            "CAST(count(*) AS BIGINT) AS n_lines "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND ((p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30))"
        ),
        # TPC-H Q10: top-20 customers by returned-item revenue, one quarter
        "q10_returned_items": (
            "WITH rl AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem WHERE l_returnflag = 'R'), "
            "per AS (SELECT o_custkey, CAST(sum(cc) AS BIGINT) AS rev "
            "FROM rl JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1996-04-01' GROUP BY o_custkey) "
            "SELECT c_custkey, c_name, per.rev AS revenue_centicents, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, "
            "n_name FROM per "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "ORDER BY revenue_centicents DESC, c_custkey LIMIT 20"
        ),
        # TPC-H Q12 shape: late lines per returnflag x priority class
        "q12_priority_classes": (
            "SELECT l_returnflag, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE year(l_shipdate) = 1996 "
            "AND l_shipdate > o_orderdate + INTERVAL 30 DAY "
            "GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        # TPC-H Q15: max-revenue supplier(s) over one ship quarter
        "q15_top_supplier": (
            "WITH r AS (SELECT l_suppkey, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS total FROM lineitem "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, r.total AS total_revenue_centicents "
            "FROM r JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE r.total = (SELECT max(total) FROM r) ORDER BY s_suppkey"
        ),
        # TPC-H Q8: NATION_5 market share of ASIA STANDARD-part volume/year
        "q8_market_share": (
            "WITH ords AS (SELECT o_orderkey, year(o_orderdate) AS o_year "
            "FROM orders JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "WHERE r_name = 'ASIA' AND year(o_orderdate) IN (1996, 1997)), "
            "l AS (SELECT l_orderkey, l_suppkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_type = 'STANDARD'), "
            "j AS (SELECT o_year, cc, CASE WHEN n2.n_name = 'NATION_5' "
            "THEN cc ELSE 0 END AS num FROM l "
            "JOIN ords ON o_orderkey = l_orderkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation n2 ON n2.n_nationkey = s_nationkey) "
            "SELECT CAST(o_year AS BIGINT) AS o_year, "
            "CAST(sum(num) AS BIGINT) AS nation_centicents, "
            "CAST(sum(cc) AS BIGINT) AS total_centicents, "
            "CAST(CASE WHEN sum(cc) > 0 THEN (sum(num) * 1000000) "
            "// sum(cc) ELSE 0 END AS BIGINT) AS mkt_share_ppm "
            "FROM j GROUP BY o_year ORDER BY o_year"
        ),
        # TPC-H Q9: red-part profit by supplier nation x order year
        "q9_product_profit": (
            "WITH l AS (SELECT l_orderkey, l_suppkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_name LIKE 'red %') "
            "SELECT n_name AS nation, "
            "CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "CAST(sum(cc) AS BIGINT) AS profit_centicents, "
            "CAST(count(*) AS BIGINT) AS n_lines FROM l "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "GROUP BY n_name, o_year ORDER BY nation, o_year DESC"
        ),
        # TPC-H Q2 shape: min-balance EUROPE shipper per size-15 part
        # (acctbal stands in for ps_supplycost; shipped pairs for partsupp)
        "q2_min_balance_supplier": (
            "WITH pr AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
            "JOIN part ON p_partkey = l_partkey WHERE p_size = 15), "
            "eu AS (SELECT s_suppkey, s_name, n_name, "
            "CAST(round(s_acctbal * 100) AS BIGINT) AS cents FROM supplier "
            "JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "WHERE r_name = 'EUROPE'), "
            "pe AS (SELECT l_partkey, s_suppkey, s_name, n_name, cents "
            "FROM pr JOIN eu ON s_suppkey = l_suppkey), "
            "mn AS (SELECT l_partkey, min(cents) AS m FROM pe GROUP BY 1) "
            "SELECT pe.cents AS acctbal_cents, pe.s_name, pe.n_name, "
            "pe.l_partkey AS p_partkey, p.p_name "
            "FROM pe JOIN mn USING (l_partkey) "
            "JOIN part p ON p.p_partkey = pe.l_partkey "
            "WHERE pe.cents = mn.m "
            "ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey "
            "LIMIT 100"
        ),
        # TPC-H Q11 shape: parts above 0.1% of EUROPE-supplied value
        "q11_important_parts": (
            "WITH l AS (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cc "
            "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "WHERE r_name = 'EUROPE'), "
            "pv AS (SELECT l_partkey, CAST(sum(cc) AS BIGINT) AS v "
            "FROM l GROUP BY 1) "
            "SELECT l_partkey AS p_partkey, v AS value_centicents "
            "FROM pv, (SELECT sum(v) AS tot FROM pv) "
            "WHERE v * 1000 > tot "
            "ORDER BY value_centicents DESC, p_partkey"
        ),
        # TPC-H Q16 shape: distinct shipping suppliers per brand/type/size
        "q16_supplier_part_counts": (
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45) "
            "AND s_acctbal >= 0 "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        # TPC-H Q20 shape: NATION_3 suppliers over 20% of a blue part's
        # 1996 quantity (5 * sq > tq in integers)
        "q20_volume_share_suppliers": (
            "WITH bl AS (SELECT l_partkey, l_suppkey, "
            "CAST(l_quantity AS BIGINT) AS q FROM lineitem "
            "JOIN part ON p_partkey = l_partkey "
            "WHERE p_name LIKE 'blue %' AND year(l_shipdate) = 1996), "
            "ps AS (SELECT l_partkey, l_suppkey, sum(q) AS sq "
            "FROM bl GROUP BY 1, 2), "
            "pt AS (SELECT l_partkey, sum(q) AS tq FROM bl GROUP BY 1), "
            "w AS (SELECT DISTINCT l_suppkey FROM ps "
            "JOIN pt USING (l_partkey) WHERE 5 * sq > tq) "
            "SELECT s_suppkey, s_name FROM w "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE n_name = 'NATION_3' ORDER BY s_suppkey"
        ),
        # latest-per-key snapshot: ts DESC, event_id DESC winner
        "latest_user_event": (
            "WITH r AS (SELECT user_id, event_id, event_type, "
            "epoch_us(ts) AS ts_us, row_number() OVER "
            "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) "
            "AS rn FROM events) "
            "SELECT user_id, event_id, event_type, "
            "CAST(ts_us AS BIGINT) AS ts_us "
            "FROM r WHERE rn = 1 ORDER BY user_id"
        ),
        # cohort retention triangle over integer day indices
        "user_retention_cohorts": (
            "WITH pairs AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), "
            "cohorts AS (SELECT user_id, MIN(day) AS cohort_day "
            "FROM pairs GROUP BY user_id) "
            "SELECT c.cohort_day, p.day - c.cohort_day AS offset_days, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM pairs p JOIN cohorts c USING (user_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # first-order Markov transitions: the LAG(event_type) window
        "event_transitions": (
            "WITH s AS (SELECT event_type, lag(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
            "FROM events) "
            "SELECT prev_type, event_type AS next_type, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM s WHERE prev_type IS NOT NULL "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # strict-order funnel: each stage's earliest event strictly after
        # the previous stage's chosen event
        "funnel_stage_counts": (
            "WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "t2 AS (SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e "
            "JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1 "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "t3 AS (SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e "
            "JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2 "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT t1.user_id, CAST(CASE WHEN t3.user_id IS NOT NULL "
            "THEN 3 WHEN t2.user_id IS NOT NULL THEN 2 ELSE 1 END "
            "AS BIGINT) AS funnel_stage "
            "FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id "
            "LEFT JOIN t3 ON t1.user_id = t3.user_id ORDER BY t1.user_id"
        ),
        # lower weighted median: smallest value whose cumulative weight
        # reaches half the group total (integer cents / integer weights)
        "weighted_median_price": (
            "WITH agg AS (SELECT l_returnflag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents, "
            "SUM(CAST(round(l_quantity) AS BIGINT)) AS w "
            "FROM lineitem GROUP BY 1, 2), "
            "tot AS (SELECT l_returnflag, SUM(w) AS tw FROM agg GROUP BY 1), "
            "c AS (SELECT l_returnflag, price_cents, SUM(w) OVER "
            "(PARTITION BY l_returnflag ORDER BY price_cents) AS cw FROM agg) "
            "SELECT c.l_returnflag, "
            "CAST(MIN(c.price_cents) AS BIGINT) AS wmedian_cents "
            "FROM c JOIN tot t USING (l_returnflag) WHERE 2 * c.cw >= t.tw "
            "GROUP BY c.l_returnflag ORDER BY c.l_returnflag"
        ),
        # interval sweep-line peak occupancy over the session windows
        # (starts order before ends at equal ts: touching = concurrent)
        "peak_concurrent_sessions": (
            "WITH o AS ("
            "  SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 "
            "    THEN 1 ELSE 0 END AS new_sess"
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts_us,"
            "    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
            "      ROWS UNBOUNDED PRECEDING) AS session_id"
            "  FROM o"
            "), sess AS ("
            "  SELECT user_id, session_id, min(ts_us) AS start_us, "
            "  max(ts_us) AS end_us FROM s GROUP BY user_id, session_id"
            "), d AS ("
            "  SELECT start_us AS ts_us, 0 AS o, 1 AS delta FROM sess "
            "  UNION ALL SELECT end_us, 1, -1 FROM sess"
            "), c AS ("
            "  SELECT ts_us, SUM(delta) OVER (ORDER BY ts_us, o "
            "  ROWS UNBOUNDED PRECEDING) AS occ FROM d"
            "), p AS (SELECT MAX(occ) AS peak FROM c) "
            "SELECT CAST(p.peak AS BIGINT) AS peak_sessions, "
            "CAST(MIN(c.ts_us) AS BIGINT) AS first_peak_us "
            "FROM c, p WHERE c.occ = p.peak GROUP BY p.peak"
        ),
        # NTILE(4) per type (value, id ordered), rolled to tile stats
        "value_quartile_rollup": (
            "WITH r AS (SELECT event_type, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "NTILE(4) OVER (PARTITION BY event_type "
            "ORDER BY value, event_id) AS tile FROM events) "
            "SELECT event_type, CAST(tile AS BIGINT) AS tile, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents "
            "FROM r GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # FULL OUTER high-balance coverage: filtered sides leave one-side
        # nations, exercising the outer fill for real
        "nation_account_coverage": (
            "WITH c AS (SELECT c_nationkey AS nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_cust FROM customer "
            "WHERE c_acctbal > 9000 GROUP BY 1), "
            "s AS (SELECT s_nationkey AS nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_supp FROM supplier "
            "WHERE s_acctbal > 9000 GROUP BY 1) "
            "SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, "
            "COALESCE(c.n_cust, 0) AS n_cust, "
            "COALESCE(s.n_supp, 0) AS n_supp "
            "FROM c FULL JOIN s ON c.nationkey = s.nationkey ORDER BY 1"
        ),
        # TPC-H Q3 shape: top-10 outstanding revenue, BUILDING segment
        "q3_shipping_priority": (
            "SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_cc, "
            "CAST(epoch_us(o_orderdate) AS BIGINT) AS orderdate_us "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey "
            "AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY l_orderkey, o_orderdate "
            "ORDER BY revenue_cc DESC, l_orderkey LIMIT 10"
        ),
        # referential-integrity audit: orphan child rows per FK edge
        "fk_integrity_report": (
            "SELECT 'orders.o_custkey->customer' AS fk_edge, "
            "CAST(COUNT(*) AS BIGINT) AS n_orphan_rows FROM orders "
            "WHERE o_custkey NOT IN (SELECT c_custkey FROM customer) "
            "UNION ALL SELECT 'lineitem.l_orderkey->orders', "
            "CAST(COUNT(*) AS BIGINT) FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders) "
            "UNION ALL SELECT 'lineitem.l_partkey->part', "
            "CAST(COUNT(*) AS BIGINT) FROM lineitem "
            "WHERE l_partkey NOT IN (SELECT p_partkey FROM part) "
            "UNION ALL SELECT 'lineitem.l_suppkey->supplier', "
            "CAST(COUNT(*) AS BIGINT) FROM lineitem "
            "WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier) "
            "ORDER BY fk_edge"
        ),
        # OHLC bars: order-dependent open/close pinned by (ts, event_id)
        "ohlc_hourly": (
            "WITH b AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "row_number() OVER (PARTITION BY event_type, "
            "epoch_us(ts) // 3600000000 ORDER BY ts, event_id) AS rf, "
            "row_number() OVER (PARTITION BY event_type, "
            "epoch_us(ts) // 3600000000 ORDER BY ts DESC, event_id DESC) AS rl "
            "FROM events) "
            "SELECT event_type, hour, "
            "CAST(MAX(CASE WHEN rf = 1 THEN cents END) AS BIGINT) AS open_cents, "
            "CAST(MAX(cents) AS BIGINT) AS high_cents, "
            "CAST(MIN(cents) AS BIGINT) AS low_cents, "
            "CAST(MAX(CASE WHEN rl = 1 THEN cents END) AS BIGINT) AS close_cents, "
            "CAST(COUNT(*) AS BIGINT) AS n_events "
            'FROM b GROUP BY event_type, "hour" ORDER BY event_type, "hour"'
        ),
        # relational UNPIVOT (wide stats -> long rows)
        "lang_stats_unpivot": (
            "WITH w AS (SELECT lang, CAST(MIN(n_chars) AS BIGINT) AS n_min, "
            "CAST(MAX(n_chars) AS BIGINT) AS n_max, "
            "CAST(SUM(n_chars) AS BIGINT) AS n_sum "
            "FROM documents GROUP BY lang) "
            "SELECT lang, stat, value FROM "
            "(UNPIVOT w ON n_min, n_max, n_sum INTO NAME stat VALUE value) "
            "ORDER BY lang, stat"
        ),
        # market-basket support: users who did BOTH of each type pair
        "type_cooccurrence": (
            "WITH p AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM p a JOIN p b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # row-level session assignment: the session table's s CTE itself
        "event_session_assignment": (
            "WITH o AS ("
            "  SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 "
            "    THEN 1 ELSE 0 END AS new_sess"
            "  FROM events"
            ") SELECT user_id, event_id, CAST(ts_us AS BIGINT) AS ts_us, "
            "CAST(SUM(new_sess) OVER (PARTITION BY user_id "
            "ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) "
            "AS session_id FROM o ORDER BY user_id, event_id"
        ),
        # user lifetime curve: first-to-last-day span histogram
        "user_lifespan_histogram": (
            "WITH l AS (SELECT user_id, "
            "CAST(max(epoch_us(ts) // 86400000000) - "
            "min(epoch_us(ts) // 86400000000) AS BIGINT) AS lifespan_days "
            "FROM events GROUP BY user_id) "
            "SELECT lifespan_days, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM l GROUP BY 1 ORDER BY 1"
        ),
        # exact phrase search with occurrence counts
        "phrase_occurrences": (
            "SELECT doc_id, "
            "CAST((length(text) - length(replace(text, 'table value', ''))) "
            "// length('table value') AS BIGINT) AS n_occurrences "
            "FROM documents WHERE contains(text, 'table value') "
            "ORDER BY doc_id"
        ),
        # exact-integer 2-sigma daily volume anomaly test
        "anomalous_days": (
            "WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) "
            "AS day, CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
            "GROUP BY 1), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(n_events) AS sm, SUM(n_events * n_events) AS ss FROM d) "
            "SELECT day, n_events FROM d, s "
            "WHERE (n * n_events - sm) * (n * n_events - sm) > "
            "4 * (n * ss - sm * sm) ORDER BY day"
        ),
        # gaps-and-islands: longest consecutive-active-day run per user
        "longest_daily_streak": (
            "WITH days AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), "
            "isl AS (SELECT user_id, day - ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY day) AS grp FROM days), "
            "runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len "
            "FROM isl GROUP BY user_id, grp), "
            "best AS (SELECT user_id, MAX(len) AS streak_days "
            "FROM runs GROUP BY user_id) "
            "SELECT streak_days, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM best GROUP BY 1 ORDER BY 1"
        ),
        # behavioral diversity: per-user event-type Shannon entropy in
        # integer 1e-8 nats (the token_entropy float discipline)
        "user_type_entropy": (
            "WITH ct AS (SELECT user_id, event_type, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2), "
            "u AS (SELECT user_id, SUM(c) AS n, "
            "SUM(CAST(floor(ln(c) * c * 1e8) AS BIGINT)) AS s "
            "FROM ct GROUP BY user_id) "
            "SELECT user_id, "
            "round(ln(n) - CAST(s AS DOUBLE) / (n * 1e8), 6) AS entropy "
            "FROM u ORDER BY user_id"
        ),
        # TPC-H Q18 shape: HAVING on the fat child thins to the winner
        # set before either join
        "large_volume_customers": (
            "WITH w AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY 1 "
            "HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 300) "
            "SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "o_orderkey, CAST(epoch_us(o_orderdate) AS BIGINT) AS orderdate_us, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_c, w.sum_qty "
            "FROM w, orders, customer "
            "WHERE o_orderkey = w.l_orderkey AND c_custkey = o_custkey "
            "ORDER BY total_c DESC, o_orderkey LIMIT 100"
        ),
        # correlated aggregate: order value vs its customer's average,
        # decided in integers (tc*n > s) so no float tie ambiguity
        "orders_above_cust_avg": (
            "WITH c AS (SELECT o_orderpriority, o_custkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS tc FROM orders), "
            "w AS (SELECT o_orderpriority, tc, "
            "SUM(tc) OVER (PARTITION BY o_custkey) AS s, "
            "COUNT(*) OVER (PARTITION BY o_custkey) AS n FROM c) "
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above "
            "FROM w WHERE tc * n > s GROUP BY 1 ORDER BY 1"
        ),
        # cross-table UNION ALL harmonized activity rollup
        "daily_activity_union": (
            "WITH u AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) "
            "AS day, 'events' AS source FROM events UNION ALL "
            "SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT), "
            "'orders' FROM orders) "
            "SELECT day, source, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM u GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # relational INTERSECT / EXCEPT over distinct-key subqueries
        "user_setops": (
            "WITH c AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'click'), "
            "p AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT CAST((SELECT count(*) FROM (SELECT user_id FROM c "
            "INTERSECT SELECT user_id FROM p)) AS BIGINT) AS n_both, "
            "CAST((SELECT count(*) FROM (SELECT user_id FROM c "
            "EXCEPT SELECT user_id FROM p)) AS BIGINT) AS n_click_only, "
            "CAST((SELECT count(*) FROM (SELECT user_id FROM p "
            "EXCEPT SELECT user_id FROM c)) AS BIGINT) AS n_purchase_only"
        ),
        # GROUP BY CUBE with the GROUPING() bitmask; the Ray side expands
        # grouping sets map-side and never folds on the driver
        "cube_type_weekday": (
            "WITH e AS (SELECT event_type, "
            "CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS d, "
            "CAST(round(value * 100) AS BIGINT) AS vc FROM events) "
            "SELECT COALESCE(event_type, '(all)') AS event_type, "
            "COALESCE(d, -1) AS dow, "
            "CAST(GROUPING(event_type, d) AS BIGINT) AS gid, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(vc) AS BIGINT) AS value_c "
            "FROM e GROUP BY CUBE(event_type, d) ORDER BY gid, event_type, dow"
        ),
        # TPC-H Q7 shape: revenue between nation pairs per ship year
        "nations_volume_shipping": (
            "WITH rev AS (SELECT l_suppkey, l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rcc, "
            "CAST(year(l_shipdate) AS BIGINT) AS year FROM lineitem) "
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "year, CAST(SUM(rcc) AS BIGINT) AS revenue_cc, "
            "CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM rev "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation n1 ON n1.n_nationkey = s_nationkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation n2 ON n2.n_nationkey = c_nationkey "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        # degenerate-exact KMV overlap (k above both distinct counts);
        # jaccard in integer ppm — non-negative floor division parity
        "kmv_overlap_exact": (
            "WITH c AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'click'), "
            "p AS (SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'purchase'), "
            "i AS (SELECT count(*) AS n FROM (SELECT user_id FROM c "
            "INTERSECT SELECT user_id FROM p)), "
            "u AS (SELECT count(*) AS n FROM (SELECT user_id FROM c "
            "UNION SELECT user_id FROM p)) "
            "SELECT CAST(u.n AS BIGINT) AS n_union, "
            "CAST(i.n AS BIGINT) AS n_inter, "
            "CAST(i.n * 1000000 // GREATEST(u.n, 1) AS BIGINT) AS jaccard_ppm "
            "FROM i, u"
        ),
        # Pareto frontier via correlated NOT EXISTS dominance; duplicate
        # (size, price) points are mutually non-dominating tie classes
        "parts_pareto": (
            "WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_c FROM part) "
            "SELECT p_partkey, p_size, price_c FROM p "
            "WHERE NOT EXISTS (SELECT 1 FROM p q "
            "WHERE q.p_size <= p.p_size AND q.price_c <= p.price_c "
            "AND (q.p_size < p.p_size OR q.price_c < p.price_c)) "
            "ORDER BY p_partkey"
        ),
        # calendar densification: generated day axis LEFT JOIN counts,
        # zero-activity days preserved
        "daily_counts_dense": (
            "WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) "
            "AS day FROM events), "
            "c AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM d "
            "GROUP BY day), "
            "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
            "cal AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b) "
            "SELECT cal.day, COALESCE(c.n, 0) AS n_events "
            "FROM cal LEFT JOIN c ON c.day = cal.day ORDER BY cal.day"
        ),
        # TPC-H Q4 shape: EXISTS with an inequality, reduced to a
        # per-order max on the Ray side
        "orders_late_exists": (
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_late_orders FROM orders "
            "WHERE EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey "
            "AND epoch_us(l_shipdate) > epoch_us(o_orderdate) "
            "+ 30 * 86400000000) "
            "GROUP BY 1 ORDER BY 1"
        ),
        # LAG window over the densified aggregate series (NULL first row)
        "daily_delta": (
            "WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) "
            "AS day FROM events), "
            "c AS (SELECT day, CAST(count(*) AS BIGINT) AS n FROM d "
            "GROUP BY day), "
            "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), "
            "cal AS (SELECT unnest(generate_series(lo, hi)) AS day FROM b), "
            "dense AS (SELECT cal.day, COALESCE(c.n, 0) AS n_events "
            "FROM cal LEFT JOIN c ON c.day = cal.day) "
            "SELECT day, n_events, "
            "CAST(n_events - lag(n_events) OVER (ORDER BY day) AS BIGINT) "
            "AS delta FROM dense ORDER BY day"
        ),
        # custom GROUPING SETS ((lang), (source)) — completes the
        # ROLLUP / CUBE / GROUPING SETS trio
        "docs_grouping_sets": (
            "SELECT COALESCE(lang, '(all)') AS lang, "
            "COALESCE(source, '(all)') AS source, "
            "CAST(GROUPING(lang, source) AS BIGINT) AS gid, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY GROUPING SETS ((lang), (source)) "
            "ORDER BY gid, lang, source"
        ),
        # growth accounting: DAU split into new vs returning via the
        # per-user first-seen day
        "user_growth_accounting": (
            "WITH p AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), "
            "f AS (SELECT user_id, min(day) AS fd FROM p GROUP BY 1), "
            "a AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active "
            "FROM p GROUP BY 1), "
            "nw AS (SELECT fd AS day, CAST(count(*) AS BIGINT) AS n_new "
            "FROM f GROUP BY 1) "
            "SELECT a.day, a.n_active, COALESCE(nw.n_new, 0) AS n_new, "
            "a.n_active - COALESCE(nw.n_new, 0) AS n_returning "
            "FROM a LEFT JOIN nw ON nw.day = a.day ORDER BY a.day"
        ),
        # revenue concentration: top-100 customer share in ppm,
        # row_number tie-break by custkey ASC
        "revenue_concentration": (
            "WITH pc AS (SELECT o_custkey, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS rev_c FROM orders GROUP BY 1), "
            "r AS (SELECT rev_c, row_number() OVER "
            "(ORDER BY rev_c DESC, o_custkey) AS rn FROM pc), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(SUM(rev_c) AS BIGINT) AS total_c FROM pc), "
            "tp AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS top_c FROM r "
            "WHERE rn <= 100) "
            "SELECT t.n_customers, t.total_c, tp.top_c, "
            "CAST(tp.top_c * 1000000 // GREATEST(t.total_c, 1) AS BIGINT) "
            "AS top_ppm FROM t, tp"
        ),
        # context-window chunking with overlap (chunk 128, stride 96):
        # pure integer geometry, generate_series fan-out twin
        "doc_chunks": (
            "WITH tc AS (SELECT doc_id, "
            "CAST(CASE WHEN trim(text, ' ') = '' THEN 0 "
            "ELSE len(string_split_regex(trim(text, ' '), '\\s+')) END "
            "AS BIGINT) AS n FROM documents), "
            "nc AS (SELECT doc_id, n, CASE WHEN n <= 128 THEN 1 "
            "ELSE (n - 128 + 95) // 96 + 1 END AS k FROM tc), "
            "e AS (SELECT doc_id, n, "
            "unnest(generate_series(0, k - 1)) AS chunk_id FROM nc) "
            "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
            "CAST(chunk_id * 96 AS BIGINT) AS start_tok, "
            "CAST(LEAST(chunk_id * 96 + 128, n) AS BIGINT) AS end_tok, "
            "CAST(LEAST(chunk_id * 96 + 128, n) - chunk_id * 96 AS BIGINT) "
            "AS n_tokens "
            "FROM e ORDER BY doc_id, chunk_id"
        ),
        # day-granular exponential decay (halflife 1 day, 30-day horizon):
        # powers of two are exact in int64 and in power(), sums order-free
        "type_decay_scores": (
            "WITH d AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events), "
            "m AS (SELECT max(day) AS md FROM d) "
            "SELECT event_type, CAST(SUM(CASE WHEN m.md - day <= 30 "
            "THEN CAST(power(2, 30 - (m.md - day)) AS BIGINT) ELSE 0 END) "
            "AS BIGINT) AS decayed_score "
            "FROM d, m GROUP BY event_type ORDER BY event_type"
        ),
        # SCD2 validity intervals: valid_to = min ts STRICTLY after, NULL
        # on the open last interval (RANGE following window frame)
        "user_value_intervals": (
            "WITH e AS (SELECT event_id, user_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS tus FROM events) "
            "SELECT event_id, tus AS valid_from_us, "
            "MIN(tus) OVER (PARTITION BY user_id ORDER BY tus "
            "RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) "
            "AS valid_to_us FROM e ORDER BY event_id"
        ),
        # user-set Jaccard per type pair on top of co-occurrence supports
        "type_jaccard_pairs": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events), "
            "c AS (SELECT event_type, count(*) AS n FROM d GROUP BY 1), "
            "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*) AS n_both FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2) "
            "SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both, "
            "CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b, "
            "CAST(p.n_both * 1000000 // (ca.n + cb.n - p.n_both) AS BIGINT) "
            "AS jaccard_ppm FROM p "
            "JOIN c ca ON ca.event_type = p.type_a "
            "JOIN c cb ON cb.event_type = p.type_b "
            "ORDER BY type_a, type_b"
        ),
        # rank-trimmed sums: drop k smallest + k largest values per type;
        # kept-multiset SUM is tie-invariant so row_number ties are safe
        "trimmed_value_sums": (
            "WITH v AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS vc FROM events), "
            "r AS (SELECT event_type, vc, row_number() OVER "
            "(PARTITION BY event_type ORDER BY vc) AS rn, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM v) "
            "SELECT event_type, "
            "CAST(SUM(CASE WHEN rn > 5 AND rn <= n - 5 THEN vc ELSE 0 END) "
            "AS BIGINT) AS trimmed_c, "
            "CAST(count(*) FILTER (WHERE rn > 5 AND rn <= n - 5) AS BIGINT) "
            "AS n_kept "
            "FROM r GROUP BY 1 ORDER BY 1"
        ),
        # string aggregation: sorted distinct sources joined per lang
        "lang_sources_concat": (
            "SELECT lang, "
            "string_agg(DISTINCT source, ',' ORDER BY source) AS sources, "
            "CAST(count(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        # per-dimension embedding stats via zipped unnest ordinality
        # grouped vector mean: centroid = sum_micro // n, floor division
        "label_centroids": (
            "WITH u AS (SELECT CAST(label AS BIGINT) AS label, "
            "unnest(embedding) AS x, "
            "unnest(range(0, len(embedding))) AS dim FROM embeddings), "
            "c AS (SELECT label, dim, "
            "CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS m "
            "FROM u) "
            "SELECT label, CAST(dim AS BIGINT) AS dim, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(m) // count(*) AS BIGINT) AS centroid_micro "
            "FROM c GROUP BY label, dim ORDER BY label, dim"
        ),
        "embedding_dim_stats": (
            "WITH u AS (SELECT unnest(embedding) AS x, "
            "unnest(range(0, len(embedding))) AS dim FROM embeddings), "
            "c AS (SELECT dim, "
            "CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS m "
            "FROM u) "
            "SELECT CAST(dim AS BIGINT) AS dim, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(m) AS BIGINT) AS sum_micro, "
            "CAST(min(m) AS BIGINT) AS min_micro, "
            "CAST(max(m) AS BIGINT) AS max_micro "
            "FROM c GROUP BY dim ORDER BY dim"
        ),
        # time-weighted value: cents held until the next event, whole-s
        "user_time_weighted_value": (
            "WITH c AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events), "
            "g AS (SELECT user_id, cents, "
            "(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) "
            "- us) // 1000000 AS gap_s FROM c) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS sum_gap_s, "
            "CAST(coalesce(sum(cents * gap_s), 0) AS BIGINT) "
            "AS weighted_val_s "
            "FROM g GROUP BY user_id ORDER BY user_id"
        ),
        # bounded window frame: ROWS 3 PRECEDING .. CURRENT per user
        "user_moving_value": (
            "WITH c AS (SELECT user_id, event_id, ts, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, event_id, "
            "CAST(sum(cents) OVER w AS BIGINT) AS mov_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS mov_n "
            "FROM c WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) "
            "ORDER BY event_id"
        ),
        # TIME-RANGE frame twin (unique (user, ts) ordering — no peers)
        "user_trailing_hour_value": (
            "WITH c AS (SELECT user_id, event_id, ts, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events) "
            "SELECT user_id, event_id, "
            "CAST(sum(cents) OVER w AS BIGINT) AS mov_sum, "
            "CAST(count(*) OVER w AS BIGINT) AS mov_n "
            "FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "ORDER BY event_id"
        ),
        # JSON field extraction + grouped stats; missing k -> NULL
        "props_key_stats": (
            "WITH c AS (SELECT event_type, "
            "CAST(json_extract(try_cast(props AS JSON), '$.k') AS BIGINT) "
            "AS k FROM events) "
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) FILTER (k IS NULL) AS BIGINT) AS n_missing, "
            "CAST(sum(k) AS BIGINT) AS sum_k, "
            "CAST(min(k) AS BIGINT) AS min_k, "
            "CAST(max(k) AS BIGINT) AS max_k "
            "FROM c GROUP BY event_type ORDER BY event_type"
        ),
        # drift correlation: pinned float tail over exact integer sums
        "value_time_corr": (
            "WITH t0 AS (SELECT min(epoch_us(ts)) // 1000000 AS t0 "
            "FROM events), "
            "c AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS x, "
            "epoch_us(ts) // 1000000 - t0.t0 AS y "
            "FROM events CROSS JOIN t0), "
            "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
            "CAST(sum(x*y) AS BIGINT) AS sxy, "
            "CAST(sum(x*x) AS BIGINT) AS sxx, "
            "CAST(sum(y*y) AS BIGINT) AS syy FROM c GROUP BY event_type) "
            "SELECT event_type, n, "
            "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr "
            "FROM g ORDER BY event_type"
        ),
        # fuzzy match: min edit distance per query, (dist, id) tiebreak
        "fuzzy_top1": (
            "WITH q AS (SELECT doc_id AS qid, text AS qt FROM documents "
            "WHERE doc_id < 4), "
            "d AS (SELECT q.qid, d.doc_id, levenshtein(q.qt, d.text) AS "
            "dist FROM q CROSS JOIN documents d WHERE d.doc_id <> q.qid), "
            "r AS (SELECT qid, doc_id, dist, row_number() OVER "
            "(PARTITION BY qid ORDER BY dist, doc_id) AS rn FROM d) "
            "SELECT CAST(qid AS BIGINT) AS query_id, "
            "CAST(doc_id AS BIGINT) AS match_id, "
            "CAST(dist AS BIGINT) AS distance "
            "FROM r WHERE rn = 1 ORDER BY query_id"
        ),
        # CDC diff vs the planted-churn snapshot (FULL OUTER JOIN twin)
        "snapshot_changes": (
            "WITH newsnap AS ("
            "SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2' "
            "ELSE text END AS text FROM documents WHERE doc_id % 13 <> 0 "
            "UNION ALL "
            "SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20), "
            "oldsnap AS (SELECT doc_id, text FROM documents) "
            "SELECT CAST(COALESCE(o.doc_id, n.doc_id) AS BIGINT) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change "
            "FROM oldsnap o FULL OUTER JOIN newsnap n "
            "ON o.doc_id = n.doc_id "
            "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text "
            "ORDER BY doc_id"
        ),
        # share-of-total window in exact integer ppm (floor division)
        "nation_revenue_share": (
            "WITH rev AS (SELECT n.n_name AS nation, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_centicents "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name) "
            "SELECT nation, revenue_centicents, "
            "CAST(revenue_centicents * 1000000 // "
            "(SELECT sum(revenue_centicents) FROM rev) AS BIGINT) "
            "AS share_ppm FROM rev ORDER BY nation"
        ),
        # ROLLUP with GROUPING() as the explicit level marker
        "lang_source_rollup": (
            "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(grouping(lang) + grouping(source) AS BIGINT) AS level "
            "FROM documents GROUP BY ROLLUP(lang, source) "
            "ORDER BY level, lang, source"
        ),
        # filtered vector retrieval: predicate at the scan, then top-5
        "ann_filtered_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings "
            "ORDER BY vec_id LIMIT 4), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])) AS s "
            "FROM q CROSS JOIN embeddings e WHERE e.label = 3), "
            "ranked AS (SELECT query_id, vec_id, s, "
            "row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn "
            "FROM scored) "
            "SELECT query_id, vec_id, round(s, 6) AS score FROM ranked "
            "WHERE rn <= 5 ORDER BY query_id, vec_id"
        ),
        # interpolated quartiles from the histogram order stats
        "cont_quantiles_by_lang": (
            "SELECT lang, "
            "round(percentile_cont(0.25) WITHIN GROUP (ORDER BY n_chars), 6)"
            " AS p25, "
            "round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 6)"
            " AS p50, "
            "round(percentile_cont(0.75) WITHIN GROUP (ORDER BY n_chars), 6)"
            " AS p75 "
            "FROM documents GROUP BY lang ORDER BY lang"
        ),
        # distributed LAG: per-user gap stats; singletons pinned to 0/0
        "user_gap_stats": (
            "WITH g AS (SELECT user_id, date_diff('microsecond', "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), "
            "ts) AS gap FROM events) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap_us, "
            "CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_us "
            "FROM g GROUP BY user_id ORDER BY user_id"
        ),
        # full pretraining admission gate = conjunction of the gopher,
        # exact-dedup-winner and SemDeDup(k=1) twins over aligned tables
        "pretrain_gate_ids": (
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text, ' '), '\\s+')) AS tok FROM documents), "
            "tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
            "agg AS (SELECT doc_id, count(*) AS n_words, "
            "sum(length(tok)) AS sum_chars, "
            "sum(CASE WHEN regexp_matches(tok, '[A-Za-z]') THEN 1 ELSE 0 "
            "END) AS alpha_words, "
            "sum(CASE WHEN lower(tok) IN ('the','be','to','of','and',"
            "'that','have','with') THEN 1 ELSE 0 END) AS stop_hits "
            "FROM tok2 GROUP BY doc_id), "
            "j AS (SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words, "
            "COALESCE(a.sum_chars, 0) AS sum_chars, "
            "COALESCE(a.alpha_words, 0) AS alpha_words, "
            "COALESCE(a.stop_hits, 0) AS stop_hits, "
            "len(regexp_extract_all(trim(d.text, ' '), '#|\\.\\.\\.')) "
            "AS symbols FROM documents d "
            "LEFT JOIN agg a ON d.doc_id = a.doc_id), "
            "q AS (SELECT doc_id FROM j WHERE "
            "n_words >= 40 AND n_words <= 100000 "
            "AND 3 * n_words <= sum_chars AND sum_chars <= 10 * n_words "
            "AND 10 * symbols <= n_words AND 5 * alpha_words >= 4 * n_words "
            "AND stop_hits >= 2), "
            "w AS (SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY text), "
            "s AS (SELECT a.vec_id AS doc_id FROM embeddings a "
            "WHERE NOT EXISTS (SELECT 1 FROM embeddings b "
            "WHERE b.vec_id < a.vec_id AND "
            "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.4)) "
            "SELECT CAST(q.doc_id AS BIGINT) AS doc_id FROM q "
            "JOIN w USING (doc_id) JOIN s USING (doc_id) ORDER BY doc_id"
        ),
        # ExactSubstr self-dedup signal: per-doc distinct 6-grams shared
        # with >= 1 other doc; tokenization = string_split(text, ' ')
        # (the word_gram_fingerprints twin)
        "shared_gram_docs": (
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks "
            "FROM documents), "
            "g AS (SELECT doc_id, array_to_string("
            "toks[CAST(i AS BIGINT):CAST(i AS BIGINT)+5], ' ') AS gram "
            "FROM w, UNNEST(range(1, len(toks) - 4)) AS t(i)), "
            "d AS (SELECT DISTINCT doc_id, gram FROM g), "
            "shared AS (SELECT gram FROM d GROUP BY gram "
            "HAVING count(*) >= 2) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_shared FROM d "
            "WHERE gram IN (SELECT gram FROM shared) "
            "GROUP BY doc_id ORDER BY doc_id"
        ),
        # Efraimidis-Spirakis weighted sample: u from the Knuth mix (pure
        # BIGINT arithmetic), key ln(u)/w with the identical operand
        # grouping; scores compare at 6 decimals (canon), ranks separated
        # by >> 1e-6
        "weighted_doc_sample": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n_chars AS BIGINT) AS n_chars, "
            "ln((((doc_id + 0) % 2147483648) * 2654435761 % 4294967296 "
            "+ 1.0) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS es_score "
            "FROM documents "
            "ORDER BY es_score DESC, doc_id LIMIT 50"
        ),
        # windowed heavy hitter: MG per tumbling hour is exact at m=64
        # (5 event types); tie-break (count DESC, key ASC) mirrored
        "window_top_event": (
            "WITH c AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) "
            "AS window, event_type, count(*) AS n FROM events "
            'GROUP BY "window", event_type), '
            "r AS (SELECT *, row_number() OVER (PARTITION BY \"window\" "
            "ORDER BY n DESC, event_type) AS rn FROM c) "
            'SELECT "window", event_type, CAST(n AS BIGINT) AS n '
            'FROM r WHERE rn = 1 ORDER BY "window"'
        ),
        # Gopher rule bitmask: every threshold is an integer
        # cross-multiplication (3n<=chars<=10n etc.), so the CASE
        # decisions are engine-exact; token-free docs COALESCE to 0
        "gopher_rules": (
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex("
            "trim(text, ' '), '\\s+')) AS tok FROM documents), "
            "tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
            "agg AS (SELECT doc_id, count(*) AS n_words, "
            "sum(length(tok)) AS sum_chars, "
            "sum(CASE WHEN regexp_matches(tok, '[A-Za-z]') THEN 1 ELSE 0 "
            "END) AS alpha_words, "
            "sum(CASE WHEN lower(tok) IN ('the','be','to','of','and',"
            "'that','have','with') THEN 1 ELSE 0 END) AS stop_hits "
            "FROM tok2 GROUP BY doc_id), "
            "j AS (SELECT d.doc_id, COALESCE(a.n_words, 0) AS n_words, "
            "COALESCE(a.sum_chars, 0) AS sum_chars, "
            "COALESCE(a.alpha_words, 0) AS alpha_words, "
            "COALESCE(a.stop_hits, 0) AS stop_hits, "
            "len(regexp_extract_all(trim(d.text, ' '), '#|\\.\\.\\.')) "
            "AS symbols FROM documents d "
            "LEFT JOIN agg a ON d.doc_id = a.doc_id), "
            "b AS (SELECT doc_id, n_words, "
            "(CASE WHEN n_words >= 40 AND n_words <= 100000 THEN 1 ELSE 0 END) "
            "+ (CASE WHEN 3 * n_words <= sum_chars AND sum_chars <= "
            "10 * n_words THEN 2 ELSE 0 END) "
            "+ (CASE WHEN 10 * symbols <= n_words THEN 4 ELSE 0 END) "
            "+ (CASE WHEN 5 * alpha_words >= 4 * n_words THEN 8 ELSE 0 END) "
            "+ (CASE WHEN stop_hits >= 2 THEN 16 ELSE 0 END) AS rb FROM j) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(n_words AS BIGINT) AS n_words, "
            "CAST(rb AS BIGINT) AS rule_bits, rb = 31 AS passes "
            "FROM b ORDER BY doc_id"
        ),
        # CCNet-style unigram-LM scoring: top-16 vocab by (tf DESC, tok)
        # cuts inside the corpus's 31-token vocabulary, so in-vocab rows
        # take ln(tf/N) and OOV rows the Lidstone half-count floor
        # ln(0.5/N); per-occurrence contributions are floored to integer
        # 1e-8 units with the IDENTICAL operand grouping as
        # stages/text.unigram_logprob_scores, making the per-doc sum
        # order-free and hash-exact.
        "unigram_quality": (
            "WITH toks AS (SELECT doc_id, unnest(string_split_regex("
            "lower(trim(text, ' ')), '\\s+')) AS tok FROM documents), "
            "tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
            "tf AS (SELECT tok, count(*) AS tf FROM tok2 GROUP BY tok), "
            "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok2), "
            "vocab AS (SELECT tok, tf FROM tf "
            "ORDER BY tf DESC, tok LIMIT 16), "
            "scored AS (SELECT t.doc_id, CASE WHEN v.tok IS NOT NULL "
            "THEN CAST(floor(ln(CAST(v.tf AS DOUBLE) / n.n) "
            "* 100000000.0 + 0.5) AS BIGINT) "
            "ELSE CAST(floor(ln(0.5 / n.n) * 100000000.0 + 0.5) AS BIGINT) "
            "END AS occ FROM tok2 t "
            "LEFT JOIN vocab v ON t.tok = v.tok CROSS JOIN n) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(occ) AS BIGINT) AS logprob_micro "
            "FROM scored GROUP BY doc_id ORDER BY doc_id"
        ),
        # per-group rank transform: the integer ingredients of
        # rank/percent_rank/cume_dist (strictly-less, equal, group size)
        "value_rank_by_type": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events) "
            "SELECT CAST(event_id AS BIGINT) AS event_id, "
            "CAST(rank() OVER w - 1 AS BIGINT) AS n_lt, "
            "CAST(count(*) OVER (PARTITION BY event_type, cents) AS BIGINT) "
            "AS n_eq, "
            "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) "
            "AS n_group FROM c "
            "WINDOW w AS (PARTITION BY event_type ORDER BY cents) "
            "ORDER BY event_id"
        ),
        # deterministic contrastive negatives: fixed permutation strides
        # (always a bijection), exact float64 cosine rounded half-away to 6
        "negative_pairs": (
            "WITH nn AS (SELECT count(*) AS n FROM embeddings), "
            "s AS (SELECT unnest([n // 3, n // 2]) AS stride FROM nn), "
            "p AS (SELECT a.vec_id, s.stride, "
            "(a.vec_id + s.stride) % nn.n AS neg_id, a.embedding AS ea "
            "FROM embeddings a CROSS JOIN s CROSS JOIN nn) "
            "SELECT CAST(p.vec_id AS BIGINT) AS vec_id, "
            "CAST(p.stride AS BIGINT) AS stride, "
            "CAST(p.neg_id AS BIGINT) AS neg_id, "
            # zero-norm pinned to 0.0 on BOTH sides (the Ray kernel's
            # den==0 guard), so a zero vector can't flip the row red
            "round(CASE WHEN list_aggregate(list_transform("
            "CAST(p.ea AS DOUBLE[]), x -> x*x), 'sum') * "
            "list_aggregate(list_transform(CAST(b.embedding AS DOUBLE[]),"
            " x -> x*x), 'sum') = 0 THEN 0.0 "
            "ELSE list_cosine_similarity(CAST(p.ea AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) END, 6) AS score "
            "FROM p JOIN embeddings b ON b.vec_id = p.neg_id "
            "ORDER BY vec_id, stride"
        ),
        # grouped top-k: (count DESC, source ASC) rank per lang
        "top3_sources_per_lang": (
            "SELECT lang, CAST(rn AS BIGINT) AS rank, source, "
            "CAST(n AS BIGINT) AS n FROM ("
            "SELECT lang, source, count(*) AS n, row_number() OVER "
            "(PARTITION BY lang ORDER BY count(*) DESC, source) AS rn "
            "FROM documents GROUP BY lang, source) "
            "WHERE rn <= 3 ORDER BY lang, rank"
        ),
        # robust per-group stats: median / MAD / 3-MAD outlier count over
        # integer cents (percentile_disc on both engines)
        "value_mad_by_type": (
            "WITH c AS (SELECT event_type, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT event_type, percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY cents) AS med FROM c GROUP BY event_type), "
            "d AS (SELECT c.event_type, abs(c.cents - m.med) AS dev, m.med "
            "FROM c JOIN m USING (event_type)), "
            "md AS (SELECT event_type, percentile_disc(0.5) WITHIN GROUP "
            "(ORDER BY dev) AS mad FROM d GROUP BY event_type) "
            "SELECT d.event_type, CAST(d.med AS BIGINT) AS med_cents, "
            "CAST(md.mad AS BIGINT) AS mad_cents, "
            "CAST(sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_outliers "
            "FROM d JOIN md USING (event_type) "
            "GROUP BY d.event_type, d.med, md.mad ORDER BY event_type"
        ),
        # leakage-safe split: fold decided by the dup-cluster REP, so
        # exact duplicates never straddle train/val/test
        "leakage_safe_split": (
            "WITH c AS (SELECT doc_id, "
            "min(doc_id) OVER (PARTITION BY text) AS cluster FROM documents) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(cluster AS BIGINT) AS cluster, "
            "CASE WHEN cluster % 10 < 8 THEN 'train' "
            "WHEN cluster % 10 = 8 THEN 'val' ELSE 'test' END AS split "
            "FROM c ORDER BY doc_id"
        ),
        # equi-width histogram: integer bin math lands boundary values
        # identically in both engines
        "length_histogram": (
            "WITH mm AS (SELECT min(n_chars) AS mn, max(n_chars) AS mx "
            "FROM documents) "
            "SELECT lang, "
            "CAST((n_chars - mm.mn) * 10 // (mm.mx - mm.mn + 1) AS BIGINT) "
            "AS bin, CAST(count(*) AS BIGINT) AS n "
            "FROM documents CROSS JOIN mm "
            "GROUP BY lang, bin ORDER BY lang, bin"
        ),
        # PMI collocations: ln(P(ab)) - ln(P(a)) - ln(P(b)) in integer
        # 1e-8 nats (three glibc ln calls, fixed operand grouping), tf >= 5
        # floor, deterministic (pmi DESC, gram) top-20
        "pmi_top_bigrams": (
            "WITH toks AS (SELECT unnest(string_split_regex("
            "lower(trim(text, ' ')), '\\s+')) AS tok FROM documents), "
            "tok2 AS (SELECT tok FROM toks WHERE tok <> ''), "
            "l AS (SELECT doc_id, list_filter(string_split_regex("
            "lower(trim(text, ' ')), '\\s+'), x -> x <> '') AS toks "
            "FROM documents), "
            "idx AS (SELECT doc_id, toks, "
            "unnest(range(1, len(toks))) AS i FROM l), "
            "grams AS (SELECT toks[i] || ' ' || toks[i+1] AS gram FROM idx), "
            "tfu AS (SELECT tok, count(*) AS tf FROM tok2 GROUP BY tok), "
            "nu AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok2), "
            "tfb AS (SELECT gram, count(*) AS tf FROM grams "
            "GROUP BY gram HAVING count(*) >= 5), "
            "nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM grams), "
            "x AS (SELECT b.gram, b.tf AS tfb, a.tf AS tfa, c.tf AS tfc "
            "FROM tfb b "
            "JOIN tfu a ON a.tok = split_part(b.gram, ' ', 1) "
            "JOIN tfu c ON c.tok = split_part(b.gram, ' ', 2)) "
            "SELECT gram, CAST(tfb AS BIGINT) AS tf, "
            "CAST(floor((ln(CAST(tfb AS DOUBLE) / nb.n) "
            "- ln(CAST(tfa AS DOUBLE) / nu.n) "
            "- ln(CAST(tfc AS DOUBLE) / nu.n)) * 100000000.0 + 0.5) "
            "AS BIGINT) AS pmi_micro "
            "FROM x CROSS JOIN nb CROSS JOIN nu "
            "ORDER BY pmi_micro DESC, gram LIMIT 20"
        ),
        # DSIR importance weights: per-doc sum over word bigrams of
        # lp_target - lp_raw, each a top-64 LM in integer 1e-8 nats with
        # the half-count OOV floor (the unigram_quality conventions twice)
        "dsir_scores": (
            "WITH l AS (SELECT doc_id, lang, list_filter("
            "string_split_regex(lower(trim(text, ' ')), '\\s+'), "
            "x -> x <> '') AS toks FROM documents), "
            "idx AS (SELECT doc_id, lang, toks, "
            "unnest(range(1, len(toks))) AS i FROM l), "
            "grams AS (SELECT doc_id, lang, "
            "toks[i] || ' ' || toks[i+1] AS gram FROM idx), "
            "qtf AS (SELECT gram, count(*) AS tf FROM grams GROUP BY gram), "
            "ttf AS (SELECT gram, count(*) AS tf FROM grams "
            "WHERE lang = 'en' GROUP BY gram), "
            "nq AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM grams), "
            "nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM grams "
            "WHERE lang = 'en'), "
            "vq AS (SELECT gram, tf FROM qtf ORDER BY tf DESC, gram "
            "LIMIT 64), "
            "vt AS (SELECT gram, tf FROM ttf ORDER BY tf DESC, gram "
            "LIMIT 64), "
            "scored AS (SELECT g.doc_id, "
            "CASE WHEN t.tok IS NOT NULL THEN "
            "CAST(floor(ln(CAST(t.tf AS DOUBLE) / nt.n) "
            "* 100000000.0 + 0.5) AS BIGINT) "
            "ELSE CAST(floor(ln(0.5 / nt.n) * 100000000.0 + 0.5) AS BIGINT) "
            "END - CASE WHEN q.tok IS NOT NULL THEN "
            "CAST(floor(ln(CAST(q.tf AS DOUBLE) / nq.n) "
            "* 100000000.0 + 0.5) AS BIGINT) "
            "ELSE CAST(floor(ln(0.5 / nq.n) * 100000000.0 + 0.5) AS BIGINT) "
            "END AS occ FROM grams g "
            "LEFT JOIN (SELECT gram AS tok, tf FROM vt) t ON g.gram = t.tok "
            "LEFT JOIN (SELECT gram AS tok, tf FROM vq) q ON g.gram = q.tok "
            "CROSS JOIN nt CROSS JOIN nq) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_grams, "
            "CAST(sum(occ) AS BIGINT) AS weight_micro "
            "FROM scored GROUP BY doc_id ORDER BY doc_id"
        ),
        # exact key-skew profile: F2 = self-join size = AMS second moment,
        # the salting-decision statistic, per shuffle-deciding key column
        "key_skew_profile": (
            "WITH "
            "c1 AS (SELECT count(*) AS c FROM documents "
            "WHERE lang IS NOT NULL GROUP BY lang), "
            "c2 AS (SELECT count(*) AS c FROM documents "
            "WHERE source IS NOT NULL GROUP BY source), "
            "c3 AS (SELECT count(*) AS c FROM events "
            "WHERE event_type IS NOT NULL GROUP BY event_type), "
            "c4 AS (SELECT count(*) AS c FROM events "
            "WHERE user_id IS NOT NULL GROUP BY user_id), "
            "c5 AS (SELECT count(*) AS c FROM lineitem "
            "WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey) "
            "SELECT 'documents.lang' AS col, CAST(sum(c) AS BIGINT) AS n, "
            "CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(sum(c*c) AS BIGINT) AS f2, "
            "CAST(max(c) AS BIGINT) AS max_count FROM c1 "
            "UNION ALL SELECT 'documents.source', CAST(sum(c) AS BIGINT), "
            "CAST(count(*) AS BIGINT), CAST(sum(c*c) AS BIGINT), "
            "CAST(max(c) AS BIGINT) FROM c2 "
            "UNION ALL SELECT 'events.event_type', CAST(sum(c) AS BIGINT), "
            "CAST(count(*) AS BIGINT), CAST(sum(c*c) AS BIGINT), "
            "CAST(max(c) AS BIGINT) FROM c3 "
            "UNION ALL SELECT 'events.user_id', CAST(sum(c) AS BIGINT), "
            "CAST(count(*) AS BIGINT), CAST(sum(c*c) AS BIGINT), "
            "CAST(max(c) AS BIGINT) FROM c4 "
            "UNION ALL SELECT 'lineitem.l_orderkey', CAST(sum(c) AS BIGINT), "
            "CAST(count(*) AS BIGINT), CAST(sum(c*c) AS BIGINT), "
            "CAST(max(c) AS BIGINT) FROM c5 "
            "ORDER BY col"
        ),
        # per-key cumulative window: value rides as integer cents
        # (half-away rounding, the repo money convention) so the running
        # sum is addition-order-free and exact at every prefix
        "user_running_value": (
            "SELECT user_id, event_id, "
            "CAST(count(*) OVER w AS BIGINT) AS cum_n, "
            "CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER w "
            "AS BIGINT) AS cum_cents FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) ORDER BY user_id, event_id"
        ),
        "hourly_active_users": (
            "SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS window, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            'FROM events GROUP BY "window" ORDER BY "window"'
        ),
        "exact_quantiles_by_lang": (
            "SELECT lang, "
            "CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p25, "
            "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p50, "
            "CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p75, "
            "CAST(max(n_chars) AS BIGINT) AS p100 "
            "FROM documents GROUP BY lang"
        ),
        "user_sessions": (
            "WITH o AS ("
            "  SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 "
            "    THEN 1 ELSE 0 END AS new_sess"
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts_us,"
            "    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id "
            "      ROWS UNBOUNDED PRECEDING) AS session_id"
            "  FROM o"
            ") SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us "
            "FROM s GROUP BY user_id, session_id"
        ),
        "orders_semi_join": (
            "SELECT l_orderkey, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_totalprice > 150000) "
            "GROUP BY l_orderkey"
        ),
        "lang_sources_matrix": (
            "SELECT lang, CAST(count(DISTINCT source) AS BIGINT) AS n_sources "
            "FROM documents GROUP BY lang"
        ),
        # exact char-3-gram Jaccard self-join; the CASE edges mirror
        # char_shingles: len<n -> whole-text singleton set, empty -> empty
        # set (two empties: 1.0). i/(na+nb-i) is the same IEEE expression
        # the Ray verifier evaluates, so the >= 0.8 decision is identical.
        "ngram_jaccard_pairs": (
            "WITH g AS (SELECT doc_id, "
            "CASE WHEN len(text) = 0 THEN CAST([] AS VARCHAR[]) "
            "WHEN len(text) < 3 THEN [text] "
            "ELSE list_distinct([substr(text, CAST(i AS INT), 3) "
            "FOR i IN range(1, len(text)-1)]) END AS grams FROM documents), "
            "p AS (SELECT a.doc_id AS la, b.doc_id AS rb, "
            "len(list_intersect(a.grams, b.grams)) AS i, "
            "len(a.grams) AS na, len(b.grams) AS nb "
            "FROM g a JOIN g b ON a.doc_id < b.doc_id), "
            "s AS (SELECT la, rb, CASE WHEN na + nb = 0 THEN 1.0 "
            "ELSE CAST(i AS DOUBLE) / (na + nb - i) END AS j FROM p) "
            "SELECT CAST(la AS BIGINT) AS left_id, CAST(rb AS BIGINT) AS right_id, "
            "round(j, 6) AS jaccard FROM s WHERE j >= 0.8 "
            "ORDER BY left_id, right_id"
        ),
        # containment twin: same gram CTE, denominator least(na, nb);
        # one-empty pairs are 0.0 (empty sets share nothing), two-empties
        # 1.0 (the clique convention shared with the jaccard twin)
        "ngram_containment_pairs": (
            "WITH g AS (SELECT doc_id, "
            "CASE WHEN len(text) = 0 THEN CAST([] AS VARCHAR[]) "
            "WHEN len(text) < 3 THEN [text] "
            "ELSE list_distinct([substr(text, CAST(i AS INT), 3) "
            "FOR i IN range(1, len(text)-1)]) END AS grams FROM documents), "
            "p AS (SELECT a.doc_id AS la, b.doc_id AS rb, "
            "len(list_intersect(a.grams, b.grams)) AS i, "
            "len(a.grams) AS na, len(b.grams) AS nb "
            "FROM g a JOIN g b ON a.doc_id < b.doc_id), "
            "s AS (SELECT la, rb, CASE WHEN na + nb = 0 THEN 1.0 "
            "WHEN least(na, nb) = 0 THEN 0.0 "
            "ELSE CAST(i AS DOUBLE) / least(na, nb) END AS c FROM p) "
            "SELECT CAST(la AS BIGINT) AS left_id, CAST(rb AS BIGINT) AS right_id, "
            "round(c, 6) AS containment FROM s WHERE c >= 0.95 "
            "ORDER BY left_id, right_id"
        ),
        "exact_dup_pairs": (
            "SELECT CAST(a.doc_id AS BIGINT) AS left_id, "
            "CAST(b.doc_id AS BIGINT) AS right_id "
            "FROM documents a JOIN documents b "
            "ON a.text = b.text AND a.doc_id < b.doc_id"
        ),
        # degenerate-regime oracles: at threshold=1.0 / max_hamming=0 over
        # the planted-dup corpus (documents UNION doc_id<100 shifted 1e6)
        # the LSH tails + exact verify equal the text-equality self-join
        "minhash_neardup_exact": _PLANTED_DUP_PAIRS_SQL,
        "simhash_neardup_exact": _PLANTED_DUP_PAIRS_SQL,
        "embedding_neardup_planted": (
            "WITH corpus AS ("
            "SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings "
            "UNION ALL "
            "SELECT CAST(vec_id + 1000000 AS BIGINT), embedding "
            "FROM embeddings WHERE vec_id < 50) "
            "SELECT a.vec_id AS left_id, b.vec_id AS right_id "
            "FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.99 "
            "ORDER BY left_id, right_id"
        ),
        "exact_dup_clusters": (
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            "CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS cluster "
            "FROM documents"
        ),
        # per-lang quota mixing: quota = 30 * (1 + len(lang) % 3), smallest
        # doc_id first — the row_number twin of stages/sampling.take_per_group
        "corpus_mix_quota": (
            "SELECT lang, CAST(doc_id AS BIGINT) AS doc_id FROM ("
            "SELECT lang, doc_id, row_number() OVER "
            "(PARTITION BY lang ORDER BY doc_id) AS rn FROM documents) "
            "WHERE rn <= 30 * (1 + length(lang) % 3) "
            "ORDER BY lang, doc_id"
        ),
        # mod-bucket split: 0.8/0.1/0.1 over 10 buckets quantizes to cut
        # list [8, 9, 10] (stages/sampling.split_cuts)
        "corpus_split_mod_exact": (
            "SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' "
            "WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split, "
            "lang, CAST(count(*) AS BIGINT) AS n FROM documents "
            "GROUP BY split, lang ORDER BY split, lang"
        ),
        "token_df_top": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text, ' ')), '\\s+')) AS token "
            "FROM documents) "
            "SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, "
            "CAST(count(*) AS BIGINT) AS tf FROM toks WHERE token <> '' "
            "GROUP BY token ORDER BY df DESC, token LIMIT 20"
        ),
        # CMS in its provably-exact regime (collision_free certificate over
        # the key universe) == plain GROUP BY counts
        "cms_event_type_exact": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        # rarest-token keyword extraction: per-doc argmin of global document
        # frequency (tie: token; DuckDB binary collation == UTF-8 byte min)
        "doc_top_term": (
            "WITH raw AS (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text, ' ')), '\\s+')) AS token "
            "FROM documents), "
            "toks AS (SELECT DISTINCT doc_id, token FROM raw WHERE token <> ''), "
            "df AS (SELECT token, count(*) AS df FROM toks GROUP BY token), "
            "j AS (SELECT t.doc_id, t.token, d.df FROM toks t "
            "JOIN df d USING (token)), "
            "r AS (SELECT doc_id, token, df, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY df, token) AS rn FROM j) "
            "SELECT CAST(doc_id AS BIGINT) AS doc_id, token AS rarest_token, "
            "CAST(df AS BIGINT) AS df FROM r WHERE rn = 1 ORDER BY doc_id"
        ),
        # grouped KLL in its exact regime: lower order statistic at rank
        # ceil(q * n_lang) per lang (see kll_quantiles_exact)
        "kll_by_lang_exact": (
            "WITH s AS (SELECT lang, n_chars, "
            "row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT s.lang, t.label AS q, CAST(s.n_chars AS DOUBLE) AS value "
            "FROM (VALUES ('p25', 0.25), ('p50', 0.50), ('p75', 0.75)) "
            "AS t(label, qq) "
            "JOIN s ON s.rn = GREATEST(1, CAST(ceil(t.qq * s.n) AS BIGINT)) "
            "ORDER BY lang, q"
        ),
        "pagerank_user_types": _pagerank_sql(3),
        # Morton interleave via the SAME mask/shift spread expressions the
        # engine evaluates (functions/zorder.py) — non-negative 31-bit
        # coords keep every intermediate inside BIGINT in both engines
        "events_zorder_head": _zorder_head_sql(),
        # RFM segmentation: per-customer (recency days, order count, cents)
        # cut into quartile segments by the same percentile_disc bucket rule
        # as events_range_layout (seg = 1 + #{i: v > b_i}); integer day and
        # cent math keeps both engines exact
        "customer_rfm_segments": (
            "WITH cust AS (SELECT o_custkey, "
            "max(epoch_us(o_orderdate) // 86400000000) AS last_day, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders GROUP BY o_custkey), "
            "m AS (SELECT (SELECT max(last_day) FROM cust) - last_day AS recency, "
            "n AS freq, cents AS monetary FROM cust), "
            "b AS (SELECT "
            + ", ".join(
                f"percentile_disc({i}.0/4) WITHIN GROUP (ORDER BY {c}) AS {c[0]}{i}"
                for c in ("recency", "freq", "monetary")
                for i in range(1, 4)
            )
            + " FROM m), tagged AS (SELECT "
            + ", ".join(
                "(1 + "
                + " + ".join(
                    f"(CASE WHEN {c} > {c[0]}{i} THEN 1 ELSE 0 END)"
                    for i in range(1, 4)
                )
                + f") AS {c[0]}_seg"
                for c in ("recency", "freq", "monetary")
            )
            + ", monetary FROM m, b) "
            "SELECT CAST(r_seg AS BIGINT) AS r_seg, "
            "CAST(f_seg AS BIGINT) AS f_seg, CAST(m_seg AS BIGINT) AS m_seg, "
            "CAST(count(*) AS BIGINT) AS n_customers, "
            "CAST(sum(monetary) AS BIGINT) AS sum_cents FROM tagged "
            "GROUP BY r_seg, f_seg, m_seg ORDER BY r_seg, f_seg, m_seg"
        ),
        # quantile range layout (stages/layout.py): SQL-standard
        # percentile_disc boundaries + the identical bucket(v) = #{i: v > b_i}
        # rule; i/8 fractions are binary-exact so both engines pick the same
        # boundary rows
        "events_range_layout": (
            "WITH cents AS (SELECT CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events), b AS (SELECT "
            + ", ".join(
                f"percentile_disc({i}.0/8) WITHIN GROUP (ORDER BY c) AS b{i}"
                for i in range(1, 8)
            )
            + " FROM cents), tagged AS (SELECT c, ("
            + " + ".join(
                f"(CASE WHEN c > b{i} THEN 1 ELSE 0 END)" for i in range(1, 8)
            )
            + ") AS bucket FROM cents, b) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n, CAST(min(c) AS BIGINT) AS min_c, "
            "CAST(max(c) AS BIGINT) AS max_c FROM tagged "
            "GROUP BY bucket ORDER BY bucket"
        ),
        # bipartite degree distribution: users per distinct-type count
        "user_type_degree_histogram": (
            "SELECT CAST(d AS BIGINT) AS degree, "
            "CAST(count(*) AS BIGINT) AS n_users FROM ("
            "SELECT user_id, count(DISTINCT event_type) AS d "
            "FROM events GROUP BY user_id) GROUP BY d ORDER BY degree"
        ),
    }
