"""SQL front-end: the declared oracle SQL (written in the Spark-SQL ∩ DuckDB
dialect) must run verbatim through spark.sql() over the registered views and
produce the same rows as the DataFrame plans. This proves a SQL-only user of
the engine gets the full declared surface."""

import pytest

import __spark_entry__ as entry_mod
from eurostat_energy_etl_pipeline_spark.catalog import register_views

SF_DIR = "/root/testdata/sf0.001"

# Queries whose oracle SQL uses duckdb-only idioms are excluded; everything
# else — the whole relational core, insights pipeline, dashboards, text
# stats — must run on both engines unchanged.
DUCKDB_ONLY = {
    "q21_word_count",        # string_split/unnest idiom differs by contract
    "q_events_asof_join",    # duckdb-native ASOF JOIN
    "q_events_sessionize",   # duckdb-specific window idiom
    "q_events_tumbling",     # duckdb time_bucket/epoch
    "q_events_sliding",      # duckdb generate_series/time_bucket
    "q34_media_meta",        # duckdb encode()
    "q39_frame_sample",      # duckdb encode()
    "q_dq_probes",           # duckdb row-value count(DISTINCT (a,b,..))
    "q22_embedding_topk",    # duckdb unnest-with-ordinality idiom
    "q23_dedup_hash_groups", # duckdb sha256()
    "q24_ngram_jaccard",     # duckdb list_transform/list_intersect
    "q45_dedup_clusters",    # duckdb list_* (same shingle CTE as q24)
    "q27_fingerprint",       # duckdb regexp_replace(..., 'g') flag
    "q28_lang_id",           # duckdb string_split_regex/list_*
    "q29_token_stats",       # duckdb string_split_regex
    "q49_sequence_pack",     # duckdb string_split_regex (same token idiom)
    "q30_quality_buckets",   # duckdb string_split_regex/list_*
    "q31_embedding_neardup", # duckdb list_* vector arithmetic
    "q32_lsh_ann",           # duckdb list_dot_product/bit_count LSH replay
    "q37_ivf_ann",           # duckdb unrolled-CTE IVF trainer replay
    "q160_ivf_merge_probe",  # same CTE ladder over the post-merge corpus
    "q80_ivf_sq8_ann",       # same + quantize/dequantize list arithmetic
    "q88_knn_join_lsh",      # duckdb list_* bucket replay + popcount join
    "q141_substring_dedup",  # duckdb list slicing + generate_series windows
    "q156_substring_cut",    # duckdb list slicing + generate_series windows
    "q157_substring_cut_audit",  # same CTE ladder as q156
    "q142_locf_gap_fill",    # duckdb generate_series date spine + IGNORE NULLS
    "q144_winnowing",        # duckdb list slicing + generate_series windows
    "q145_repetition_filters",  # duckdb list slicing + generate_series
    "q148_rank_fusion",      # duckdb list_filter/string_split_regex score
    "q149_new_vs_returning", # duckdb strftime day keys
    "q150_classifier_eval",  # duckdb string_split_regex lang scorer
    "q153_decayed_leaderboard",  # duckdb date-minus-date int + << operator
    "q154_column_profile",   # duckdb strftime timestamp rendering
    "q50_doc_chunks",        # duckdb list slicing + lateral generate_series
    "q51_pii_scan",          # duckdb regexp_extract_all/len + 'g' flag
    "q52_decontaminate",     # duckdb string_split_regex/list_transform
    "q53_quality_deciles",   # duckdb string_split_regex/list_*
    "q54_token_percentiles", # duckdb quantile_cont (Spark: percentile)
    "q55_label_cohesion",    # duckdb list_zip + generate_series-as-list
    "q58_repetition_ratio",  # duckdb string_split_regex/list_*
    "q59_cross_source_overlap",  # duckdb string_split_regex slicing
    "q61_canonical_docs",    # duckdb string_split_regex/list_* + correlated count
    "q62_json_props",        # duckdb json_extract_string (Spark: get_json_object)
    "q65_retention",         # duckdb date_diff/strftime (Spark: datediff/date_format)
    "q66_rare_word_filter",  # duckdb string_split_regex/unnest
    "q67_cluster_canonical", # duckdb list_* (same shingle CTE as q45)
    "q25_minhash_lsh_pairs", # duckdb list_* (same shingle CTE as q24)
    "q26_simhash_pairs",     # duckdb hex-cast/xor + string_split_regex
    "q33_multimodal_features",  # duckdb encode()
    "q158_media_signatures",  # duckdb hex/encode + generate_series bytes
    "q159_media_dedup",       # same sig ladder + xor/bit_count/<< pairing
    "q161_media_quality",     # duckdb hex bytes + entropy() aggregate
    "q163_media_dedup_apply",  # sig ladder + EXISTS keep-first fates
    "q186_media_clusters",    # sig ladder + WITH RECURSIVE closure
    "q187_leakage_safe_split",  # duckdb list_* shingle CTE (q45 idiom)
    "q188_decontamination_profile",  # duckdb list_* (q52 gram idiom)
    "q190_zonemap_pruning",  # duckdb // integer division (Spark: div)
    "q36_tfidf_search",      # duckdb list_filter/string_split_regex
    "q162_tfidf_keywords",   # same tf-idf CTE ladder, per-doc ranking
    "q63_incremental_dedup", # duckdb list_* (same shingle CTE as q24)
    "q75_bm25_search",       # duckdb list_filter/string_split_regex
    "q164_postings_merge_probe",  # same BM25 ladder, effective corpus
    "q78_vocab_topk",        # duckdb list_filter/string_split_regex
    "q79_quantize_audit",    # duckdb list_transform/list_aggregate
    "q81_rolling_dau",       # duckdb strftime (Spark: date_format)
    "q82_bigram_lm_score",   # duckdb string_split_regex/list_* + split_part
    "q83_crossmodal_audit",  # duckdb list_transform/list_aggregate
    "q85_median_bridge",     # duckdb quantile_cont (Spark: percentile)
    "q87_knn_join_exact",    # duckdb list_cosine_similarity
    "q97_semantic_dedup",    # duckdb list_* vector arithmetic (q91 idiom)
    "q98_bpe_encode",        # duckdb string_split_regex + string_split
    "q_stream_tumbling",     # duckdb time_bucket/epoch (same as q_events_tumbling)
    "q_stream_sessionize",   # duckdb epoch/WINDOW idiom (same as q_events_sessionize)
    "q100_weighted_sample",  # duckdb CAST('0x..') hex parse (Spark: conv)
    "q101_state_history",    # duckdb epoch/WINDOW idiom (same as q_events_sessionize)
    "q102_heldout_lm",       # duckdb string_split_regex/list_* (same as q82)
    "q103_drift_psi",        # duckdb epoch/quantile_cont-list (Spark: percentile array)
    "q89_bpe_pair_stats",    # duckdb string_split_regex/list_transform
    "q90_trailing_burst",    # duckdb epoch() (Spark: cast ts to long)
    "q91_kmeans_update",     # duckdb list_sum/generate_series table fn
    "q92_dup_span_coverage", # duckdb string_split_regex/struct-literal lambda
    "q93_bpe_train",         # duckdb string_split/list_transform CTE ladder
    "q94_char_entropy",      # duckdb entropy() aggregate + unnest
    "q96_vocab_coverage",    # duckdb string_split_regex + VALUES lateral
    "q107_prefix_jaccard_join",  # duckdb list_* (same shingle CTE as q24)
    "q110_dedup_apply",      # duckdb list_* (same shingle CTE as q45)
    "q111_index_maintenance",  # duckdb list_* (same shingle CTE as q24)
    "q112_keyword_extract",  # duckdb list_filter/string_split_regex (q36 idiom)
    "q113_cms_audit",        # duckdb CAST('0x..') hex parse (Spark: conv)
    "q115_pipeline",         # duckdb list_*/'g' flag (q61 quality idiom)
    "q116_kmv_audit",        # duckdb CAST('0x..') hex parse (Spark: conv)
    "q118_path_mining",      # duckdb epoch() + ordered string_agg
    "q119_quantile_normalize",  # duckdb list_*/'g' flag (q61 quality idiom)
    "q_stream_screen",       # duckdb list_* (same shingle CTE as q63)
    "q122_pmi_collocations", # duckdb string_split_regex/list_* + string_split[]
    "q124_interarrival_stats",  # duckdb epoch_us/quantile_cont (Spark: unix_micros/percentile)
    "q125_novelty_rate",     # duckdb list_* (same shingle CTE as q24)
    "q126_centroid_similarity",  # duckdb parallel unnest + generate_series zip
    "q127_pca_power",        # duckdb flatten/list_transform gramian CTE
    "q128_kmv_set_ops",      # duckdb CAST('0x..') hex parse (same as q116)
    "q129_mad_outliers",     # duckdb quantile_cont (Spark: percentile)
    "q_stream_sliding",      # duckdb time_bucket/epoch (same as q_events_sliding)
    "q134_twap",             # duckdb epoch_us (Spark: unix_micros)
    "q136_hll_audit",        # duckdb CAST('0x..') hex parse + bin()/instr
    "q137_truncation_audit", # duckdb list_* vector arithmetic + VALUES lateral
    "q138_bloom_join",       # duckdb CAST('0x..') hex parse + // int division
    "q_stream_cms",          # duckdb CAST('0x..') hex parse (q113 grid)
    "q139_table_checksum",   # duckdb CAST('0x..') hex parse (Spark: conv)
    "q165_cusum_changepoint",  # duckdb strftime day keys (Spark: date_format)
    "q166_seasonal_decompose",  # duckdb strftime/isodow
    "q167_survival_km",      # duckdb date-minus-date int (Spark: datediff)
    "q170_phrase_search",    # duckdb string_split_regex/generate_subscripts
    "q171_text_normalize",   # duckdb regexp_replace 'g' flag + len()
    "q174_pii_redact",       # duckdb 'g' flag + ordered string_agg/len
    "q175_hll_rolling",      # duckdb generate_series dates + '0x' hex/bin()
    "q176_peak_concurrency", # duckdb epoch() + // int division
    "q177_activity_bitmaps", # duckdb << >> bit operators on bigint
    "q_stream_hll",          # duckdb '0x' hex parse + bin()/instr (q136 grid)
    "q178_scd2_merge",       # duckdb strftime + date - INTERVAL arithmetic
    "q_stream_scd2",         # duckdb strftime + date - INTERVAL (q178 twin)
    "q180_ohlc_resample",    # duckdb time_bucket/epoch (q_events_tumbling idiom)
    "q183_budget_selection", # duckdb string_split_regex/list_* token idiom
    "q184_multi_touch",      # duckdb strftime + ts - INTERVAL arithmetic
    "q185_curation_funnel",  # duckdb list_*/string_split_regex/lateral unnest
    "q192_incremental_funnel",  # q185 idioms + // int division + NOT IN CTE
    "q193_media_funnel",     # duckdb entropy()/hex ladder + WITH RECURSIVE
    "q194_source_containment",  # duckdb list_*/string_split_regex shingles
    "q195_incremental_media",   # q193 idioms + // int division
    "q196_multitick_funnel",    # q192's oracle verbatim (same idioms)
    "q197_deletion_fold",       # q185 idioms + FULL JOIN cert diff
    "q198_incremental_containment",  # q194's oracle verbatim
    "q199_multitick_media",     # q195's oracle verbatim (same idioms)
    "q200_lifecycle_fold",      # q197's oracle verbatim (same idioms)
}


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_views(spark, SF_DIR)


def sql_cases():
    return sorted(set(entry_mod.oracle_sql()) - DUCKDB_ONLY)


@pytest.mark.parametrize("name", sql_cases())
def test_oracle_sql_runs_on_spark(spark, name):
    oracle = entry_mod.oracle_sql()[name]
    got_sql = spark.sql(oracle).toPandas()
    got_df = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    assert list(got_sql.columns) == list(got_df.columns)
    assert len(got_sql) == len(got_df)
    import pandas as pd

    # Canonicalize row order (the driver's hash compare is
    # order-insensitive, and corpus-grain pair lists are deliberately
    # unsorted — q107/q114); value equality is what the gate pins.
    cols = list(got_sql.columns)
    pd.testing.assert_frame_equal(
        got_sql.sort_values(cols, ignore_index=True),
        got_df.sort_values(cols, ignore_index=True),
        check_dtype=False,
        atol=1e-6,
        check_exact=False,
    )
