"""Pin the curated driver-gate registration order (VERDICT r2 item 1).

The driver's correctness gate runs only the first GATE_WINDOW registry
entries; this test fails loudly if a new registration pushes an
oracle-bearing operator family past the window (the r2 regression:
q_grouping_sets silently lost its driver-green row)."""

from __future__ import annotations

from al_drift_detection_spark.operators import GATE_FRONT, GATE_WINDOW, REGISTRY

# oracle entries deliberately demoted past the window as redundant twins of
# in-window family representatives (each still oracle-checked by
# tools/check_oracles.py) — keep in sync with operators/__init__.py
DEMOTED_ORACLE_TWINS = {
    "q_ks_statistic",
    "q_except_keys",
    "q_lag_features",
    "q_accuracy",
    "q_per_class_accuracy",
    # r5: single-scope subset of q_crossing_report's scoped PRF oracle
    "q_prf_per_class",
    "q_split_counts",
    "q_topk_per_query",
    "q_minmax_class_counts",
    # r6 rotation (VERDICT r5 item 7): freed driver-gate slots for
    # q_wasserstein / q_uniqueness_drift
    "q_value_counts",
    "q_topn_global",
    # late-r6 rotation: the composed q_crossing_report (in-gate, driver-
    # green) carries the full scoped S/D/I computation; the single-scope
    # q_error_sdi freed the slot for q_page_hinkley (the new sequential
    # change-detector family's representative)
    "q_error_sdi",
    # r7 rotation (VERDICT r6 item 5): one scalar-expression family held two
    # slots (q_zscore F1 / q_vector_magnitude F2 — q_orbit_prep still
    # value-checks the z-score composition locally), and q_time_bucket's F7
    # timestamp family is represented by q_group_extents; the freed slots
    # went to q_histogram_quantiles / q_metric_anomaly / q_store_changepoint
    "q_zscore",
    "q_vector_magnitude",
    "q_time_bucket",
    # late-r7 rotation: the rollup family held two slots (q_grouping_sets +
    # q_pivot — the same grouping-sets/rollup shape); the freed slot went to
    # q_sliced_drift, the round's per-slice drift drill-down family
    "q_pivot",
    # late-r7 rotation #2: the windowed-offset family held two slots
    # (q_lead_target J3 lead + q_sequence_checksum W2 lag — the same
    # Window-offset shape); the freed slot went to q_trend, the round's
    # cross-run Mann-Kendall trend family
    "q_sequence_checksum",
}

# oracle-bearing EXTENSIONS beyond the SURVEY §2 inventory, plus explicit
# family twins added after the window froze: the 50 slots are reserved for
# distinct SURVEY operator families + the ANN trio, so these run as
# local-pass oracles (tools/check_oracles.py) rather than driver rows
ORACLE_EXTENSIONS_PAST_WINDOW = {
    "q_tfidf_topk",
    "q_positional_project",  # P4 evidence; projection family is in-window via q_filter_project
    # drift-kernel family extensions (the KS/PSI/MMD representatives are
    # in-window; these widen the same §2.10 family)
    "q_chi2_drift",
    "q_js_fixed_bins",
    "q_categorical_drift",
    # bounded histogram distances (Hellinger/TV/Bhattacharyya) — same
    # fixed-bin shape as the in-window q_psi_fixed_bins
    "q_hist_distances",
    # known-baseline sequential detector; the family's representative
    # (q_page_hinkley) is in-window via the late-r6 rotation
    "q_cusum",
    # skew MEASUREMENT step of the in-window q_salted_agg mitigation, and
    # the r7 auto-wired variant (profile-derived fan-out; same plain
    # GROUP-BY oracle as the in-window manual q_salted_agg)
    "q_skew_profile",
    "q_salted_agg_auto",
    # categorical sibling of q_corr_drift's joint-structure family
    # (Deequ MutualInformation analyzer: MI + Cramér's V) and its
    # per-window drift form
    "q_mutual_information",
    "q_association_drift",
    # distribution-SHAPE constraint (data-audit family); the chi2 grid
    # representative (q_chi2_drift) documents the same oracle split
    "q_benford",
    # windowed-verdict form of the in-window q_anti_join referential family
    "q_referential_drift",
    # schema-inference half of the q_suggest_constraints profiling family
    "q_type_suggestions",
    # composite-key Deequ uniqueness triple (multi-column form of the
    # in-window q_distinct_keys / q_uniqueness_drift family)
    "q_uniqueness_metrics",
    # corpus-quality extensions of the in-window q_quality_features family
    "q_repetition_ratio",
    "q_pii_scan",
    "q_quality_gate",
    "q_decontamination",  # membership family is in-window via q_anti_join
    # frequent-items family (round 7): the exact top-k twin and the
    # Misra-Gries invariant-verified sketch (ordering family in-window via
    # q_topk_per_group; the sketch-store pattern via q_histogram_quantiles)
    "q_frequent_items",
    "q_mg_frequent_items",
    "q_frequent_items_drift",
    # seasonal strategy of the in-window q_metric_anomaly repository family
    # (Deequ HoltWinters use case; round 7)
    "q_seasonal_anomaly",
    # count-min point queries: the approximate twin of in-window
    # q_value_counts-family exact counts (lazy xxhash64-replica oracle;
    # round 7)
    "q_cms_point_estimates",
    # bloom membership: the at-scale twin of the in-window q_anti_join /
    # q_referential_drift exact family (lazy xxhash64-replica oracle;
    # round 7)
    "q_bloom_referential",
    # KMV cross-window overlap: set-intersection form of the in-window
    # q_uniqueness_drift / q_distinct_keys family (lazy xxhash64-replica
    # oracle; round 7)
    "q_kmv_retention",
    # conditional (per-category) completeness: drill-down form of the
    # in-window q_completeness_drift family (round 7)
    "q_conditional_completeness",
    # per-row OOD rate vs trained centroids: row-counting sibling of the
    # q_embedding_drift population family (lazy trained-centroid oracle;
    # round 7)
    "q_embedding_outliers",
    # reference-trained bigram-LM perplexity scoring: the CCNet filter,
    # corpus-quality extension of the in-window q_quality_features family
    # (round 7)
    "q_bigram_nll",
    # winnowing (MOSS) fingerprints + containment pairs: the shingle/pair
    # families are in-window via q_ngram_jaccard_pairs / q_dedup_clusters;
    # these add the guarantee-bearing fingerprint scheme (round 7)
    "q_winnow_fingerprints",
    "q_winnow_overlap_pairs",
    # exact-Jaccard twin of the in-window q_near_dup_rate (VERDICT r3 item 5):
    # value-checks the windowed dup-rate series; LSH stays the scale path
    "q_near_dup_rate_exact",
    # the --orbits preprocessing (z-score + rolling mean) as a value-checked
    # composition; its constituent families (F1 z-score, W1 rolling) are
    # in-window via q_zscore / q_rolling_mean
    "q_orbit_prep",
    # windowed data-HEALTH extensions of the in-window stats/verdict
    # families (A1-A4 volume, P1 completeness, W2 lag gaps)
    "q_volume_anomaly",
    "q_completeness_drift",
    "q_ingestion_gaps",
    # persisted-index twin of the in-window q_ivf_topk (same trained
    # centroids + ranking contract; adds on-disk layout + incremental
    # update accounting, full oracle via _ivf_index_oracle_sql)
    "q_ivf_index_topk",
    # schema half of the validation family (verdict/constraint halves are
    # in-window); oracle is a metadata-only information_schema comparison
    "q_schema_check",
    # r6 drift-kernel family extensions (KS/PSI/MMD/W1 representatives are
    # in-window; these widen §2.10 — CvM/AD complete the EDF trio, energy
    # distance is the bandwidth-free MMD companion)
    "q_cvm_drift",
    "q_ad_drift",
    "q_energy_distance",
    # r6 mergeable histogram sketches: q_histogram_quantiles was promoted
    # in-window by the r7 rotation; the sketch-only PSI/KS drift twin stays
    # local (q_psi_fixed_bins is its in-window representative)
    "q_histogram_drift",
    # r6 cross-column correlation drift: joint-structure health extension of
    # the in-window q_corr_covar / drift-kernel families
    "q_corr_drift",
    # r6 constraint suggestion (Deequ ConstraintSuggestion pattern): the
    # suggested checks' runtime families (not_null/in_set/between/unique)
    # are in-window via the validation suite entries
    "q_suggest_constraints",
    # r6 sequential change-detector family: q_page_hinkley is the in-window
    # representative; DDM and the EWMA chart are its family twins
    "q_ddm_error_rate",
    "q_ewma_control",
    # north_star HLL sketch uniqueness: the exact-uniqueness family is
    # in-window via q_uniqueness_drift; this is its sketch/incremental form
    "q_hll_uniqueness",
    # full-oracle twin of the rows-only q_embedding_drift (same
    # applyInPandas surface, energy kernel instead of MMD so the statistic
    # is ANSI-expressible)
    "q_embedding_energy",
}


def test_gate_front_is_the_window():
    names = list(REGISTRY)
    assert len(GATE_FRONT) == GATE_WINDOW
    assert names[:GATE_WINDOW] == GATE_FRONT


def test_every_oracle_family_in_window():
    """Every oracle-bearing entry is either inside the gate window or an
    explicitly documented twin of an in-window entry."""
    window = set(list(REGISTRY)[:GATE_WINDOW])
    out_of_window_oracles = {
        n for n, spec in REGISTRY.items() if spec.sql is not None and n not in window
    }
    assert out_of_window_oracles == DEMOTED_ORACLE_TWINS | ORACLE_EXTENSIONS_PAST_WINDOW


def test_ann_entries_in_window_and_oracle_status():
    """The ANN trio stays in-window, all three oracle-bearing since r6: the
    LSH pair via literal plane matrices (r5), q_ivf_topk via the lazy
    trained-centroid builder (VERDICT r5 item 5) — the gate window carries
    ZERO rows-only entries."""
    window = list(REGISTRY)[:GATE_WINDOW]
    for name in ("q_ivf_topk", "q_lsh_ann_topk", "q_cosine_neardup_pairs"):
        assert name in window, name
    assert REGISTRY["q_lsh_ann_topk"].sql is not None
    assert REGISTRY["q_cosine_neardup_pairs"].sql is not None
    assert callable(REGISTRY["q_ivf_topk"].sql)  # lazy builder, not None
    rows_only_in_window = [
        n for n in window if REGISTRY[n].sql is None
    ]
    assert rows_only_in_window == []


def test_demoted_twins_still_registered_with_oracles():
    for name in DEMOTED_ORACLE_TWINS:
        assert name in REGISTRY, name
        assert REGISTRY[name].sql is not None, name


def test_registry_single_object():
    """operators.REGISTRY must BE operators.registry.REGISTRY (curated in
    place): a rebound copy would let later register() calls mutate only the
    original, silently dropping new operators from the driver surface."""
    from al_drift_detection_spark.operators import REGISTRY as pkg_reg
    from al_drift_detection_spark.operators.registry import REGISTRY as mod_reg

    assert pkg_reg is mod_reg
