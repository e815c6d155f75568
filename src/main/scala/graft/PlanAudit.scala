package graft

import org.apache.spark.sql.SparkSession

/** Plan audit main: prints the formatted physical plan of each headline
  * query and flags scale killers — missing filter pushdown, unpruned
  * scans, cartesian products, missing broadcasts, non-codegen spans —
  * then sweeps the ENTIRE catalog flags-only, so a scale killer in any
  * of the 66 queries surfaces even if it is not a headline.
  *
  * Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {

  /** Queries where a BroadcastNestedLoopJoin is the intended plan: a
    * deliberately-broadcast tiny side under a cross/inequality join
    * (single-query-vector scoring, the q42 cross join demo, and q87's
    * ONE-row dense bloom bitmap — the probe cross-joins the 8 KiB
    * bitmap row so all k position tests run in one codegen'd
    * projection with no explode/shuffle).
    */
  private val bnljExpected = Set(
    "q28_cosine_topk", "q31_ann_lsh", "q36_media_features", "q42_cross_join",
    "q87_bloom_contamination", "q89_bloom_flag",
    // 20-row per-source signature table under an inequality self-join —
    // pairs of SOURCES (corpus-level profile), broadcast by design
    "q93_minhash_sources",
    // 19-row comparison-group list × value-bounded baseline count
    // table (the pooled-rank replication) — q93's pairs-of-groups
    // shape, broadcast by design
    "q278_mwu_drift",
    // ONE-row tie total cross-joined into the ONE-row H fold, plus
    // the value-domain-bounded midrank table broadcast onto the
    // cells — broadcast by design
    "q322_kruskal_wallis",
    // row-margin × column-margin full grid (both domain-bounded)
    // plus the ONE-row total N — q155's zero-cells-must-contribute
    // shape, broadcast by design
    "q323_chi_residuals",
    // k-row rank list × value-domain list zero-fill grid plus the
    // ONE-row totals into the ONE-row concordance fold — broadcast
    // by design
    "q324_jonckheere",
    // ONE-row train-majority baseline cross-joined into the eval
    // flags, plus the q114 NB class-table scoring shape upstream
    "q325_cochran_q",
    // ONE-row seed-count scalar cross-joined onto the vocab-bounded
    // node table (per PPR iteration) — broadcast scalar by design
    "q345_seed_expansion",
    // ONE-row (nr, nc, N) dims scalar cross-joined onto the bounded
    // (lang × source) grid per IPF sweep step — broadcast by design
    "q351_raking",
    // the q351 dims scalar inside the rake stage; the corpus gate
    // itself is a broadcast-grid equi-join
    "q352_raked_sample",
    // ONE-row corpus total cross-joined onto the score-VALUE-bounded
    // cumulative table — the q92-class broadcast scalar
    "q346_risk_coverage",
    // pairs-of-groups comparison over the value-bounded count grid
    // plus ONE-row per-pair totals — the q278 shape, broadcast by
    // design
    "q329_cliffs_delta",
    // the q226 ACF surface's lag-grid rows cross-joined with the
    // ONE-row per-type n — span-bounded both sides
    "q331_ljung_box",
    // ONE-row day-count total and ONE-row exact median cross-joined
    // onto the span-bounded day grid — broadcast scalars by design
    "q332_runs_test",
    // ONE-row corpus total cross-joined into the bounded group table
    // for the between-group half — broadcast scalar by design
    "q333_theil",
    // ONE-row baseline-group moments cross-joined into the bounded
    // comparison-group table — broadcast scalar by design
    "q334_cohens_d",
    // ONE-row pair-count totals × row-margin fold × column-margin
    // fold — all bounded by the label grid, broadcast by design
    "q335_adjusted_rand",
    // ONE-row corpus count × two ONE-row precision/recall folds —
    // broadcast scalars by design
    "q336_bcubed",
    // ONE-row total × four ONE-row entropy folds off the bounded
    // label grid — broadcast scalars by design
    "q337_vmeasure",
    // ≤20-bin similarity histogram × 6-row literal config grid —
    // the whole planner fold is literal-bounded, broadcast by design
    "q338_lsh_plan",
    // ONE-row privacy totals cross-joined into the 4-row per-k
    // report — broadcast scalar by design
    "q279_k_anonymity",
    // ONE-row pooled totals and ONE-row BH cutoff rank kmax
    // cross-joined into the 25-row test table — broadcast by design
    "q284_bh_fdr",
    // ONE-row n / renorm-max / Rayleigh / trace / dim / loading
    // scalars cross-joined through the d²-bounded power iteration —
    // broadcast by design (q152's iterated-scalar convention)
    "q285_pca_top",
    // 3-row channel dim × 2³-row coalition/v tables (the Shapley
    // power-set walk) — bounded broadcast by design
    "q280_shapley_attribution",
    // 5-row per-lang KMV sketch table, same pairs-of-groups shape
    "q94_kmv_jaccard",
    // 3-row per-suite dense bloom table cross-joined into the probe —
    // q87's single-row pattern with a set dimension
    "q96_multi_bloom",
    // ONE-row τ (the priority-sampling threshold) cross-joined into
    // the 500-row sample — broadcast scalar by design
    "q99_priority_sample",
    // 20-row per-source sketch table under an inequality self-join —
    // q93/q94's pairs-of-groups shape
    "q104_kmv_matrix",
    // 5-row per-lang sketch pairs (q94's shape) + ONE-row broadcast V
    // under the set-op readback
    "q105_kmv_setops",
    // ONE-row vocabulary size V cross-joined into the bigram scoring
    // stream — broadcast scalar by design
    "q106_lm_surprisal",
    // q106's ONE-row V broadcast under the positioned span windows
    "q317_surprisal_spans",
    // ONE-row quantized query vector cross-joined into the scoring
    // scan — q28's single-query-vector shape
    "q108_sq_ann",
    // ONE-row (n_docs, avdl) corpus stats cross-joined into the tf
    // rows — broadcast scalar by design
    "q109_bm25",
    // L-row (≤ 5 langs) class table cross-joined into the token
    // stream — the standard NB score shape, broadcast by design
    "q114_nb_classifier",
    // 3-row per-query lookup-table set cross-joined into the code
    // scan — q28's single-query shape over PQ codes
    "q117_pq_adc",
    // ONE-row (tot_r, tot_t) count totals cross-joined into the
    // 64-row λ table build — broadcast scalar by design
    "q120_dsir_scores",
    // ONE-row (cut_score, tokens_used) broadcast under the
    // score >= cut inequality filter — broadcast scalar by design
    "q122_budget_select",
    // q79's IVF probe shape plus the brute-force ground truth's
    // 3-row query set cross join (q28's shape) — both by design
    "q123_ann_recall",
    // q123's brute-force-ground-truth shape: the 3-row query-vector
    // table cross-joined into the corpus scan for the exact ranking
    // the rank/recall metrics are judged against — broadcast by design
    "q147_rank_eval",
    // q147's exact shape under the MAP readback — same 3-row query
    // cross join, broadcast by design
    "q291_map_eval",
    "q149_rp_recall",
    // q123's brute-force shape per truncation width — the 3-row query
    // set cross-joined into the corpus scan, broadcast by design
    "q282_matryoshka_recall",
    // ONE-row total-bigram count N cross-joined into the PMI
    // projection — broadcast scalar by design
    "q124_pmi_collocations",
    // ONE-row row total cross-joined into the ≤k top-key rows for
    // the per-mille shares — broadcast scalar by design
    "q126_skew_report",
    // G-row centroid table under an inequality self-join — the
    // q93/q104 pairs-of-groups shape, broadcast by design
    "q127_centroid_drift",
    // 5-row query set cross-joined into the corpus scan with a
    // label-mismatch filter — q28's single-query shape
    "q134_hard_negatives",
    // ONE-row token total and ONE-row d_max cross-joined into the
    // 20-row per-source rate table — broadcast scalars by design
    "q138_temperature_mix",
    // ONE-row node count N cross-joined into the vocab-sized rank
    // table (once at init, once per PageRank iteration) — broadcast
    // scalar by design, the q124 convention
    "q152_textrank",
    // the (groups × bins) PSI grid: a bounded global-bin histogram
    // cross-joined under each group, plus the ONE-row corpus totals
    // — broadcast by design
    "q155_psi_drift",
    // ONE-row basket total cross-joined into the vocab²-bounded rule
    // table — broadcast scalar by design
    "q162_assoc_rules",
    // the q155 (groups × bins) grid shape plus the ONE-row corpus
    // total — broadcast by design
    "q201_wasserstein_drift",
    // ONE-row total-user count cross-joined into the T³-bounded
    // trigram table — broadcast scalar by design
    "q204_sequence_patterns",
    // 3-row probe query set cross-joined under the corpus scan (the
    // q28/q134 brute-force convention) — broadcast by design
    "q205_rrf_hybrid",
    // same 3-row probe-set brute-force candidate scan; the greedy
    // rounds run on Q×kCand-bounded tables
    "q208_mmr_rerank",
    // ONE-row total count cross-joined into the 9-row digit table —
    // broadcast scalar by design
    "q206_benford_screen",
    // ONE-row corpus-max-day and total-user scalars cross-joined
    // into the per-user span / day tables — broadcast by design
    "q207_survival_curve",
    // q207's shape: ONE-row max-day and cohort-total scalars
    // cross-joined into the span / lifetime-day tables
    "q281_logrank",
    // ONE-row output total cross-joined into the ≤k amplification
    // rows — skewReport's broadcast-scalar shape
    "q164_join_amplification",
    // ONE-row max id cross-joined into the bucket projection —
    // broadcast scalar by design
    "q165_heaps_curve",
    // ONE-row reference hash (doc 0) cross-joined into the hamming
    // projection — broadcast scalar by design
    "q166_image_dhash",
    // same ONE-row reference-hash shape, audio form
    "q168_audio_fingerprint",
    // bounded baseline-bin table cross-joined under each group for
    // the union grid, plus the ONE-row baseline total — broadcast by
    // design (q155's shape with a fixed reference)
    "q169_psi_baseline",
    // ONE-row stratum-count total N cross-joined into the
    // strata-bounded allocation table — broadcast scalar by design
    // (q122's cut-table convention)
    "q177_stratified_sample",
    // q114's NB scoring shape (L-row class table cross-joined into
    // the token stream) under the report composition
    "q179_classification_report",
    // ONE-row expected-agreement product sum S cross-joined into the
    // ONE-row (n, n_agree) totals — broadcast scalar by design; plus
    // the NB class-table shape upstream
    "q180_cohens_kappa",
    // q180's shape: ONE-row pooled-marginal (n, Σc²) totals
    // cross-joined into the ONE-row (n_units, n_disagree) fold, plus
    // the NB class-table shape upstream
    "q295_krippendorff",
    // classes × sensitive-value union grid from a value-domain-
    // bounded broadcast marginal (q155's shape — zero cells must
    // contribute), plus the ONE-row corpus total N
    "q296_t_closeness",
    // ONE-row dropped-counts fold cross-joined into the ONE-row
    // matched report — broadcast scalar by design
    "q297_cem_att",
    // per-iteration ONE-row L1 totals (and the n_hubs init scalar)
    // cross-joined into the node tables — broadcast scalars by
    // design, q152's unrolled-iteration shape
    "q300_hits",
    // ONE-row population total cross-joined into the score-value-
    // bounded cumulative table (q122's cut-table shape); the window
    // runs over the bounded band table only
    "q302_qini_curve",
    // ONE-row pooled-rate totals cross-joined into the group-domain-
    // bounded count table — broadcast scalar by design
    "q306_sprt",
    // ONE-row eval-total and ONE-row ECE fold cross-joined into the
    // ≤ nBins-row reliability table — broadcast scalars by design
    "q309_ece_report",
    // ONE-row corpus totals and ONE-row normalizer Z cross-joined
    // into the sources-bounded weight table — broadcast scalars by
    // design (q138's mixture-table convention)
    "q310_doremi_step",
    // S-row source list cross-joined into the bigram-TYPE count
    // table (the scoring grid is types × sources by design), vocab
    // scalars broadcast — q106's LM shape scored pairwise
    "q312_lm_cross_ppl",
    // k-row top-word list cross-joined into the S-row source-total
    // table — the (S × k) stylometry grid, broadcast by design
    "q313_burrows_delta",
    // ONE-row moment totals cross-joined into the ≤ nBins bin
    // table — broadcast scalars by design (q309's shape)
    "q314_brier_decomp",
    // ONE-row doc total N cross-joined into the (class, word) scoring
    // stream — broadcast scalar by design (q124's convention)
    "q181_discriminative_words",
    // ONE-row (n_docs, avdl) stats cross-joined into the vocab-
    // bounded df table / the probe scoring rows — q109's shape
    "q193_bm25_index", "q194_bm25_probe",
    // ONE-row corpus-total and |q| scalars cross-joined into the
    // probe-term scoring rows / the doc-length table — q109's shape
    // under the Dirichlet decomposition
    "q293_ql_retrieval",
    // ONE-row global prior p0 cross-joined into the per-key rate
    // table — broadcast scalar by design
    "q183_bayesian_rates",
    // q114's NB class-table scoring shape under the margin ranking
    "q184_uncertainty_sample",
    // q114's NB class-table scoring shape × 5 CV folds + the ONE-row
    // mean/σ moment broadcast into the 5-row fold table
    "q320_cv_auc",
    // q114's NB class-table scoring shape under the calibration bins
    "q212_calibration_report",
    // q212's NB shape plus the B³ isotonic minimax grid — inequality
    // joins over the ≤11-row bin table, broadcast by design
    "q286_isotonic_calibration",
    // ONE-row reference-group counts cross-joined into the 5-row
    // per-lang report — broadcast scalar by design
    "q287_fairness_report",
    // ONE-row cum-sqrt-f total cross-joined into the value-bounded
    // bin table — broadcast scalar by design
    "q288_cum_sqrt_strata",
    // 2-row alpha table against the residual-value histogram, the
    // 2-row q-hat table against the test stream (q122's cut-filter
    // shape), and ONE-row n_cal/n_test scalars — broadcast by design
    "q289_conformal",
    // q114's NB class-table scoring shape under the paired test
    "q290_mcnemar",
    // ONE-row max-date scalar plus three ONE-row quintile-cut tables
    // cross-joined into the per-customer base — broadcast by design
    "q214_rfm_segments",
    // q114's NB class-table shape upstream, plus the ONE-row category
    // S total cross-joined into the ONE-row A total — broadcast by
    // design (q180's kappa shape with a third rater)
    "q218_fleiss_kappa",
    // ONE-row x_(k+1) scalar cross-joined into the 51-row top table —
    // broadcast scalar by design
    "q219_hill_tail",
    // L-row language list under an inequality self-join — the
    // q93/q104 pairs-of-groups shape, broadcast by design
    "q185_js_divergence",
    // 20-row depth table cross-joined into the ≤40-row rank-pair
    // table under the depth inequality — k²-bounded by design
    "q186_rank_rbo",
    // ONE-row (ta, tb) token totals cross-joined into the vocab-
    // bounded delta table — broadcast scalar by design
    "q187_heavy_changers",
    // types × hour-span grid: the span-bounded hour list broadcast
    // under each type — the q155 union-grid shape
    "q188_burstiness",
    // types × dates × 24-hour grid from broadcast dimension lists —
    // span-bounded, q188's shape with a day axis
    "q196_seasonal_anomalies",
    // types × hour-span grid (q188's shape); the CUSUM windows run
    // per type over the span-bounded series
    "q197_cusum_shifts",
    // types × day-span grid (q196's shape); the O(days²) pair join
    // runs over the bounded grid
    "q199_mann_kendall",
    // types × day-span grid (q199's shape); the cumulative window,
    // the ONE-row-per-type totals and both argmax folds all run on
    // the span-bounded series — broadcast by design
    "q341_changepoint",
    // types × hour-span grid plus the 13-row lag list broadcast into
    // the span-bounded deviation table — bounded by design
    "q200_lead_lag",
    // types × day-span grid (q196's shape); the EWMA recurrence then
    // folds each type's span-bounded series inside one aggregate call
    "q220_ewma_bands",
    // q220's grid + recurrence shape with the double-smoothed state
    "q283_brown_forecast",
    // q283's grid + fold shape with the 7-slot seasonal state
    "q298_holt_winters",
    // bounded probe set (and then its ≤|Q| best-match candidates)
    // broadcast under one corpus scan each — q28's brute-exact shape
    "q221_bitext_margin",
    // types × day-span grid (q199's shape); the O(days²) pair join
    // and the rank window run over the bounded grid
    "q223_theilsen_slope",
    // types × hour-span grid plus the 26-row lag list broadcast into
    // the span-bounded deviation table — q200's audited shape
    "q226_acf",
    // ONE-row conversions total broadcast under the channel-bounded
    // report table — broadcast scalar by design
    "q228_attribution",
    // ONE-row (customers, revenue) totals broadcast under the
    // value-bucket table — broadcast scalar by design
    "q229_lorenz_curve",
    // ONE-row sessions total broadcast under the path-bounded
    // count table — broadcast scalar by design
    "q230_session_paths",
    // ONE-row bigram-type total (Nt) broadcast under the scored
    // bigram stream — q106's broadcast-scalar shape
    "q236_kn_surprisal",
    // ONE-row corpus total broadcast under the vocab-bounded
    // (cell, word) score table — broadcast scalar by design
    "q237_cluster_labels",
    // ONE-row (n_a, n_b) exposure totals broadcast under the
    // types-bounded conversion table — broadcast scalar by design
    "q244_ab_test",
    // ONE-row basket total under the brand²-bounded rule table —
    // q162's broadcast-scalar shape over the order-basket domain
    "q240_brand_affinity",
    // types × day-span grid (q223's audited zero-fill shape); the
    // 5-sum fold runs over the bounded grid
    "q242_ols_trend",
    // q242's types × day-span zero-fill grid plus its one-row-per-
    // type fit broadcast back for the residual pass
    "q316_durbin_watson",
    // q242's zero-fill grids twice over (types × days and types ×
    // days × the 24-row hour list) — span-bounded broadcasts
    "q319_seasonal_strength",
    // three ONE-row totals (n_pred / n_true / tp) composed into the
    // single report row — broadcast scalars by design
    "q248_lsh_eval",
    // channels²-bounded chain tables: the (removed × state) value-
    // iteration rows, the ONE-row full-reach and total-effect
    // scalars — all broadcast by design
    "q250_markov_attribution",
    // ONE-row u-weight vector (exact Σp² per field) broadcast under
    // the blocked candidate pairs — broadcast scalars by design
    "q251_record_linkage",
    // ONE-row max-item id broadcast under the per-user slot explode —
    // broadcast scalar by design
    "q252_negative_sample",
    // ONE-row bigram-type total (Nt) broadcast under the top-context
    // scoring rows — q236's broadcast-scalar shape
    "q254_kn_next_word",
    // ONE-row group count broadcast into the idf projection —
    // broadcast scalar by design
    "q255_source_tfidf_cosine",
    // q114's NB class-table scoring shape (q212's wrap) under the
    // AUC count fold
    "q256_nb_auc",
    // three ONE-row agreement scalars (totals / a-marginals /
    // b-marginals) composed into the single report row — broadcast
    // scalars by design
    "q258_partition_agreement",
    // ONE-row global-mean scalar broadcast under the map-only
    // encode — broadcast scalar by design
    "q260_target_encode",
    // ONE-row point estimate + the two one-row order-statistic
    // bounds composed into the single report row — broadcast
    // scalars by design
    "q261_bootstrap_ci",
    // q251's ONE-row u-weight vector broadcast under the blocked
    // pairs (threshold mode) — broadcast scalars by design
    "q263_golden_records",
    // ONE-row midpoint scalar under the user reduction, then the
    // one-row moment/variant folds composed into the single report
    // row — broadcast scalars by design
    "q264_cuped",
    // ONE-row corpus totals broadcast onto the groups-bounded
    // impact table — broadcast scalar by design
    "q266_loo_source_impact",
    // m-row (≤64 by parameter) probe and sample vectors broadcast
    // under the two map-only NN scans, plus the one-row u/w scalars
    // — bounded broadcasts by design
    "q270_hopkins",
    // q79/q135's cell chain upstream; the one-row A/T moment scalars
    // composed into the single report row — broadcast by design
    "q271_ch_index",
    // ONE-row edge-weight total m2 and the one-row modularity scalar
    // broadcast under the communities-bounded report — broadcast
    // scalars by design (q152's N convention)
    "q262_label_prop",
    // ONE-row Neyman weight total broadcast into the strata-bounded
    // allocation table — q177's cut-table convention
    "q269_neyman_sample",
    // q264's ONE-row midpoint scalar under the user reduction, 2-row
    // variant fold — broadcast scalars by design
    "q272_did_report",
    // ONE-row class totals broadcast onto the value-domain-bounded
    // threshold table — broadcast scalar by design
    "q273_gini_split",
    // q261's one-row point estimate + order-statistic bounds, ratio
    // form — broadcast scalars by design
    "q275_bootstrap_ratio")

  /** Queries whose LSH self-join must carry the hot-bucket guard
    * (Scale.cappedBucketJoin — its grid-salt columns, named by
    * [[graft.ops.Scale.BaseSplitCol]], show up in the plan). A missing
    * guard means a dense bucket regenerates the
    * O(b²)-pairs-in-one-task straggler.
    */
  private val bucketGuardExpected = Set(
    "q49_embedding_near_dup", "q76_knn_self", "q81_semdedup",
    // wraps q76's guarded kNN self-join before the label joins
    "q153_label_noise")

  /** Queries where an unpartitioned window is intended. A global
    * window funnels its input through ONE task — acceptable ONLY when
    * that input is already a bounded aggregate, never the corpus.
    */
  private val globalWindowExpected = Set(
    // unkeyed histogram quantiles: the cumulative sum runs over the
    // BIN table (≤ max(value)/binWidth rows — constant in corpus
    // size), after the corpus has been reduced to per-bin counts;
    // the keyed form (q95) partitions by lang instead
    "q92_hist_quantiles",
    // pooled midrank cumsum over the banded VALUE table (value-
    // domain-bounded — the q278 pooled-rank shape unkeyed because
    // KW pools all k groups into one ranking)
    "q322_kruskal_wallis",
    // budget selection: the cumulative-token window runs over the
    // SCORE-BUCKET table (≤ 1001 milli-quality values — constant in
    // corpus size), after the corpus has been reduced to per-bucket
    // token sums; the corpus itself is filtered by a broadcast join
    "q122_budget_select",
    // Heaps curve: the cumulative window runs over the nBuckets-row
    // report (20 rows by parameter — constant in corpus size), after
    // the corpus reduced to per-bucket counts
    "q165_heaps_curve",
    // Zipf report: the lead window runs over the bounded-heap
    // top-(k+1) rows (21 by parameter — constant in corpus size)
    "q170_zipf_report",
    // rank windows over the two LIMIT-20 ranking tables and the RBO
    // cumulative sum over the 20-row depth table — all k-bounded by
    // construction
    "q186_rank_rbo",
    // Gini cumulative-count window over the BOUNDED length-bucket
    // table (q92's audited cumsum shape)
    "q189_length_gini",
    // RFM quintile-cut cumsums over the VALUE-DOMAIN-bounded count
    // tables (span days / orders-per-customer / $100 buckets — never
    // customers)
    "q214_rfm_segments",
    // KM risk/log-survival cumsums over the lifetime-DAY table
    // (≤ corpus span days — constant in corpus size), after the
    // corpus reduced to one row per user then one per day
    "q207_survival_curve",
    // log-rank at-risk cumsums over the same lifetime-day table
    "q281_logrank",
    // BH |z| rank window over the 25-row (group-domain) test table
    "q284_bh_fdr",
    // loading rank window over the d-row (64) eigenvector table
    "q285_pca_top",
    // cum-sqrt-f window over the value-domain-bounded bin table
    // (the q92 audited cumsum class)
    "q288_cum_sqrt_strata",
    // conformal residual-value histogram cumsum (the q92 class)
    "q289_conformal",
    // Lorenz cumulative shares over the $10k VALUE-bucket table
    // (value-domain-bounded — the q92/q189 audited cumsum class),
    // after the corpus reduced to per-customer cents
    "q229_lorenz_curve",
    // MoM/YoY lag windows over the span-bounded MONTH grid, after
    // the corpus reduced to per-month totals
    "q233_revenue_trend",
    // Pareto finish: the band cummax runs over the price-band table
    // (value-domain div bandWidth — constant in corpus size) and the
    // exact RANGE cummax over the band-pruned survivor set (bounded
    // by bands × per-band frontier width by construction)
    "q243_pareto_front",
    // phrase rank window over the LIMIT-topN phrase table (5 rows by
    // parameter — the q170/q186 bounded-heap class)
    "q247_phrase_search",
    // rank window over the LIMIT-topK scored-pair table (50 rows by
    // parameter — the q170/q247 bounded-heap class)
    "q251_record_linkage",
    // rank window over the B-row replica-mean table (40 rows by
    // parameter — bounded by construction)
    "q261_bootstrap_ci",
    // cumulative window over the value-domain-bounded (value → pos,
    // neg) threshold table — bounded by the feature domain
    "q273_gini_split",
    // rank window over the B-row replica table (q261's class)
    "q275_bootstrap_ratio",
    // Qini cumulative arm counts over the score-VALUE-bounded band
    // table (the q92/q122 audited cumsum class), after the corpus
    // reduced to per-band counts
    "q302_qini_curve",
    // treatment-order index window over the k-row DISTINCT-treatment
    // table (k = 3 years — constant in corpus size); the rank stage
    // itself partitions by block
    "q327_page_trend",
    // |d| midrank cumsum over the ($100-discretized) DIFF-value count
    // table — the q322 pooled value-domain-bounded rank class
    "q328_wilcoxon",
    // risk–coverage cumsum over the score-VALUE-bounded (p → n, e)
    // count table (the q92/q302 audited cumsum class), after the
    // corpus reduced to per-score counts
    "q346_risk_coverage",
    // median-rank cumsum over the daily-value count table and the
    // sign-change lag walk over the day grid — both span-bounded
    // (the q207/q233 audited classes), after the corpus reduced to
    // one row per day
    "q332_runs_test")

  /** Queries whose FINAL plan legitimately has no WholeStageCodegen
    * span: the distributed work happens upstream of a BOUNDED driver
    * collect (audited at the operator), and the returned DataFrame is
    * a driver-constructed report row — there is nothing left to
    * codegen.
    */
  private val noCodegenExpected = Set(
    // the d²-bounded co-moment grid is collected (documented bounded
    // collect, the q139 finisher convention) and the power iteration
    // runs in exact BigInt on the driver; the result is a ONE-row
    // local report
    "q285_pca_top")

  private def flagsFor(name: String, df: org.apache.spark.sql.DataFrame,
                       plan: String, executed: String): Seq[String] = {
    val globalWindow = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }.nonEmpty
    Seq(
      "CartesianProduct" -> plan.contains("CartesianProduct"),
      "no-WholeStageCodegen" -> (!(executed.contains("WholeStageCodegen") ||
        executed.contains("*(")) && !noCodegenExpected.contains(name)),
      "BroadcastNestedLoopJoin" -> (plan.contains("BroadcastNestedLoopJoin") &&
        !bnljExpected.contains(name)),
      "missing-hot-bucket-guard" -> (bucketGuardExpected.contains(name) &&
        !plan.contains(graft.ops.Scale.BaseSplitCol)),
      "global-window" -> (globalWindow && !globalWindowExpected.contains(name))
    ).collect { case (f, true) => f }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE defers codegen wrapping to stage materialization, which hides
      // WholeStageCodegen spans from plan inspection — disable for audit
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Bench.headline.foreach { name =>
      val df = Queries.all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n================ $name ================")
      println(plan)
      val flags = flagsFor(name, df, plan, df.queryExecution.executedPlan.toString)
      if (flags.nonEmpty) println(s"!! FLAGS: ${flags.mkString(", ")}")
    }

    // full-catalog sweep, flags only (q65 builds iteratively with
    // actions inside — plan-shape inspection does not apply; skip)
    println("\n================ full-catalog flag sweep ================")
    var flagged = 0
    Queries.all.keys.toSeq.sorted.filterNot(_ == "q65_dedup_clusters").foreach { name =>
      try {
        val df = Queries.all(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val flags = flagsFor(name, df, plan, df.queryExecution.executedPlan.toString)
        if (flags.nonEmpty) { flagged += 1; println(s"!! $name: ${flags.mkString(", ")}") }
      } catch {
        case e: Exception => flagged += 1; println(s"!! $name: plan build failed: ${e.getMessage}")
      }
    }
    println(s"sweep done: $flagged flagged of ${Queries.all.size - 1} audited")
    spark.stop()
  }
}
