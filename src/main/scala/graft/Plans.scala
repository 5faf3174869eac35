package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries → PLANS.md, the
  * per-round evidence that the physical plans are the ones a 100 TB run
  * needs: filters/pruning pushed into the parquet scans, dimensions
  * broadcast, partial+final aggregation, windowed (not global-sorted) top-k,
  * and wide WholeStageCodegen spans.
  */
object Plans {
  private val Headline = Seq(
    "q01_pricing_summary" -> "pushed filter + partial/final hash agg over decimals",
    "q03_join_broadcast_agg" -> "fact-to-dim joins: both dims broadcast, one shuffle for the agg",
    "q04_join_shuffle_topk" -> "pre-aggregated fact side + TakeOrderedAndProject (no global sort)",
    "q09_window_topk_per_group" -> "partial agg then per-group window; rank filter prunes early",
    "q17_theta_join" -> "banded theta join stays a broadcast hash join on the equi key",
    "q29_weighted_avg_udaf" -> "DeclarativeAggregate weighted avg: plain codegen hash aggregate, no encoder boundary",
    "q37_minhash_bands" -> "one-pass codegen minhash_bands (sig+banding fused); shuffle only on (band, hash)",
    "q66_minhash_lsh_verified" -> "portable LSH: map-side-combinable signature mins, band-key join, verify on candidates only",
    "q73_hash_bucket_sample" -> "deterministic hash sample is a plain pushable filter + hash agg",
    "q41_ann_bruteforce_topk" -> "broadcast query side; codegen dot_f; bounded per-query window",
    "q49_sort_merge_join" -> "fact-to-fact sort-merge join, hash exchanges on the key",
    "q50_asof_join" -> "as-of join = ONE shuffle on user_id + running last-non-null window",
    "q60_pipeline_es_projection" -> "reference pipeline: scan-level column pruning + projections only",
    "q61_pipeline_splunk_envelope" -> "global batch ids via range partition + zipWithIndex (no 1-task window)",
    "q84_corpus_cleaning" -> "filters before the dedup shuffle; projections + hash aggs only",
    "q86_setsim_prefix_join" -> "exact Jaccard join: prefix+positional candidates, sorted merge-scan verify",
    "q90_ann_pq" -> "integer PQ: map-only pq_nearest_code encode (codebook in the expression closure), ADC join + integer sums",
    "q93_decontamination" -> "train/test overlap: df-filter kills boilerplate hot keys, eval side broadcast",
    "q76_min_cost_supplier" -> "selective part filter joined BELOW the aggregate (round-5 reorder)",
    "q94_unicode_normalize" -> "codegen nfc_normalize: one projection stage, no shuffle",
    "q95_pii_redaction" -> "regex redaction chain: single codegen projection, no shuffle",
    "q98_kmeans_clusters" -> "Lloyd round: broadcast centroids, codegen l2dist2_l, argmin packed into one BIGINT (PackedArgMin) so the winner is min(long) on the HashAggregate path",
    "q100_substring_windows" -> "windows travel as 60-bit hashes; shuffle keyed on (hash) only",
    "q102_stratified_sample" -> "per-stratum bounded window, no global sort",
    "q107_correlated_agg_predicate" -> "correlated agg-in-predicate DECORRELATED: one per-partkey aggregate joined below the filter, no per-row subquery",
    "q108_semdedup" -> "semantic dedup: pair join keyed on cid only (cluster-bounded, never all-pairs), codegen dot_l threshold",
    "q109_bloom_decontam" -> "bloom decontam: map-side bloom_might_contain prunes train BEFORE any exchange; exact join on survivors only",
    "q110_bm25_retrieval" -> "BM25 probe: query-term filter hits the token stream map-side; only 3 terms' postings shuffle; TakeOrderedAndProject top-k",
    "q111_ann_filtered" -> "filtered ANN: label predicate is the BroadcastHashJoin KEY (pre-filter), only same-class pairs scored",
    "q112_span_dedup_rebuild" -> "constructive span dedup: one MIN per span (no per-span window), rebuild bounded by doc length",
    "q113_source_overlap_matrix" -> "source overlap: per-shingle source set from ONE hash agg, ordered pairs from a <=n_sources array — no self-join",
    "q114_source_centroid_matrix" -> "centroid matrix: one (source,pos) hash agg over the corpus, pairwise dot_l only on n_sources tiny centroid rows",
    "q115_canonical_dedup" -> "canonical dedup: keep-best is ONE packed-BIGINT min hash agg on the cluster label (struct min would fall back to SortAggregate), never a per-cluster window",
    "q116_token_budget_select" -> "budget select: per-source running-sum window (q92 precedent), census output <= n_sources rows",
    "q117_shingle_novelty" -> "novelty: per-shingle min re-aggregated by owner — no shingle join-back, doc-keyed join only",
    "q118_token_accounting" -> "token accounting: one regexp pass + bounded aggregate fold per row, no explode, no shuffle before the ordering",
    "q119_countmin_sketch" -> "CMS: ONE token pass — exact witness rides the grid build as a virtual perfect-hash row; constant-size grid broadcast to probes",
    "q120_token_chunking" -> "chunking: map-only split + bounded sequence explode + slice/hash; chunks travel as md5, no shuffle before ordering",
    "q121_bigram_lm_surprisal" -> "bigram LM: two map-combinable count aggs build the model; scoring joins the bigram stream on the bigram key (AQE broadcasts small models)",
    "q122_incremental_dedup" -> "incremental dedup: band join RESTRICTED to old x new (no old x old work); verify on mixed candidates only; verdict = two left joins on the new-doc key",
    "q123_embedding_neardup" -> "embedding near-dup: L=8 map-only bucket keys per vector, self-join on (table, bucket), distinct slim pair list BEFORE the dot_f verify joins",
    "q124_dsir_importance" -> "DSIR: 256-row hashed-bigram model from two map-combinable aggs, broadcast to the scoring join; corpus shuffles only per-doc partial sums",
    "q126_pagerank" -> "PageRank: per-round join(ranks, edges) on the node key + one hash agg on dst - 2 bounded-key shuffles per iteration, edges localCheckpointed once",
    "q127_vocab_encode" -> "vocab encode: K-row vocab via TakeOrderedAndProject + zipWithIndex ids, broadcast mapping join, per-doc sorted-struct reassembly",
    "q128_event_trigram_funnel" -> "funnel trigrams: bounded per-user windows, map-combinable trigram hash agg, TakeOrderedAndProject top-25",
    "q129_quantiles_histogram" -> "global exact quantiles: B-bucket counting scans, map-side-combined count cells - no range exchange, no sort, no 1-task window",
    "q130_last_touch_attribution" -> "attribution: event-to-event as-of as ONE user-keyed rows-frame running MAX, never a self-join",
    "q132_funnel_conversion" -> "ordered funnel: three chained MIN(CASE) windows SHARE one user-keyed exchange",
    "q133_normalized_dedup" -> "normalized dedup: per-row canonicalization chain, everything downstream travels as md5; keeper via struct-MIN agg (string payload => map-side-combined SortAggregate; the exchange still carries one row per fingerprint)",
    "q134_cohort_retention" -> "cohort retention: per-user window MIN cohorting (one exchange), bounded-key matrix agg, week-0 denominator windowed over the tiny matrix",
    "q136_session_gaps_islands" -> "sessionization: lag + running-sum session ids inside ONE user-keyed window exchange; histogram agg on bounded keys",
    "q137_centroid_pseudolabel" -> "pseudo-labeling: L-row centroid broadcast, map-side l2dist2_l scoring, argmin via packed-BIGINT min on the hash-agg path (no per-vector window, no SortAggregate)",
    "q138_bpe_merge_candidates" -> "BPE mining: corpus-sized work is ONE word hash agg; char-pair explosion runs over the distinct vocabulary only",
    "q139_grouped_topk" -> "grouped top-k: partial ObjectHashAggregate holds a k-pair heap - the exchange carries <=k pairs per (group x split), no window sort",
    "q140_join_skew_audit" -> "skew audit: two-level map-combinable hash aggregates per key column, 3-row report",
    "q142_rag_chunk_retrieval" -> "RAG retrieval: map-only chunk explosion, query-term postings only through the shuffle, TakeOrderedAndProject top-10",
    "q145_copair_mining" -> "co-pair mining: DF-quantile frequent-singleton broadcast prune (top half of the vocabulary by DF rank, clamped [8,4096]) hits the token stream map-side; pair explode over min(doc_len, k) kept words per doc",
    "q147_lsh_recall_eval" -> "recall eval: exact PPJoin truth + LSH detected pipelines, two bounded driver scalars, one-row report",
    "q149_cdc_merge_census" -> "CDC merge: full-outer join on the merge key (the one shape MERGE cannot broadcast), 3-row census downstream",
    "q150_curriculum_interleave" -> "curriculum: per-source bounded rank windows + CLOSED-FORM interleave position - no global sort anywhere",
    "q151_matryoshka_energy" -> "matryoshka audit: map-only prefix dot_l self-products, one bounded-key agg",
    "q152_audio_energy" -> "audio energy: all-expression wav_energy(wav_for(...)) - scan, ONE WholeStageCodegen projection, sort; no mapPartitions encoder boundary",
    "q157_sampled_recall_eval" -> "sampled recall: exact truth join runs on the 25% md5 stratum only (pushable hash predicate); detected side filters the production LSH pairs map-side",
    "q158_semi_anti_chain" -> "Q21 chain: EXISTS/NOT EXISTS decorrelated to LeftSemi + LeftAnti joins keyed on l_orderkey with the <> residual - no per-row subqueries",
    "q159_video_index_walk" -> "video index walk: avi_for/avi_index codegen kernels in one projection stage; no shuffle before the presentation ordering",
    "q184_label_propagation" -> "LPA round: labels-to-edges shuffle + vote hash agg + packed-BIGINT argmax (PackedArgMin) - zero SortAggregate nodes, all aggregation on the hash path",
    "q187_kcore_peel" -> "k-core peel round: degree hash agg + two LEFT SEMI joins on the node key; per-round kept-node lists lazily checkpointed (PageRankInt discipline - linear plan chain, no 5^r subtree blowup), edge-derivation exchange re-read by every census branch",
    "q188_bq_hamming_rerank" -> "BQ search: one-word sign_bits_f index, XOR+POPCNT Hamming stage rides the topk_pair bounded heap (<=20 rows per query x split through the exchange); only the shortlist fetches full vectors via broadcast join",
    "q189_chapman_kolmogorov" -> "Chapman-Kolmogorov: ONE user-keyed window + ONE tagged hash agg at construction (eager checkpoint, q124 precedent); matmul + ppm + diff run on a tiny LogicalRDD - no parquet scan in the returned plan",
    "q190_hybrid_rrf" -> "hybrid RRF: lexical arm = q110's postings shape + TakeOrdered top-20, dense arm = one broadcast-query corpus scan; ranks via GlobalIndex on <=20-row frames (no partition-less window), fusion joins two checkpointed LogicalRDDs",
    "q191_degree_assortativity" -> "assortativity: degree hash agg + two node-keyed joins attach (dx,dy) per arc, ONE map-side-combined 1-row moment aggregate; DECIMAL(38) products, Guard-enforced bounds",
    "q192_bq_recall_eval" -> "BQ recall audit: shortlist = q188 stage 1 (bounded heap), truth = q41 broadcast scan + per-QUERY window; recall join on <=30x|Q| rows",
    "q193_cluster_safe_split" -> "cluster-safe split: q101's LSH+components machinery, map-only split assignment, leakage join linear in |pairs|; safe arm leaks ZERO by construction",
    "q194_bpe_vocab_trainer" -> "BPE trainer: corpus-sized work is ONE word hash agg regardless of K; each round's pair-count+argmax+merge is vocabulary-sized on a lazily checkpointed frame, merge = one string replace (greedy left-to-right in both engines)",
    "q195_bpe_tokenize_audit" -> "BPE tokenize audit: learned merges fold into ONE nested-replace projection over the DISTINCT vocab; corpus work = word explode + broadcast vocab join + doc-keyed hash agg",
    "q196_ktruss_peel" -> "k-truss peel (r15 delta form): ONE degree-ordered wedge join (apex-keyed, O(|E|^1.5) wedges) + packed-key LEFT SEMI close into a (tk, ek) frame; rounds 2-3 are delta maintenance (single-long semi-join dead-mark, delta-sized loss subtract, final round counts arithmetically); round frames lazily checkpointed",
    "q197_byte_entropy" -> "byte entropy: ONE codegen pass per row (256-cell count array, floor(ln) micro-nats) - map-only, no explode; oracle pays the per-char UNNEST the kernel avoids",
    "q198_jsd_drift" -> "JSD drift: one corpus scan collapses to a (type, bin, side) hash agg; entropy decomposition keeps every floor-ln term non-negative so integer truncation direction is moot; spine-sized joins after the scan",
    "q199_adamic_adar" -> "Adamic-Adar: 1/ln score attaches to the adjacency BEFORE the apex self-join (node-linear), wedge join shuffles once on the apex key, candidates collapse via a packed u*2^21+v single-BIGINT hash agg (r15), LEFT ANTI drops existing edges on the packed key, top-20 = TakeOrderedAndProject",
    "q200_pmi_collocations" -> "PMI: two corpus hash aggs checkpointed at vocab/vocab-squared size; marginals via broadcast joins + 1-row total cross-joins; single floor-ln per surviving bigram; top-20 = TakeOrderedAndProject",
    "q201_apriori_triples" -> "A-Priori triples: baskets built ONCE as sorted distinct arrays (lazy ckpt), pairs/triples explode by index arithmetic into PACKED 3x21-bit BIGINT keys (C(w,2)/C(w,3), bounded w, guarded partkey < 2^21 - every exchange/hash-agg key is 1 long, not a struct); minsup = ceil-quantile p99.995 of the triple-support histogram (two-level prefix sum); top-20 triples BROADCAST into three monotonicity-witness lookups over the packed pair frame",
    "q202_luby_mis" -> "Luby MIS round: arc-keyed neighbor-min hash agg + anti-join + two LEFT SEMI joins, all node-keyed; per-round frames lazily checkpointed (CheckpointTracker), 3-row census from one eager action",
    "q203_vocab_coverage" -> "Good-Turing/Chao1: one corpus scan -> (source, word) hash agg -> spectrum agg -> per-source row; pure integer, zero joins",
    "q204_markov_stationary" -> "stationary pi: corpus pays exactly q185's window exchange ONCE (eager ckpt of the <=25-row matrix); 5 power-iteration rounds are |types|-row joins against that broadcast",
    "q205_decayed_popularity" -> "half-life decay as integer right-shift: anchor = 1-row broadcast below ONE fact-scan hash agg; top-15 = TakeOrderedAndProject",
    "q206_audio_vad" -> "VAD: scan -> one WholeStageCodegen wav_vad(wav_for(...)) projection -> sort; run census folds in-kernel, no per-sample explode or island window",
    "q225_png_pixel_decode" -> "real PNG codec roundtrip: scan -> one WholeStageCodegen png_pixel_sums(png_for(...)) projection -> sort; zlib deflate/inflate + 5-filter reconstruction in-kernel, pixels never leave the expression",
    "q207_linkage_weights" -> "FS weights: q173's blocked candidates (never a cross product) + ONE 1-row flag aggregate; 3-row output = constant projections off the checkpointed agg",
    "q208_source_crossentropy" -> "cross-entropy matrix: two corpus passes -> checkpointed per-source count frames; 400-cell matrix = broadcast joins on those frames only, corpus never re-read",
    "q209_survival_curve" -> "KM curve: ONE user-keyed hash agg (no window) collapses the corpus; suffix/prefix sums ride broadcast theta self-joins on the <=31-row day frame",
    "q210_ann_ivfpq" -> "IVF-PQ: map-only NearestCode encode + broadcast probe list + broadcast ADC table; one co-keyed vec_id shuffle; raw floats touched only by the <=10x|Q| rerank join",
    "q211_dup_spectrum" -> "dup spectrum: q101's LSH+components once (lazy ckpt), then spectrum-sized aggs to one row; slope = one double division of exact floor-ln integers",
    "q212_peak_concurrency" -> "two-level prefix sum: day-partitioned cumulative window + broadcast theta join day offsets - the global running sum without a partition-less window",
    "q213_robust_means" -> "robust means: ONE type-partitioned rank window + ONE hash agg; boundary values as conditional MINs at exact ranks",
    "q214_burstiness" -> "burstiness: one per-type lag window -> one moment hash agg; DECIMAL(38) products, Guard-enforced",
    "q215_auc_ranksum" -> "exact AUC: one corpus scan -> score-domain frames; below(s) via the q212 two-level prefix sum (block window + broadcast offsets)",
    "q216_kll_quantiles" -> "KLL quantiles: ONE ObjectHashAggregate builds the 5 sketches (map-side combinable O(k log n) state); estimates explode to <=25 rows broadcast into one witness pass; exact side pays q81's per-type window - the cost the sketch exists to avoid",
    "q217_ewma_anomaly" -> "EWMA monitor: one (type, day) hash agg; decay as the closed-form shift-weighted cumulative over the <=types x 63 spine (bounded partitions); anomaly = lag + integer ratio",
    "q218_scd2_history" -> "SCD2 build: lag change-marks and lead/max version-ends share ONE user-keyed exchange; census = one (type) hash agg with the overflow guard riding it",
    "q219_bradley_terry" -> "Bradley-Terry: (user, day, type) hash agg; comparisons join per user-day key (<=types^2 per key, linear); 5 MM rounds on <=types-row frames against checkpointed count matrices",
    "q220_jl_distortion" -> "JL audit: sign matrix broadcast; projection = posexplode + broadcast join + (vec, k) hash agg (16x linear, exact ints); pair audit on consecutive-id keyed joins",
    "q221_mcv_join_estimate" -> "MCV estimate: two map-combinable count aggs; MCVs via TakeOrderedAndProject(32); estimator on two 32-row broadcast frames; exact witness = one ndv-sized keyed join, never corpus x corpus",
    "q222_theil_sen" -> "Theil-Sen: (type, day) hash agg; C(span,2) pair frame per type (span-bounded); medians via type-partitioned windows, no signed integer division anywhere",
    "q223_rendezvous_reshard" -> "rendezvous reshard: 9x linear key x shard explode collapsed by ONE packed-argmax hash agg ((h>>1)*16+shard fills a Long exactly) - no per-key window; mod placement is a map-only projection",
    "q224_xcorr_lag" -> "xcorr lags: one (type, day) hash agg; pair x lag cells live on the span-bounded spine (<=4.5k rows at any corpus size); DECIMAL(38) moments, one final double r")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.md")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // hand-authored epilogue sections (measured studies, e.g. the skew
    // head-to-head) survive regeneration: everything from the first
    // "## Skew:" heading onward is carried over verbatim.
    val epilogue = {
      val p = Paths.get(out)
      if (Files.exists(p)) {
        val old = Files.readString(p)
        // two preserved markers: measured studies ("## Skew:") and the
        // hand-appended executed-plan evidence ("## Epilogue") — whichever
        // comes first survives regeneration verbatim
        val marks = Seq(old.indexOf("\n## Skew:"), old.indexOf("\n## Epilogue"))
          .filter(_ >= 0)
        if (marks.nonEmpty) old.substring(marks.min) else ""
      } else ""
    }

    val all = SparkEntry.queries ++ SparkEntry.perfQueries
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of the headline queries\n\n"
    sb ++= s"Generated by `graft.Plans` at $sfDir. Regenerate: " +
      "`sbt \"runMain graft.Plans PLANS.md /root/testdata/sf0.01\"`.\n\n"
    sb ++= "**Reading a timing next to a plan here?** The canonical " +
      "statement of which\nnumber means what lives in " +
      "`src/main/scala/graft/Bench.scala`'s scaladoc:\nbench medians are " +
      "CONSTRUCTION-inclusive for iterative/tracker queries\n(their " +
      "driver-side loops re-run per pass), while ExecPlan walls — and " +
      "the\nLogicalRDD-rooted plans below for those queries — are " +
      "MATERIALIZATION-only.\nCompare like with like across rounds.\n"
    Headline.foreach { case (name, why) =>
      val df = all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= s"\n## $name\n\n_${why}_\n\n```\n$plan```\n"
    }
    sb ++= epilogue
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
