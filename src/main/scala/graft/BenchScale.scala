package graft

import org.apache.spark.sql.SparkSession

/** Scale-trend harness: times a set of queries at sf0.001 / 0.01 /
  * 0.1 in one JVM and prints the fitted per-decade scaling exponent —
  * `alpha` in t ∝ sf^alpha, measured between the two largest SFs
  * (the smallest SF is floor-dominated by fixed per-job overhead, so
  * it is reported but not fitted). alpha ≈ 0 → overhead-bound;
  * alpha ≈ 1 → linear in data (the target for scans/aggs/joins);
  * alpha > 1.2 → superlinear, a scale smell worth a plan audit.
  *
  * `runMain graft.BenchScale [q_x q_y ...]` — defaults to the
  * heaviest queries from the round benches. Output lands in PLANS.md's
  * scale-trend table.
  */
object BenchScale {
  private val DEFAULTS = Seq(
    "q_ngram_prefix", "q_curate_full", "q_profile", "q_communities",
    "q_bigram_surprisal", "q_recursive_sql", "q_bpe_apply",
    "q_shortest_path", "q_cms_portable", "q_top50_partners",
    "q_ngram_jaccard", "q_minhash_pairs", "q_semantic_dedup", "q_maxsim",
    "q_substring_dedup", "q_substring_dedup_var", "q_ngram_perplexity",
    "q_stream_outer_join",
    // round-7 bench drift watch (sub-tripwire drifts adjudicated as
    // host noise in VERDICT r7 — kept here so the steady-state numbers
    // stay on record)
    "q_simhash_pairs", "q_ppr", "q_gap_fill",
    // round-8 bench drift watch: the driver's [bench-regress] flags
    // (q_twap, q_scd2_pit) plus the >1.5x r7->r8 movers with no code
    // diff that round — VERDICT r8 adjudicated data-regeneration/noise
    // but asked for steady-state alpha rows on record
    "q_twap", "q_scd2_pit", "q_trade_ranks", "q_tfidf", "q_hops",
    "q_repetition", "q_triangles",
    // round-9 incremental-counts rewrite: fixed-overhead-bound at test
    // SFs by design (see PLANS.md q_bpe_merges) — kept on record
    "q_bpe_merges",
    // round-9 bench drift watch: the r9 [bench-regress] flag (2.0x on
    // an untouched code path) read 0.69s steady-state vs the 1.73s
    // flagged cell — host noise, row kept on record
    "q_media_decode",
    // round-10/11 drift watch (VERDICT r10 item 7): the decode-bound
    // pair + session windows — r11 steady-state read α 0.32/0.43/0.30,
    // far under the flagged r10 cells; kept so future drift lands on a
    // recorded baseline
    "q_image_phash", "q_session_window",
    // round-11 additions: multi-table LSH probe + the four-way recall
    // harness + the two new increments
    "q_embed_ann_multi", "q_embed_ann_probe", "q_ann_recall",
    "q_incremental_substring", "q_incremental_clusters",
    "q_stream_incr_neardup", "q_stream_incr_exact",
    "q_stream_incr_semantic", "q_ingest_quartet",
    // round-12 evidence debt (VERDICT r12 item 1): the six r12
    // operators' standing alpha rows
    "q_embed_pq", "q_embed_ivfpq", "q_quantizer_refresh",
    "q_cluster_retraction", "q_stream_incr_substring",
    "q_stream_incr_clusters",
    // round-13 additions: normalized IVF-PQ, wide-phash image
    // near-dup, store compaction, the composed streaming quartet
    "q_embed_ivfpq_norm", "q_image_neardup", "q_stream_compaction",
    "q_stream_ingest_quartet",
    // round-14 additions: the JL/MMR/digest trio landed with their own
    // rows above; the binary quantization tier rides the recall
    // harness too, so both stay on record
    "q_embed_rp", "q_mmr_rerank", "q_digest_merge", "q_digest_retract",
    "q_stream_manifest", "q_manifest_asof", "q_embed_binary",
    // round-15: the X164/X165 DQ pair (landed r14 without bench rows —
    // the evidence-debt payoff) plus the new r15 operators
    "q_dq_suite", "q_quarantine", "q_mmr_binary",
    "q_top50_import_partners", "q_incremental_image_neardup",
    "q_stream_dq", "q_stream_incr_image_neardup", "q_dq_approx",
    "q_fingerprint_retraction", "q_ingest_gated", "q_schema_drift",
    "q_neardup_recall", "q_water_fill", "q_budget_trim",
    "q_stream_quarantine", "q_dq_by_group",
    // round-16: sig-collapse hot-bucket fix (watch the fingerprint
    // family) + the audio modality gate
    "q_incremental_audio_neardup", "q_dq_group_drift",
    "q_deadletter_readmit", "q_quality_dedup", "q_dq_ref", "q_dq_fd",
    "q_stream_dq_group", "q_dq_order", "q_retrieval_metrics",
    "q_dist_drift", "q_dq_embed", "q_ttl_dedup", "q_hier_water_fill",
    "q_stream_dist_drift", "q_bloom_portable", "q_vocab_coverage",
    "q_dist_drift_group", "q_incremental_canonical",
    "q_canonical_retraction", "q_stream_canonical",
    // round-15 bench drift watch: the one noisy full-bench run's
    // >1.5x flags on untouched paths (adjudicated host noise —
    // steady-state 1.11 s / 0.96 s vs flagged 1.46 / 1.68); rows kept
    // on record per the r8/r9 convention
    "q_stream_dedup", "q_linear_quality",
    // round-17 additions: filtered ANN pair, incremental IVF-PQ store
    // (batch + streaming), wide audio near-dup, streaming TTL dedup,
    // semantic decontamination — plus q_range_join (one noisy-run
    // 1.6x flag on an untouched path, steady-state row for the
    // adjudication record)
    "q_filtered_ann", "q_filtered_ann_recall", "q_incremental_ivfpq",
    "q_stream_ivfpq_codes", "q_audio_neardup", "q_stream_ttl_dedup",
    "q_semantic_decontam", "q_range_join",
    "q_video_neardup", "q_incremental_video_neardup",
    "q_stream_incr_video_neardup")

  def main(args: Array[String]): Unit = {
    val queryNames = if (args.nonEmpty) args.toSeq else DEFAULTS
    val sfs = Seq("0.001", "0.01", "0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, sfDir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    // one untimed warm pass at the smallest SF (JVM/codegen warmup must
    // not land on the first timed cell), then min-of-two per cell
    queryNames.foreach(q => time(q, "/root/testdata/sf0.001"))
    println(f"${"query"}%-22s ${"sf0.001"}%8s ${"sf0.01"}%8s ${"sf0.1"}%8s ${"alpha"}%7s")
    queryNames.foreach { q =>
      val ts = sfs.map { sf =>
        val dir = s"/root/testdata/sf$sf"
        math.min(time(q, dir), time(q, dir))
      }
      // fitted on the top decade only: log10(t_0.1 / t_0.01)
      val alpha = math.log10(ts(2) / ts(1))
      println(f"$q%-22s ${ts(0)}%8.2f ${ts(1)}%8.2f ${ts(2)}%8.2f $alpha%7.2f")
    }
    spark.stop()
  }
}
