package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scale-stress driver for the dedup/curation family: runs the heavy
  * registered queries plus their cap AUDITS against a corpus built by
  * tools/make_scale_corpus.py (a copies-fold self-union with exact
  * clones, near-dup families, and boilerplate shingles planted far
  * over maxPostings/maxBucket), and emits one JSON line per step plus
  * a summary line.
  *
  * Purpose (round-5 verdict #1): at the shipped test scales the
  * df-prune and bucket caps are no-ops, so "the caps bound the work"
  * rested on design reading. This main produces the measurement: audit
  * counters engaging (nonzero pruned shingles / dropped buckets),
  * candidate-pair counts staying bounded, and wall times for the
  * scaling curve recorded in TUNING.md.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=24g \
  *     sbt "runMain graft.ScaleStress <dir> <outJson>"
  *
  * SPARK_DRIVER_MEM sizes the FORKED run JVM (build.sbt javaOptions;
  * default 8g — enough for x1, while the x5/x15 copies-fold corpora
  * need 24g; SBT_OPTS only sizes the sbt launcher and does NOT reach
  * the forked JVM).
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val Array(dir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // spill-aware sizing knob: at the bigger stress corpora the pair
    // aggregations need MORE partitions than cores so each task's hash
    // buffers fit the per-task heap share (the same lever a real
    // cluster turns; see TUNING.md scale-stress section)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    var spark = newSession()
    val sb = new StringBuilder
    def rootCause(e: Throwable): String = {
      var c = e
      val chain = new StringBuilder(e.toString.take(300))
      while (c.getCause != null && (c.getCause ne c)) {
        c = c.getCause
        chain.append(" <- ").append(c.toString.take(300))
      }
      chain.toString.take(1200)
    }
    def step(name: String)(body: SparkSession => Map[String, Any]): Unit = {
      // a step that kills the SparkContext must not cascade: rebuild
      if (spark.sparkContext.isStopped) {
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        spark = newSession()
      }
      val t0 = System.nanoTime()
      val extra =
        try body(spark)
        catch { case e: Throwable => Map("error" -> rootCause(e)) }
        // the library's documented cache contract (TextDedup class doc,
        // same hygiene as Verify/Bench): release per-query persists
        // between steps — otherwise the CacheManager can hand a later
        // query a plan fragment cached by an earlier one and trip the
        // canonicalized-plan NPE at stress scale. The checkpointed
        // artifact caches (pair graph, labels, IVF) survive this by
        // design, so probe steps still amortize.
        finally { try spark.catalog.clearCache() catch { case _: Throwable => () } }
      val sec = (System.nanoTime() - t0) / 1e9
      // full JSON string escaping (graft.util.Json, shared with
      // Verify/Bench): error chains carry backslashes, newlines, and
      // tabs that a quote-only replace would emit as invalid JSON
      val kv = (Map[String, Any]("step" -> name,
        "sec" -> math.round(sec * 1000) / 1000.0) ++ extra)
        .map {
          case (k, v: String) => s""""$k":${graft.util.Json.quote(v)}"""
          case (k, v) => s""""$k":$v"""
        }.mkString("{", ",", "}")
      println(s"STRESS $kv")
      sb.append(kv).append('\n')
    }

    step("corpus")(s => Map(
      "n_docs" -> s.read.parquet(s"$dir/documents.parquet").count(),
      "dir" -> dir))

    // cap audits — these MUST be nonzero on the stress corpus
    step("audit_overcap_shingles") { s =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val oc = graft.ext.TextDedup.overCapShingles(docs, "text", "doc_id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.max("doc_freq"),
            org.apache.spark.sql.functions.lit(0L)),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum("doc_freq"),
            org.apache.spark.sql.functions.lit(0L))).head()
      Map("overcap_shingles" -> oc.getLong(0), "max_df" -> oc.getLong(1),
        "pruned_posting_rows" -> oc.getLong(2))
    }
    step("audit_minhash_dropped_buckets") { s =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val db = graft.ext.TextDedup.minhashDroppedBuckets(
        docs, "text", "doc_id").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.max("n_docs"),
          org.apache.spark.sql.functions.lit(0L))).head()
      Map("dropped_buckets" -> db.getLong(0), "max_bucket" -> db.getLong(1))
    }

    step("audit_overcap_fingerprints") { s =>
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val fps = graft.ext.TextDedup.winnowingFingerprints(
        docs, "text", "doc_id")
        .select(org.apache.spark.sql.functions.col("doc"),
          org.apache.spark.sql.functions.col("fp")).distinct()
      val oc = graft.ext.TextDedup.overCapFingerprints(fps)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.max("doc_freq"),
            org.apache.spark.sql.functions.lit(0L))).head()
      Map("overcap_fingerprints" -> oc.getLong(0),
        "max_fp_df" -> oc.getLong(1))
    }

    // the graded queries, in artifact-reuse order: the pair-graph build
    // is priced by the first consumer, the probes show the amortized cost
    val names = Seq("ns_dedup_ngram_jaccard", "ns_containment",
      "ns_dedup_clusters", "ns_dedup_survivors", "ns_dup_ngram_fraction",
      "ns_dedup_minhash", "ns_dedup_exact", "ns_block_dedup",
      "ns_substring_dedup", "ns_curation_pipeline", "ns_ann_lsh",
      // round-6 additions that read the stress corpus: the leakage
      // audit probes the pair graph (boilerplate-skew territory), the
      // source cap hits the clone-heavy source distribution, bm25
      // routing prices the token explode at scale, and the PQ tiers
      // price code-scan ANN on the densified embedding clones
      "ns_split_leakage", "ns_source_cap", "ns_bm25_route",
      "ns_pq_topk", "ns_ivfpq_topk", "ns_ann_multitable",
      // continued-session additions: winnowing prices the fingerprint
      // artifact then its two probes amortize; source-overlap stresses
      // the per-shingle collect_set under the clone-heavy sources;
      // quality/mix/collocations price the map-side + dimension-
      // broadcast family at scale
      "ns_winnow_fingerprints", "ns_winnow_matches", "ns_winnow_cross",
      "ns_source_overlap", "ns_quality_model", "ns_quality_by_source",
      "ns_collocations", "ns_temperature_mix", "ns_token_mix",
      "ns_simpson_diversity",
      // round-9: both simhash forms, so the portable 32-bit twin's
      // weak-hash pair growth is measured against the 64-bit xxhash64
      // production form on the same clone-planted corpus (the winnow
      // portable-vs-xxhash lesson, TUNING.md)
      "ns_dedup_simhash", "ns_dedup_simhash_portable",
      // round-9 continued: the bloom admission guard prices the sketch
      // build + verify join under a clone-heavy (dup-majority) batch;
      // semdedup prices the within-cell dominance join when every
      // vector has 4 exact clones in its cell
      "ns_bloom_dedup", "ns_semdedup",
      // round-9 third continued session: ppjoin prices the LOSSLESS
      // prefix join on the clone-heavy corpus (every clone family is a
      // guaranteed-output clique, so cost tracks the true answer, not
      // a cap); the boilerplate strip prices the line-df shuffle + the
      // per-doc positional regroup
      "ns_ppjoin", "ns_boilerplate_lines",
      // round-9 fourth continued session: sparse cosine prices the
      // idf-weighted posting self-join on the clone-heavy corpus
      // (clone families are guaranteed high-cosine cliques — cost
      // tracks the true answer); cms/feature-hash price the portable-
      // hash map-side family (the stress corpus carries documents +
      // embeddings only, so the event-family additions stay at the
      // bench scale)
      "ns_sparse_cosine", "ns_cms_counts", "ns_feature_hash",
      // round-10: the iterative-graph heavy — the stress corpus now
      // clones events with remapped user/event ids, so PageRank runs
      // on a copies-fold bipartite graph (per-round localCheckpoint
      // lineage cuts are what this step proves at depth)
      "t_pagerank_events",
      // round-11: the incremental fold family on the clone-heavy
      // corpus — the bloom guard faces a dup-majority batch, the
      // cross probe faces engaged maxPostings caps (22 over-cap
      // shingles at x5), and the indexed form's stored postings +
      // df summary must prune identically to the text-derived path
      "ns_incremental_curation", "ns_incremental_probe",
      "ns_incremental_probe_indexed",
      // round-12: the other two incremental folds — the BM25 index
      // faces the clone-heavy vocabulary (boilerplate terms land in
      // few hash partitions, pruning still holds), the IVF fold's
      // drift audit faces a 90/10 split of the cloned embeddings
      "ns_bm25_incremental", "ns_ivf_incremental",
      "ns_winnow_incremental",
      // round-12 continued: the minhash band-index fold — the probe
      // faces the signature-degenerate template family (its buckets
      // exceed maxBucket across folds, so the match-time cap must
      // drop them exactly as a one-shot build would)
      "ns_minhash_incremental", "ns_minhash_inc_probe",
      // the signature fold faces the same degenerate template family;
      // its probe must stay signature-only (no text fetch) at scale
      "ns_simhash_incremental", "ns_simhash_inc_probe",
      // third session: the SemDedup fold faces the densified embedding
      // clones — every planted clone family shares a sign cell, so
      // within-cell dominance does the full kill at fold time and the
      // folded survivors must equal the one-shot's
      "ns_semdedup_incremental",
      // fourth session: the connected-components fold faces a pair
      // graph where clone families are large cliques split across the
      // three arrival batches — the delta-contraction + flat-redirect
      // invariant has to hold through heavy cross-batch merges; the
      // CMS fold re-prices the portable-hash token pass batch-wise
      "ns_cc_incremental", "ns_cms_incremental",
      // fifth session: the composite nightly fold chains curation
      // admission into every maintained index on the clone-heavy
      // corpus (admission kills most clones, so the downstream folds
      // see the SURVIVOR distribution — the composite's real shape);
      // the derived probes price vocab ranking over the audit deltas
      // and the tf-idf matrix read off the folded postings; the as-of
      // probe prices time travel over the versioned profile deltas
      "ns_nightly_pipeline", "ns_vocab_incremental",
      "ns_tfidf_incremental", "ns_stats_asof",
      // retraction on the clone-heavy corpus: retracting every fifth
      // id hits exact-dup keepers (clone families promote) and
      // near-dup winners (tombstones resurrect) at stress density
      "ns_retract_curation", "ns_retract_indexed",
      "ns_nightly_retract", "ns_semdedup_retract", "ns_cc_retract",
      // round 13: the persisted LSH ANN tier (fold + retract + probe
      // on the densified embedding clones), the embedding-side
      // composite nightly both directions, and the FLAC frame codec
      // (verbatim/fixed/LPC subframes decoded per doc id)
      "ns_ann_lsh_incremental", "ns_nightly_embed",
      "ns_nightly_embed_retract", "ns_multimodal_flac_embed")
    // dev iteration: SPARK_GRAFT_STRESS_ONLY=name1,name2 runs just
    // those query steps (audits and corpus stats always run)
    val only = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_STRESS_PASSES=N repeats each query step (suffixed
    // _p2.._pN) — pass 1 prices cold artifact builds (probe base
    // state, IVF/PQ indexes), later passes the warm amortized probe,
    // the split the crossover tables in TUNING.md need
    val passes = sys.env.get("SPARK_GRAFT_STRESS_PASSES")
      .flatMap(_.toIntOption).getOrElse(1).max(1)
    names.filter(q => only.forall(_.contains(q))).foreach { q =>
      for (p <- 1 to passes) {
        val nm = if (p == 1) q else s"${q}_p$p"
        step(nm)(s => Map("rows" -> SparkEntry.queries(q)(s, dir).count()))
      }
    }
    step("release_artifacts") { s =>
      SparkEntry.releaseArtifacts(s, dir)
      Map()
    }
    Files.write(Paths.get(outPath), sb.toString.getBytes)
    spark.stop()
  }
}
