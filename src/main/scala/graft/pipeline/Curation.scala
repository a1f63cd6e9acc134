package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextDedup}

/** End-to-end training-data curation: the §7.4 operators composed the
  * way a real corpus pipeline runs them —
  *
  *   [scrub] → quality gate → [repetition gate] → normalized exact
  *   dedup → near-dup removal → [benchmark decontamination]
  *
  * Bracketed stages are opt-in (defaults preserve the oracled base
  * chain). Each stage only shrinks the data (filter, dedup,
  * anti-join) — except scrub, a 1:1 rewrite that runs FIRST so every
  * later signature sees redacted text — so the expensive pairwise
  * stage runs on the smallest possible set; at corpus scale the stages
  * checkpoint to parquet between runs, but the composition is one lazy
  * plan here.
  */
object Curation {

  /** @param minQuality     keep docs with quality_score ≥ this
    * @param jaccardThreshold near-dup pairs at/above this lose their
    *                         higher-id member
    * @param maxPostings    document-frequency cap on near-dup shingle
    *                       posting lists — the explicit bound that keeps
    *                       the pairwise stage from going quadratic on a
    *                       boilerplate shingle at corpus scale
    * @param verbose        log pruned-shingle counts (what the cap
    *                       dropped) from the near-dup stage
    * @param scrubPii       redact emails/URLs/digit runs before any
    *                       signature is computed
    * @param maxRepetition  drop docs whose intra-doc n-gram repetition
    *                       ratio exceeds this (boilerplate/spam gate)
    * @param benchmark      decontamination set: docs sharing ≥
    *                       `benchmarkMinOverlap` trigrams with any
    *                       benchmark text are removed last (cheapest
    *                       point: the corpus is already smallest, and
    *                       the benchmark side broadcasts regardless)
    * @param checkpointDir  corpus-scale escape hatch for the mid-chain
    *                       persist: when set, the deduped frame (read
    *                       by BOTH the pairwise stage and the final
    *                       anti-join) is written to
    *                       `checkpointDir/curation_deduped` as parquet
    *                       and read back, instead of a MEMORY_AND_DISK
    *                       persist that is corpus-sized at 100 TB. The
    *                       written stage also survives the session for
    *                       downstream reuse/debugging; the caller owns
    *                       the directory's lifecycle.
    */
  def curate(docs: DataFrame, text: String, id: String,
             minQuality: Double = 0.7,
             jaccardThreshold: Double = 0.3,
             maxPostings: Long = 5000,
             verbose: Boolean = false,
             scrubPii: Boolean = false,
             maxRepetition: Option[Double] = None,
             benchmark: Option[DataFrame] = None,
             benchmarkMinOverlap: Long = 1,
             checkpointDir: Option[String] = None): DataFrame = {
    // r15: fan out before the quality/scrub regex chain — see
    // util.FanOut (no-op on multi-split corpora)
    val docsF = graft.util.FanOut(docs)
    val input = if (!scrubPii) docsF
      else docsF.withColumn(text, TextAnalysis.scrub(col(text)))
    val qualified = TextAnalysis.qualityScore(input, text)
      .filter(col("quality_score") >= minQuality)
    val kept = maxRepetition match {
      case None => qualified
      case Some(maxRep) =>
        qualified.join(
          TextAnalysis.repetitionRatio(input, text, id)
            .filter(col("rep_ratio") > maxRep)
            .select(col("doc").as(id)),
          Seq(id), "left_anti")
    }
    // materialized: consumed by the near-dup candidate stage AND the
    // final anti-join — without it the quality+dedup chain runs twice.
    // Default is a MEMORY_AND_DISK persist (right for bench/test
    // scale); `checkpointDir` swaps it for a parquet write/read, the
    // corpus-scale stage boundary.
    val dedupedPlan = TextDedup.exactNormalized(kept, text, id)
    val deduped = checkpointDir match {
      case None =>
        dedupedPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case Some(dir) =>
        val path = s"$dir/curation_deduped"
        dedupedPlan.write.mode("overwrite").parquet(path)
        docs.sparkSession.read.parquet(path)
    }
    val losers = TextDedup
      .ngramJaccardPairs(deduped, text, id, shingleN = 3,
        threshold = jaccardThreshold, maxPostings = maxPostings,
        verbose = verbose)
      .select(col("id_b").as(id)).distinct()
    val neardupFree = deduped.join(losers, Seq(id), "left_anti")
    val clean = benchmark match {
      case None => neardupFree
      case Some(bench) =>
        TextDedup.decontaminate(neardupFree, text, id, bench, text,
          minOverlap = benchmarkMinOverlap)
    }
    clean.select(col(id), col("n_words").cast("long").as("n_words"),
      col("quality_score"))
  }
}
