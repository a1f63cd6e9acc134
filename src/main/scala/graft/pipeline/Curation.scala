package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{TextAnalysis, TextDedup}

/** End-to-end training-data curation: the §7.4 operators composed the
  * way a real corpus pipeline runs them —
  *
  *   quality gate → normalized exact dedup → near-dup removal
  *
  * Each stage only shrinks the data (filter, dedup, anti-join), so the
  * expensive pairwise stage runs on the smallest possible set; at
  * corpus scale the stages checkpoint to parquet between runs, but the
  * composition is one lazy plan here.
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
    */
  def curate(docs: DataFrame, text: String, id: String,
             minQuality: Double = 0.7,
             jaccardThreshold: Double = 0.3,
             maxPostings: Long = 5000,
             verbose: Boolean = false): DataFrame = {
    val kept = TextAnalysis.qualityScore(docs, text)
      .filter(col("quality_score") >= minQuality)
    // persisted: consumed by the near-dup candidate stage AND the final
    // anti-join — without it the quality+dedup chain runs twice
    val deduped = TextDedup.exactNormalized(kept, text, id)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val losers = TextDedup
      .ngramJaccardPairs(deduped, text, id, shingleN = 3,
        threshold = jaccardThreshold, maxPostings = maxPostings,
        verbose = verbose)
      .select(col("id_b").as(id)).distinct()
    deduped.join(losers, Seq(id), "left_anti")
      .select(col(id), col("n_words").cast("long").as("n_words"),
        col("quality_score"))
  }
}
