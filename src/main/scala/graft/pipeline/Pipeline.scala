package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.op.{Dedup, Normalize, PriceGen}
import graft.source.{JsonIngest, Tables}

/** End-to-end pipelines (SURVEY §3) — the reference's DAG-level behavior
  * (O1 sequential tasks, O6 fetch-once) re-expressed as single driver
  * programs composing library operators. Each stage stays lazy; nothing
  * is collected; caching replaces the reference's double-fetch.
  */
object Pipeline {

  /** §3.1 collection run: payloads → decode → normalize (per dialect) →
    * intra-batch dedup (T6) → anti-join existing (T5) → new rows.
    * One shuffle total (the window dedup); the anti-join broadcasts the
    * existing-keys side only while its size estimate fits the broadcast
    * threshold — the accumulated station table outgrows the driver
    * eventually, and a pinned broadcast would OOM instead of degrading
    * to a shuffle join.
    */
  def collect(spark: SparkSession, payloads: Dataset[String],
              dialect: String, existing: DataFrame): DataFrame = {
    val normalized = dialect match {
      case "bp" => JsonIngest.normalizeBp(spark, payloads)
      case "mobil" => JsonIngest.normalizeMobil(spark, payloads)
      case "places" => JsonIngest.normalizePlaces(spark, payloads)
      case other => throw new IllegalArgumentException(s"unknown dialect $other")
    }
    // the tie-break must be a TOTAL order over every non-key column, or
    // the survivor's remaining fields are shuffle-order-dependent
    val deduped = Dedup.firstSeen(normalized.cache(), Seq("location_id"),
      normalized.columns.filterNot(_ == "location_id").map(col).toSeq)
    Dedup.newKeysOnlyAuto(deduped, existing, "location_id")
  }

  /** §3.2 price run: station keys (single-column scan S5) × fuel types
    * (literal S10) → deterministic price (T9) → last-write-wins merge
    * against the same day's existing rows (T10 / S8 semantics).
    */
  def dailyPrices(spark: SparkSession, stations: DataFrame,
                  stationKey: String, existing: Option[DataFrame],
                  date: org.apache.spark.sql.Column): DataFrame = {
    val generated = PriceGen.generate(
      Tables.keyScan(stations, stationKey), stationKey,
      Tables.fuelTypes(spark), date)
    existing match {
      case None => generated
      case Some(old) =>
        // new rows win over existing ones: version 1 beats 0
        Dedup.lastWriteWins(
          old.withColumn("_v", lit(0)).unionByName(generated.withColumn("_v", lit(1))),
          Seq("location_id", "fuel_type", "date"), Seq(col("_v"))).drop("_v")
    }
  }
}
