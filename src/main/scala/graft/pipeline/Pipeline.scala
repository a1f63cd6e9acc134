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
    merge(existing, generated)
  }

  /** O2 backfill/catchup analog. The reference's Mobil DAG leaves
    * Airflow `catchup` enabled (dag_collection_data_from_mobil.py:16-21)
    * so missed schedule days are replayed; this is the batch twin:
    * reprocess an INCLUSIVE historical date range through the price
    * pipeline and last-write-wins-merge the result over the existing
    * table. The range is exploded as a DATE COLUMN, so replaying three
    * years is ONE distributed job (stations × fuels × days), not a
    * thousand sequential DAG runs — the scheduler loop becomes a
    * dimension of the plan. Generation is deterministic per (station,
    * fuel type, date), so the operation is idempotent: replaying an
    * already-processed range converges to the same table (T10
    * semantics), and overlapping re-runs commute.
    */
  def backfillPrices(spark: SparkSession, stations: DataFrame,
                     stationKey: String, existing: Option[DataFrame],
                     from: java.time.LocalDate,
                     to: java.time.LocalDate): DataFrame = {
    require(!to.isBefore(from), s"backfill range is empty: $from > $to")
    val dates = spark.range(1).select(explode(sequence(
      lit(java.sql.Date.valueOf(from)), lit(java.sql.Date.valueOf(to)),
      expr("interval 1 day"))).as("date"))
    // date dimension broadcasts (days are few, stations are many): the
    // station side never shuffles, exactly like the fuel-type side
    val keyedDays = Tables.keyScan(stations, stationKey)
      .crossJoin(broadcast(dates))
    val generated = PriceGen.generate(keyedDays, stationKey,
      Tables.fuelTypes(spark), col("date"))
    merge(existing, generated)
  }

  /** Replayed rows win over existing ones: version 1 beats 0; equal
    * regenerated values make the merge a fixpoint (idempotent replay).
    */
  private def merge(existing: Option[DataFrame], generated: DataFrame): DataFrame =
    existing match {
      case None => generated
      case Some(old) =>
        Dedup.lastWriteWins(
          old.withColumn("_v", lit(0)).unionByName(generated.withColumn("_v", lit(1))),
          Seq("location_id", "fuel_type", "date"), Seq(col("_v"))).drop("_v")
    }
}
