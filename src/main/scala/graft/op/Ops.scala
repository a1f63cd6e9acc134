package graft.op

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** String / row normalization operators (SURVEY §2.2 T4, T12, T13). */
object Normalize {

  /** T4 — reference `get_value_after_last_comma`
    * (dag_collection_data_from_z.py:55-58): substring after the last
    * comma, trimmed; empty string when no comma. Pure codegen'd builtin
    * expressions — stays inside WholeStageCodegen.
    */
  def cityAfterLastComma(c: Column): Column =
    when(c.isNotNull && c.contains(","),
      trim(element_at(split(c, ","), -1))).otherwise(lit(""))

  /** T12 — reference `GasStation.get_full_address`
    * (dags/entities/gas_station_schema.py:17-21): comma-joined address
    * with the postal code appended only when present.
    */
  def fullAddress(addressLine1: Column, city: Column, stateProvince: Column,
                  country: Column, postalCode: Column): Column = {
    val base = concat_ws(", ", addressLine1, city, stateProvince, country)
    when(postalCode.isNotNull && postalCode =!= "",
      concat(base, lit(" "), postalCode)).otherwise(base)
  }

  /** T13 — reference `GasStation.to_dict`
    * (dags/entities/gas_station_schema.py:23-35): row → JSON document.
    */
  def rowToJson(cols: Seq[Column]): Column = to_json(struct(cols: _*))
}

/** Key-based deduplication operators (SURVEY §2.2 T5, T6, T10).
  *
  * The reference implements all three as driver-side N+1 SQL loops
  * (1 SELECT COUNT + conditional INSERT per row); here each collapses to
  * one distributed plan with a single shuffle — or zero shuffles when the
  * existing-keys side broadcasts.
  */
object Dedup {

  /** T5 — "insert only if the key is not already present"
    * (dag_collection_data_from_bp.py:61-64 et al.) ≡ anti-join of the
    * new batch against existing keys. When `existing` is a small
    * dimension (the common daily-batch case) pass `hintBroadcast=true`
    * to pin a BroadcastHashJoin: the batch side then never shuffles.
    */
  def newKeysOnly(batch: DataFrame, existing: DataFrame, key: String,
                  hintBroadcast: Boolean = false): DataFrame = {
    val keys = existing.select(key).distinct()
    batch.join(if (hintBroadcast) broadcast(keys) else keys,
      Seq(key), "left_anti")
  }

  /** T5, size-conditional: broadcast the existing-keys side only while
    * Catalyst's size estimate fits under the session's
    * autoBroadcastJoinThreshold. An accumulated station table grows
    * without bound — a pinned broadcast that is right today OOMs the
    * executors in a year; past the threshold this falls back to a
    * shuffle join (and AQE may still convert it back at runtime if the
    * estimate was pessimistic).
    */
  def newKeysOnlyAuto(batch: DataFrame, existing: DataFrame, key: String): DataFrame = {
    val keys = existing.select(key).distinct()
    val conf = existing.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    // "-1" (broadcast disabled) fails byteStringAsBytes' size regex —
    // any unparseable value means "do not pin a broadcast"
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
      catch { case _: NumberFormatException => -1L }
    val estimate = keys.queryExecution.optimizedPlan.stats.sizeInBytes
    val fits = threshold > 0 && estimate <= threshold
    batch.join(if (fits) broadcast(keys) else keys, Seq(key), "left_anti")
  }

  /** T6 — intra-batch first-seen-wins dedup (the reference's read-your-
    * own-writes COUNT probe makes the first row per location_id win).
    * `dropDuplicates` is shuffle-order-nondeterministic, so we use an
    * explicit total order: the caller supplies tie-breaking sort columns.
    */
  def firstSeen(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** T10 — last-write-wins merge, the reference's
    * `ON CONFLICT ... DO UPDATE SET price = EXCLUDED.price`
    * (dag_daily_fuel_price_generation.py:120-125): per merge key keep
    * the latest row by `version` (descending). One shuffle on the merge
    * key; at 100 TB pre-partition/bucket the fact table by the same key
    * so repeated merges reuse the partitioning.
    */
  def lastWriteWins(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}

/** Daily price generation (SURVEY §2.2 T8, T9, T11; §3.2).
  *
  * Reference shape: driver-side nested loop stations × 4 fuel types with
  * `random.uniform(base-0.37, base+0.23)` per pair
  * (dag_daily_fuel_price_generation.py:116-125). Here: one broadcast
  * cross join (4-row side broadcasts; zero shuffle of the station side)
  * and a *deterministic* pseudo-random price so results are reproducible
  * and oracle-checkable.
  */
object PriceGen {

  /** T9 — deterministic surrogate for `round(uniform(base-0.37,
    * base+0.23), 2)`: a Knuth multiplicative hash of (station key,
    * fuel-type ordinal) mapped onto the same 0.60-wide price band in
    * integer cents, so no float rounding is involved. Identical
    * arithmetic is expressible in any ANSI SQL engine. Numeric keys
    * only — string business keys go through [[keyAsNumeric]] first
    * (ANSI mode would otherwise throw CAST_INVALID_INPUT).
    */
  def priceCents(stationKey: Column, ftIdx: Column, baseCents: Column): Column =
    baseCents - lit(37L) +
      pmod(stationKey * lit(2654435761L) + ftIdx * lit(7919L), lit(61L))

  /** Deterministic numeric surrogate for a string business key (the
    * unified model's location_id is VARCHAR). Bounded so the multiply
    * in priceCents cannot overflow Long.
    */
  def keyAsNumeric(key: Column): Column = pmod(xxhash64(key), lit(1000000007L))

  def price(stationKey: Column, ftIdx: Column, baseCents: Column): Column =
    (priceCents(stationKey, ftIdx, baseCents) / lit(100.0)).as("price")

  /** T8 + T9 + T11 — the whole price pipeline: every station × every
    * fuel type, deterministic price, dated (T11: the reference uses
    * CURRENT_DATE; callers pass a date column for reproducibility).
    */
  def generate(stations: DataFrame, stationKey: String,
               fuelTypes: DataFrame, date: Column): DataFrame = {
    // string business keys hash to a bounded numeric key for the price
    // formula; numeric keys use the oracle-portable arithmetic directly
    val numericKey = stations.schema(stationKey).dataType match {
      case org.apache.spark.sql.types.StringType => keyAsNumeric(col(stationKey))
      case _ => col(stationKey)
    }
    stations.crossJoin(broadcast(fuelTypes))
      .select(
        col(stationKey).as("location_id"),
        col("fuel_type"),
        price(numericKey, col("ft_idx"), col("base_cents")),
        date.as("date"))
  }

  /** Typed surface: the generated prices as Dataset[FuelPrice] with the
    * reference's DECIMAL(5,2) price type
    * (dag_daily_fuel_price_generation.py:88).
    */
  def generateTyped(stations: DataFrame, stationKey: String,
                    fuelTypes: DataFrame, date: Column)
  : org.apache.spark.sql.Dataset[graft.model.FuelPrice] = {
    val df = generate(stations, stationKey, fuelTypes, date)
      .select(col("location_id").cast("string").as("location_id"),
        col("fuel_type"),
        col("price").cast(org.apache.spark.sql.types.DecimalType(5, 2)).as("price"),
        col("date"))
    import df.sparkSession.implicits._
    df.as[graft.model.FuelPrice]
  }
}
