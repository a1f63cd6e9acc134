package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.op.Normalize

/** Typed Dataset surface over the unified station model — the Spark
  * equivalent of the reference's `GasStation` entity class
  * (dags/entities/gas_station_schema.py:1-44): compile-time field
  * checks where the schema is fixed, while everything lowers to the
  * same Catalyst plans as the DataFrame API.
  */
object GasStationOps {

  /** Lift a conforming DataFrame into the typed Dataset. */
  def typed(df: org.apache.spark.sql.DataFrame): Dataset[GasStation] = {
    import df.sparkSession.implicits._
    df.as[GasStation]
  }

  /** Reference `get_full_address` (gas_station_schema.py:17-21) as a
    * derived column over the typed Dataset.
    */
  def withFullAddress(ds: Dataset[GasStation]): org.apache.spark.sql.DataFrame =
    ds.withColumn("full_address", Normalize.fullAddress(
      col("address_line1"), col("city"), col("state_province"),
      col("country"), col("postal_code")))

  /** Reference `to_dict` (gas_station_schema.py:23-35): row → JSON. */
  def toJsonDocs(ds: Dataset[GasStation]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.select(to_json(struct(ds.columns.map(col): _*))).as[String]
  }

  /** Reference `from_database` point lookup (gas_station_schema.py:37-44):
    * the N+1 per-key SELECT becomes a pushed-down equality filter.
    */
  def byLocationId(ds: Dataset[GasStation], locationId: String): Dataset[GasStation] =
    ds.filter(col("location_id") === locationId)

  /** Typed aggregation example: stations per brand (T7 shape) using the
    * Dataset groupByKey API.
    */
  def countByBrand(ds: Dataset[GasStation]): Dataset[(String, Long)] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.brand_name).count()
  }
}
