package graft.model

import org.apache.spark.sql.types._

/** Unified relational model of the reference engine.
  *
  * Mirrors the two tables the reference maintains:
  *  - `gas_station` dimension (reference DDL:
  *    dags/dag_create_gas_station_table.py:23-36)
  *  - `fuel_price` daily fact (reference DDL:
  *    dags/dag_daily_fuel_price_generation.py:83-92)
  *
  * Expressed as Scala case classes so the typed `Dataset[GasStation]` /
  * `Dataset[FuelPrice]` API is available; the schemas below are the
  * DataFrame-side `StructType` twins used at ingestion boundaries.
  */
final case class GasStation(
    location_id: String,
    brand_name: String,
    location_name: String,
    latitude: Option[Double],
    longitude: Option[Double],
    address_line1: String,
    city: String,
    state_province: String,
    postal_code: String,
    country: String)

final case class FuelPrice(
    location_id: String,
    fuel_type: String,
    price: BigDecimal,
    date: java.sql.Date)

object Schemas {

  /** Target unified station schema (reference gas_station DDL). */
  val gasStation: StructType = StructType(Seq(
    StructField("location_id", StringType, nullable = false),
    StructField("brand_name", StringType),
    StructField("location_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("address_line1", StringType),
    StructField("city", StringType),
    StructField("state_province", StringType),
    StructField("postal_code", StringType),
    StructField("country", StringType)))

  /** BP payload row — bare JSON array of these
    * (dag_collection_data_from_bp.py:45-56). */
  val bpPayload: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("site_brand", StringType),
    StructField("name", StringType),
    StructField("lat", DoubleType),
    StructField("lng", DoubleType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postcode", StringType),
    StructField("country_code", StringType)))

  /** Mobil payload — rows wrapped in a `Locations` envelope
    * (dag_collection_data_from_mobil.py:45-63). */
  val mobilRow: StructType = StructType(Seq(
    StructField("LocationID", StringType),
    StructField("BrandName", StringType),
    StructField("LocationName", StringType),
    StructField("Latitude", DoubleType),
    StructField("Longitude", DoubleType),
    StructField("AddressLine1", StringType),
    StructField("City", StringType),
    StructField("StateProvince", StringType),
    StructField("PostalCode", StringType),
    StructField("Country", StringType)))
  val mobilEnvelope: StructType =
    StructType(Seq(StructField("Locations", ArrayType(mobilRow))))

  /** Google Places payload — rows wrapped in `results`, nested
    * `geometry.location` (dag_collection_data_from_z.py:48,67-81). */
  val placesRow: StructType = StructType(Seq(
    StructField("place_id", StringType),
    StructField("name", StringType),
    StructField("geometry", StructType(Seq(
      StructField("location", StructType(Seq(
        StructField("lat", DoubleType),
        StructField("lng", DoubleType))))))),
    StructField("vicinity", StringType)))
  val placesEnvelope: StructType =
    StructType(Seq(StructField("results", ArrayType(placesRow))))

  val fuelPrice: StructType = StructType(Seq(
    StructField("location_id", StringType, nullable = false),
    StructField("fuel_type", StringType, nullable = false),
    StructField("price", DecimalType(5, 2)),
    StructField("date", DateType)))
}
