package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline
import graft.source.JsonIngest

/** Golden-fixture specs pinning the §1.2 per-source mapping table and
  * the Places null / no-comma edge cases.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("BP dialect: bare array, field renames") {
    val out = JsonIngest.normalizeBp(spark,
      spark.createDataset(Seq(Fixtures.bp))).head()
    assert(out.getAs[String]("location_id") == "bp-001")
    assert(out.getAs[String]("brand_name") == "BP")
    assert(out.getAs[Double]("latitude") == -43.5386)
    assert(out.getAs[String]("country") == "NZ")
  }

  test("Mobil dialect: Locations envelope") {
    val out = JsonIngest.normalizeMobil(spark,
      spark.createDataset(Seq(Fixtures.mobil))).head()
    assert(out.getAs[String]("location_id") == "mob-001")
    assert(out.getAs[String]("state_province") == "Canterbury")
  }

  test("Places dialect: nested geometry, derived city, literal defaults") {
    val out = JsonIngest.normalizePlaces(spark,
      spark.createDataset(Seq(Fixtures.places))).head()
    assert(out.getAs[String]("location_id") == "ChIJxxxx")
    assert(out.getAs[Double]("latitude") == -43.5366)
    assert(out.getAs[String]("city") == "Christchurch") // after last comma
    assert(out.getAs[String]("state_province") == "")
    assert(out.getAs[String]("postal_code") == "")
    assert(out.getAs[String]("country") == "NZ")
  }

  test("Places dialect: missing geometry -> null coords; no-comma vicinity -> empty city") {
    val payload =
      """{"results": [{"place_id": "p1", "name": "X", "vicinity": "NoCommaTown"}]}"""
    val out = JsonIngest.normalizePlaces(spark,
      spark.createDataset(Seq(payload))).head()
    assert(out.isNullAt(out.fieldIndex("latitude")))
    assert(out.getAs[String]("city") == "")
  }

  test("collection pipeline: intra-batch dedup + anti-join vs existing") {
    // batch has a dup key AND a key already in `existing` (SURVEY §5 fixture)
    val batch =
      """{"results": [
        {"place_id": "new-1", "name": "A", "vicinity": "x, CityA"},
        {"place_id": "new-1", "name": "A-dup", "vicinity": "x, CityA"},
        {"place_id": "old-1", "name": "B", "vicinity": "y, CityB"}]}"""
    val existing = Seq("old-1").toDF("location_id")
    val out = Pipeline.collect(spark,
      spark.createDataset(Seq(batch)), "places", existing)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("location_id") == "new-1")
    assert(rows.head.getAs[String]("brand_name") == "A") // first-seen wins
  }
}
