package graft.source

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Table + payload sources (SURVEY.md §2.1 S1–S6, S10).
  *
  * All readers are declarative DataFrame scans so Catalyst keeps predicate
  * pushdown / column pruning into the parquet (or JDBC) source. At 100 TB
  * the parquet reads are split automatically by
  * `spark.sql.files.maxPartitionBytes`; nothing here collects to the
  * driver.
  */
object Tables {

  /** Read one of the driver-generated test tables. Plain parquet scan:
    * filters and projections placed on the result are pushed into the
    * scan by Catalyst (verify via .explain: PushedFilters / ReadSchema).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` exposes a stable two-column time contract regardless of how
    * the file on disk encodes its timestamp:
    *
    *  - `ts`    — long, nanoseconds since epoch: a total order with full
    *              precision (the engine's internal ordering key).
    *  - `ts_us` — a proper `TIMESTAMP` truncated to microseconds: what
    *              DuckDB / other engines see for the same file.
    *
    * The loader is schema-adaptive because the upstream generator has
    * shipped BOTH encodings over time:
    *
    *  - parquet `timestamp[ns]`: Spark refuses it natively
    *    ([PARQUET_TYPE_ILLEGAL]); we read it via the legacy
    *    nanos-as-long mode, so `ts` arrives as the raw long and `ts_us`
    *    is derived (integer `div 1000`, NOT `/`: double division loses
    *    ulps at 1e18-scale nanos).
    *  - parquet `timestamp[us]`: read natively (as TIMESTAMP_NTZ under
    *    Spark's NTZ inference for non-UTC-adjusted files); `ts_us` is
    *    the value cast to TIMESTAMP (identity wall-clock under the
    *    project's pinned-UTC sessions) and the long `ts` is derived as
    *    `unix_micros * 1000`.
    *
    * Either way every downstream consumer sees identical `ts`/`ts_us`
    * semantics. The nanos-as-long conf is set unconditionally: it only
    * affects parquet schema conversion of int64-nanos columns and is a
    * no-op for a timestamp[us] file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      case _ => // TimestampType or TimestampNTZType (micros on disk)
        val tsUs = col("ts").cast(TimestampType)
        raw.withColumn("ts_us", tsUs)
          .withColumn("ts", unix_micros(tsUs) * lit(1000L))
    }
  }

  /** `embeddings` with the same insurance policy as `events` (above):
    * the upstream generator owns the file encoding and has changed it
    * under the engine once already (round 8: events ns→us). The vector
    * kernels (`functions.VectorExpressions`) require `array<float>`
    * inputs exactly, so an `embedding` column regenerated as
    * `list<double>` — or integer ids regenerated at a different width —
    * would fail analysis across every embedding query. Pin the contract
    * here instead:
    *
    *  - `vec_id`    long
    *  - `embedding` array<float>  (today's on-disk encoding; a double
    *                 re-encoding is narrowed back to float, keeping
    *                 kernel semantics identical)
    *  - `label`     int
    *
    * Columns already at the contract type pass through untouched (no
    * extra Project in today's plans); only a drifted column is cast.
    * Extra columns the generator may add later are preserved as-is.
    *
    * Trade-off, chosen deliberately: if a future file carries doubles
    * that are NOT float-representable, this narrowing keeps the engine
    * at today's float-kernel semantics while an oracle reading the raw
    * file computes on the full doubles — the cosine-verified queries
    * would then hash-mismatch (loudly, per query) instead of the whole
    * embedding family dying at analysis (silently, en masse, as in the
    * round-8 events break).
    */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    withContract(table(spark, sfDir, "embeddings"),
      Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
        "label" -> "int"))

  /** `documents` with the pinned contract schema (see `embeddings`):
    * `doc_id` long, `text`/`lang`/`source` string, `n_chars` long.
    * Identity on today's files; a regenerated int32 `doc_id`/`n_chars`
    * is widened back so join keys and verified output schemas hold.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    withContract(table(spark, sfDir, "documents"),
      Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint"))

  /** Cast each named column to its contract type IF the read schema
    * drifted; a frame already at contract passes through unchanged (so
    * plan-shape assertions and today's behavior are exactly preserved).
    * Missing columns fail loudly here — at the read, with the table
    * name in hand — rather than deep inside an operator's analysis.
    */
  private def withContract(df: DataFrame,
                           contract: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.types.DataType
    val present = df.schema.fieldNames.toSet
    val missing = contract.collect { case (c, _) if !present(c) => c }
    require(missing.isEmpty,
      s"table missing contract columns: ${missing.mkString(", ")} " +
        s"(have: ${present.mkString(", ")})")
    val drifted = contract.filter { case (c, ddl) =>
      df.schema(c).dataType != DataType.fromDDL(ddl)
    }
    drifted.foldLeft(df) { case (acc, (c, ddl)) =>
      acc.withColumn(c, col(c).cast(ddl))
    }
  }

  /** Evolution-tolerant parquet read: `mergeSchema` unions the files'
    * footer schemas, and files written before a column existed
    * null-fill it — the read-side contract that lets a long-lived
    * 100 TB table gain columns without rewriting history. Off by
    * default in Spark because footer-merging touches every file's
    * metadata; turn it on per-read like this, not globally.
    */
  def readEvolved(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  /** S5 — single-column key scan (reference: SELECT location_id FROM
    * gas_station, dag_daily_fuel_price_generation.py:113-114). Column
    * pruning reaches the parquet footer: only `key` is read.
    */
  def keyScan(df: DataFrame, key: String): DataFrame = df.select(key)

  /** S6 — point lookup (reference: SELECT * ... WHERE location_id = %s,
    * dags/entities/gas_station_schema.py:39-43). Equality predicate is
    * pushed into the scan.
    */
  def pointLookup(df: DataFrame, key: String, value: Column): DataFrame =
    df.filter(col(key) === value)

  /** S10 — static literal source (reference base-price dict,
    * dag_daily_fuel_price_generation.py:72-80). `ft_idx` is a stable
    * ordinal used by the deterministic price formula (op/PriceGen).
    */
  def fuelTypes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Unleaded 91", 2.79, 279L, 0L),
      ("Unleaded 95", 2.98, 298L, 1L),
      ("Unleaded 98", 3.11, 311L, 2L),
      ("Diesel", 2.10, 210L, 3L))
      .toDF("fuel_type", "base_price", "base_cents", "ft_idx")
  }
}

/** JSON payload ingestion (S1–S4) + per-source normalization (§1.2, T1–T3).
  *
  * The reference fetches three differently-shaped JSON payloads over HTTP
  * and projects each into the unified gas_station schema. Here the fetch
  * is separated from the parse: `fromPayloadStrings` turns any
  * `Dataset[String]` of raw JSON documents into typed rows, so the same
  * normalization runs over test fixtures, files, or a distributed HTTP
  * fetch (`HttpSource`).
  */
object JsonIngest {
  import org.apache.spark.sql.types.StructType

  /** S4 — decode raw JSON strings with a declared schema (schema-on-read
    * against expectations, like the reference's response.json() + field
    * access). Corrupt records become nulls (PERMISSIVE), mirroring the
    * Places DAGs' .get() null policy rather than BP/Mobil's KeyError.
    */
  def decode(raw: DataFrame, jsonCol: String, schema: StructType): DataFrame =
    raw.withColumn("_parsed", from_json(col(jsonCol), schema))

  /** Strict-dialect helpers: the reference's BP/Mobil DAGs index payloads
    * with `[]` — a missing key raises KeyError → task failure → retry
    * (dag_collection_data_from_bp.py:47-56) — while Places uses `.get()`
    * → silent nulls (dag_collection_data_from_z.py:73-78). `strict=true`
    * (the BP/Mobil default) mirrors fail-fast: unparseable payloads throw
    * (FAILFAST decode), a missing envelope or row id throws; a user
    * relying on "bad BP payload ⇒ run fails loudly" gets exactly that.
    * `strict=false` gives the Places-style permissive/null policy.
    */
  private def jsonOpts(strict: Boolean): Map[String, String] =
    if (strict) Map("mode" -> "FAILFAST") else Map.empty[String, String]

  /** Null envelope/array from a NON-null payload means the JSON parsed
    * but the expected structure is absent — the KeyError case. */
  private def requireOrNull(payload: Column, parsed: Column, what: String): Column =
    when(payload.isNotNull && parsed.isNull,
      raise_error(concat(lit(s"strict parse: $what missing in payload "), payload)))
      .otherwise(parsed)

  /** Fail-on-null-id as a FILTER predicate: a filter changes row counts,
    * so Catalyst can never prune it away (a check hidden in a projected
    * column is dropped the moment a downstream count() stops selecting
    * that column — and then silently stops checking).
    */
  private def requireIdPresent(df: DataFrame, dialect: String): DataFrame =
    df.filter(
      when(col("location_id").isNull,
        raise_error(lit(s"strict parse: $dialect row missing location id")))
        .otherwise(lit(true)))

  /** BP dialect: bare array payload → unified schema
    * (dag_collection_data_from_bp.py:45-57). Fail-fast by default —
    * the reference's `[]` indexing semantics. */
  def normalizeBp(spark: SparkSession, payloads: Dataset[String],
                  strict: Boolean = true): DataFrame = {
    val rows = payloads.toDF("payload")
      .select(col("payload"), from_json(col("payload"),
        org.apache.spark.sql.types.ArrayType(Schemas.bpPayload),
        jsonOpts(strict)).as("rows"))
    val arr = if (strict)
      rows.select(requireOrNull(col("payload"), col("rows"), "BP array").as("rows"))
    else rows.select(col("rows"))
    val base = arr.select(explode(col("rows")).as("r")).select(
      col("r.id").as("location_id"),
      col("r.site_brand").as("brand_name"),
      col("r.name").as("location_name"),
      col("r.lat").as("latitude"),
      col("r.lng").as("longitude"),
      col("r.address").as("address_line1"),
      col("r.city").as("city"),
      col("r.state").as("state_province"),
      col("r.postcode").as("postal_code"),
      col("r.country_code").as("country"))
    if (strict) requireIdPresent(base, "BP")
    else base.filter(col("location_id").isNotNull)
  }

  /** Mobil dialect: `Locations` envelope → unified schema
    * (dag_collection_data_from_mobil.py:45-64). Fail-fast by default —
    * the reference's `[]` indexing semantics. */
  def normalizeMobil(spark: SparkSession, payloads: Dataset[String],
                     strict: Boolean = true): DataFrame = {
    val parsed = payloads.toDF("payload")
      .select(col("payload"),
        from_json(col("payload"), Schemas.mobilEnvelope, jsonOpts(strict)).as("p"))
    val arr = if (strict)
      parsed.select(
        requireOrNull(col("payload"), col("p.Locations"), "Locations envelope").as("rows"))
    else parsed.select(col("p.Locations").as("rows"))
    val base = arr.select(explode(col("rows")).as("r")).select(
      col("r.LocationID").as("location_id"),
      col("r.BrandName").as("brand_name"),
      col("r.LocationName").as("location_name"),
      col("r.Latitude").as("latitude"),
      col("r.Longitude").as("longitude"),
      col("r.AddressLine1").as("address_line1"),
      col("r.City").as("city"),
      col("r.StateProvince").as("state_province"),
      col("r.PostalCode").as("postal_code"),
      col("r.Country").as("country"))
    if (strict) requireIdPresent(base, "Mobil")
    else base.filter(col("location_id").isNotNull)
  }

  /** Places dialect (Z / Pak'nSave): `results` envelope, nested
    * geometry.location (T2), literal defaults (T3), city derived from
    * vicinity's last comma segment (T4)
    * (dag_collection_data_from_z.py:48,55-58,67-81). */
  def normalizePlaces(spark: SparkSession, payloads: Dataset[String]): DataFrame = {
    val parsed = payloads.toDF("payload")
      .select(from_json(col("payload"), Schemas.placesEnvelope).as("p"))
    parsed.select(explode(col("p.results")).as("r")).select(
      col("r.place_id").as("location_id"),
      col("r.name").as("brand_name"),
      col("r.name").as("location_name"),
      col("r.geometry.location.lat").as("latitude"),
      col("r.geometry.location.lng").as("longitude"),
      col("r.vicinity").as("address_line1"),
      graft.op.Normalize.cityAfterLastComma(col("r.vicinity")).as("city"),
      lit("").as("state_province"),
      lit("").as("postal_code"),
      lit("NZ").as("country"))
      .filter(col("location_id").isNotNull)
  }
}

/** S1–S3 with O3 — distributed HTTP JSON source with per-partition fetch
  * and bounded retry.
  *
  * The reference fetches each API on the driver (single-threaded, fetched
  * twice per run — SURVEY §2.3 O6). At scale the URL list is itself a
  * Dataset and the fetch runs on executors: `spark.createDataset(urls)
  * .mapPartitions(fetch)`, so thousands of endpoints/pages are pulled in
  * parallel and the payloads are born distributed.
  *
  * Errors: `Swallow` reproduces the Places DAGs' catch-all → empty-batch
  * policy (dag_collection_data_from_z.py:51-53); `Fail` reproduces
  * BP/Mobil's exception → task failure → retry
  * (dag_collection_data_from_bp.py:31-35 + retries :14).
  */
object HttpSource extends Serializable {
  sealed trait ErrorPolicy extends Serializable
  case object Swallow extends ErrorPolicy
  case object Fail extends ErrorPolicy

  def fetch(spark: SparkSession, urls: Seq[String], retries: Int = 5,
            retryDelayMs: Long = 1000, policy: ErrorPolicy = Fail,
            timeoutMs: Int = 30000): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(urls).mapPartitions { it =>
      it.flatMap { url =>
        def attempt(left: Int): Option[String] =
          try {
            val conn = new java.net.URL(url).openConnection()
              .asInstanceOf[java.net.HttpURLConnection]
            conn.setConnectTimeout(timeoutMs)
            conn.setReadTimeout(timeoutMs)
            try Some(new String(conn.getInputStream.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8))
            finally conn.disconnect()
          } catch {
            case e: Exception if left > 0 =>
              Thread.sleep(retryDelayMs); attempt(left - 1)
            case e: Exception => policy match {
              case Swallow => None
              case Fail => throw e
            }
          }
        attempt(retries)
      }
    }
  }
}
