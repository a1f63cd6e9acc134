package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Delimited / line-JSON file ingestion with explicit malformed-row
  * policy — the flat-file side of the ingestion surface (the HTTP JSON
  * dialects are in [[JsonIngest]]; this is what the same pipelines read
  * when the provider drops files instead of serving an API).
  *
  * Policy contract (mirrors the JSON dialects' strict/permissive split,
  * SURVEY §2.1):
  *  - `Strict`  — FAILFAST: any malformed line kills the read loudly
  *    (the reference's KeyError stance: bad upstream data should stop
  *    the run, not leak nulls downstream).
  *  - `Keep`    — PERMISSIVE + `_corrupt_record`: malformed lines
  *    survive as raw text in the corrupt column for quarantine/audit
  *    (the load-then-triage pattern; pair with a DataQuality rule on
  *    `_corrupt_record IS NOT NULL`).
  *  - `Drop`    — DROPMALFORMED: malformed lines vanish silently. Only
  *    for sources whose garbage rate is an accepted contract; the audit
  *    twin is a `Keep` read compared by count. SHARP EDGE (pinned in
  *    IngestFilesSpec): malformedness is judged only on the columns a
  *    query actually reads — under column pruning, `count()` parses
  *    nothing and drops nothing, so the same file can "have" different
  *    row counts per query. Prefer `Keep` + a DataQuality rule when
  *    the count matters.
  *
  * The explicit schema is REQUIRED, not inferred: schema inference
  * costs a full extra pass over 100 TB and silently re-types columns
  * when a batch's value range shifts — the generator-owned-encoding
  * lesson (NOTES.md) applied to flat files.
  */
object TextSources {

  sealed trait Malformed { private[source] def mode: String }
  case object Strict extends Malformed { private[source] val mode = "FAILFAST" }
  case object Keep extends Malformed { private[source] val mode = "PERMISSIVE" }
  case object Drop extends Malformed { private[source] val mode = "DROPMALFORMED" }

  private def corrupted(schema: StructType, policy: Malformed): StructType =
    if (policy == Keep) schema.add("_corrupt_record", "string")
    else schema

  /** CSV with header, explicit schema, and the malformed policy. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          policy: Malformed = Strict, header: Boolean = true,
          delimiter: String = ","): DataFrame =
    spark.read
      .schema(corrupted(schema, policy))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", policy.mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Newline-delimited JSON with explicit schema + policy. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
                policy: Malformed = Strict): DataFrame =
    spark.read
      .schema(corrupted(schema, policy))
      .option("mode", policy.mode)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
