package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.types._

/** Sinks (SURVEY §2.1 S7–S9, S11).
  *
  * The reference writes row-at-a-time over psycopg2 (2 round-trips per
  * row); these sinks are batched and partition-parallel. Parquet writes
  * use Spark's file-commit protocol, so a job is all-or-nothing at the
  * output-commit level — the reference's single-commit transaction (S11)
  * maps onto that for free. JDBC writes get per-partition transactions.
  */
object Sinks {

  /** Date-partitioned parquet sink for the fuel_price fact table.
    * Partitioning by date gives partition pruning for the dominant
    * access pattern (one day / date range) — at 100 TB this is the
    * difference between scanning one day and scanning years.
    */
  def parquetByDate(df: DataFrame, path: String,
                    dateCol: String = "date",
                    mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).partitionBy(dateCol).parquet(path)

  /** S7 — batched append to a JDBC table (replaces the reference's
    * per-row INSERT loops, dag_collection_data_from_bp.py:66-76).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: java.util.Properties = new java.util.Properties,
                 batchSize: Int = 10000): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }

  /** S9 — create-if-not-exists DDL for a JDBC target, generated from the
    * DataFrame schema (reference: dag_create_gas_station_table.py:23-36).
    */
  def createTableSql(table: String, schema: StructType,
                     primaryKey: Seq[String] = Nil,
                     uniqueKey: Seq[String] = Nil): String = {
    def sqlType(dt: DataType): String = dt match {
      case StringType => "VARCHAR(255)"
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case BooleanType => "BOOLEAN"
      case BinaryType => "BYTEA"
      case other => other.sql
    }
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${sqlType(f.dataType)}$nn"
    }
    val pk = if (primaryKey.nonEmpty)
      Seq(s"PRIMARY KEY (${primaryKey.mkString(", ")})") else Nil
    val uq = if (uniqueKey.nonEmpty)
      Seq(s"UNIQUE (${uniqueKey.mkString(", ")})") else Nil
    (cols ++ pk ++ uq).mkString(
      s"CREATE TABLE IF NOT EXISTS $table (\n  ", ",\n  ", "\n)")
  }

  /** S8 — upsert SQL for one row batch (the reference's
    * `INSERT ... ON CONFLICT (...) DO UPDATE`,
    * dag_daily_fuel_price_generation.py:120-125). PostgreSQL dialect.
    */
  def upsertSql(table: String, columns: Seq[String],
                conflictKeys: Seq[String]): String = {
    val updates = columns.filterNot(conflictKeys.contains)
      .map(c => s"$c = EXCLUDED.$c")
    // key-only tables have nothing to update on conflict
    val action = if (updates.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updates.mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${conflictKeys.mkString(", ")}) $action"
  }

  /** An upsert dialect: the statement text plus the column name bound to
    * each `?` in order (dialects differ in how often / in what order a
    * row's values appear).
    */
  type UpsertDialect = (String, Seq[String], Seq[String]) => (String, Seq[String])

  /** PostgreSQL ON CONFLICT dialect: one `?` per column, in order. */
  val postgresDialect: UpsertDialect = (table, columns, conflictKeys) =>
    (upsertSql(table, columns, conflictKeys), columns)

  /** ANSI MERGE dialect (Derby, DB2 shape): the single-row merge keyed
    * off a one-row dummy source, so the keys bind in the ON clause, the
    * non-key values in UPDATE, and the full row in INSERT.
    */
  val ansiMergeDialect: UpsertDialect = (table, columns, conflictKeys) => {
    val nonKeys = columns.filterNot(conflictKeys.contains)
    val on = conflictKeys.map(k => s"t.$k = ?").mkString(" AND ")
    // key-only tables: omit the MATCHED clause entirely (empty SET is a
    // syntax error on Derby/DB2)
    val matched = if (nonKeys.isEmpty) ""
      else s"WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} "
    val sql = s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 d ON ($on) " +
      matched +
      s"WHEN NOT MATCHED THEN INSERT (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"
    (sql, conflictKeys ++ nonKeys ++ columns)
  }

  /** S8 + S11 — distributed JDBC upsert: Spark has no MERGE-to-JDBC, so
    * each partition opens one connection and addBatch()es the upsert
    * statement in `batchSize` chunks, one transaction per chunk with a
    * bounded retry (rollback → backoff → re-run the chunk). Upserts are
    * idempotent per (key, version), so a chunk retry — or a whole
    * Spark task retry — converges to the same final table; that is what
    * makes retries safe where plain INSERTs would double rows. The
    * retry absorbs transient serialization/lock conflicts that
    * concurrent writers hit on any MVCC engine (and embedded Derby's
    * internal latch errors in tests); non-transient failures roll back
    * and rethrow like dag_collection_data_from_mobil.py:88-92.
    *
    * IMPORTANT at scale: dedup the batch on the conflict key first
    * (Dedup.lastWriteWins) so concurrent partitions never race on the
    * same key, and repartition by the key so chunk transactions from
    * different executors touch disjoint key ranges.
    */
  /** Roll back, but never let a rollback failure mask the original
    * error — it is attached as a suppressed exception instead.
    */
  private def rollbackKeeping(conn: java.sql.Connection, cause: Throwable): Unit =
    try conn.rollback()
    catch { case r: Throwable => cause.addSuppressed(r) }

  def jdbcUpsert(df: DataFrame, url: String, table: String,
                 conflictKeys: Seq[String],
                 props: java.util.Properties = new java.util.Properties,
                 batchSize: Int = 1000,
                 dialect: UpsertDialect = postgresDialect,
                 maxRetries: Int = 3,
                 retryDelayMs: Long = 200): Unit = {
    val columns = df.schema.fieldNames.toSeq
    val (sql, paramCols) = dialect(table, columns, conflictKeys)
    val paramIdx = paramCols.map(columns.indexOf).toArray
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          rows.grouped(batchSize).foreach { chunk =>
            var attempt = 0
            var done = false
            while (!done) {
              val st = conn.prepareStatement(sql)
              try {
                chunk.foreach { r =>
                  paramIdx.zipWithIndex.foreach { case (ci, p) =>
                    val v = r.get(ci)
                    schema(ci).dataType match {
                      case DateType => st.setDate(p + 1, v.asInstanceOf[java.sql.Date])
                      case _ => st.setObject(p + 1, v)
                    }
                  }
                  st.addBatch()
                }
                st.executeBatch()
                conn.commit()
                done = true
              } catch {
                // retry only plausibly-transient failures — a constraint
                // violation or syntax error (SQLNonTransientException)
                // is deterministic and retrying it just burns time
                case e: java.sql.SQLException
                    if attempt < maxRetries &&
                      !e.isInstanceOf[java.sql.SQLNonTransientException] =>
                  rollbackKeeping(conn, e)
                  attempt += 1
                  Thread.sleep(retryDelayMs * attempt)
                case e: Throwable => rollbackKeeping(conn, e); throw e
              } finally st.close()
            }
          }
        } finally conn.close()
      }
    }
  }
}
