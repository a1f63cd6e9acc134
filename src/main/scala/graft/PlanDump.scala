package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement tool (r15 optimization round): dump
  * `explain("formatted")` for registered queries to one file per query
  * — the before/after plan evidence committed under plans/r15/.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [q1,q2,...]
  * Writes <outDir>/<name><suffix>.txt. Explain only PLANS the query;
  * queries whose construction itself folds state (the incremental
  * family) still pay their construction-time actions, so a full-registry
  * dump costs a few minutes, not hours.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix, only) = args match {
      case Array(a, b)       => (a, b, "", None)
      case Array(a, b, c)    => (a, b, c, None)
      case Array(a, b, c, d) => (a, b, c, Some(d.split(",").toSet))
      case _ =>
        System.err.println(
          "usage: graft.PlanDump <sfDir> <outDir> [suffix] [q1,q2,...]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), txt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
