package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames. Companion to
  * [[graft.ext.TextDedup.nearDupClusters]] (connected components): where
  * clustering answers "which docs form one duplicate family",
  * PageRank-style scoring answers "which docs are the most central" —
  * e.g. picking the canonical representative of a near-dup family, or
  * weighting a link graph.
  */
object Graph {

  /** Fixed-point-arithmetic PageRank.
    *
    * All arithmetic is INTEGER (ranks scaled by `scale`): sums of longs
    * are associative, so the result is bit-identical regardless of
    * partitioning or aggregation order — unlike double-based PageRank,
    * whose last bits depend on reduction order and can never be
    * hash-compared across engines. Damping is the rational
    * `dampingNum/100` applied as `(x * dampingNum) div 100`.
    *
    * `edges` is directed (src, dst); pass both directions for an
    * undirected graph. Nodes = every id appearing as src or dst.
    * Dangling mass is not redistributed (every node of a symmetrized
    * graph has out-degree ≥ 1, the intended use here).
    *
    * Scale shape: per iteration one join of ranks onto edges (both
    * keyed on the node id — one hash partitioning reused) and one
    * aggregation on dst. Lineage is cut per round with an EAGER
    * localCheckpoint — iterative plans otherwise grow multiplicatively
    * and OOM the planner long before data size matters.
    */
  def pageRank(edges: DataFrame, src: String, dst: String,
               iterations: Int = 4, dampingNum: Long = 85,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingNum >= 0 && dampingNum <= 100)
    val e = edges.select(col(src).as("a"), col(dst).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("a").agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val init = scale / n
    val base = (init * (100 - dampingNum)) / 100
    var ranks = nodes.withColumn("rank", lit(init))
    for (_ <- 1 to iterations) {
      val contrib = e.join(outDeg, Seq("a"))
        .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"coalesce(in_sum, 0L) * $dampingNum div 100"))
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
