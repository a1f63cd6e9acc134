package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution) over a string column —
  * the classic "are these two catalog names the same entity?" cleanup a
  * training-data pipeline runs over dimension tables before joining
  * facts against them (the reference's gas-station ingestion dedupes
  * station names across three providers the exact-match way; this is
  * the bounded-edit-distance generalization).
  *
  * Scale shape (the reason this survives 100 TB while a naive
  * levenshtein cross-join dies at 100 MB):
  *
  *  1. Aggregate to DISTINCT values first — one shuffle bounded by the
  *     distinct cardinality of the column (catalog names, not rows).
  *     All row-level multiplicity rides along as a count.
  *  2. Self-join only within a BLOCK (first token): candidate pairs are
  *     quadratic in the block size, never in the table. Blocks are
  *     capped at `maxBlock` distinct values by deterministic rank
  *     (value ascending) with drops observable via [[overCapBlocks]] —
  *     the `maxBucket`-audit discipline of
  *     [[graft.ext.TextDedup.minhashLsh]].
  *  3. A length-difference prefilter (a true lower bound of edit
  *     distance) runs before the O(len²) levenshtein, so the expensive
  *     kernel only prices near-misses.
  *
  * Both engines compute classic single-character-edit Levenshtein
  * (Spark `levenshtein`, DuckDB `levenshtein`), so the result is
  * hash-checkable.
  */
object Fuzzy {

  private def distinctNames(df: DataFrame, value: String): DataFrame =
    df.groupBy(col(value).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", split_part(col("name"), lit(" "), lit(1)))

  /** All pairs of distinct `value`s with edit distance ≤ `maxDist`,
    * blocked on the first whitespace token. Output: (name_a, name_b,
    * dist, n_a, n_b) with name_a < name_b, one row per unordered pair.
    */
  def blockedSelfJoin(df: DataFrame, value: String, maxDist: Int,
                      maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 0 && maxBlock >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("blk").orderBy("name")
    val names = distinctNames(df, value)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxBlock)
    val a = names.select(col("blk"), col("name").as("name_a"),
      col("n_rows").as("n_a"))
    val b = names.select(col("blk"), col("name").as("name_b"),
      col("n_rows").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      // threshold form: banded DP, O(maxDist·len) per pair instead of
      // O(len²), returning -1 past the bound — the filter is the same
      // predicate the full distance would give, just cheaper
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }

  /** Blocks [[blockedSelfJoin]] would truncate at the given cap, as
    * (blk, n_names) — run as a side audit so truncation at scale is
    * observable, never silent.
    */
  def overCapBlocks(df: DataFrame, value: String,
                    maxBlock: Int = 1000): DataFrame =
    distinctNames(df, value)
      .groupBy("blk").agg(count(lit(1)).as("n_names"))
      .filter(col("n_names") > maxBlock)

  /** Sorted-neighborhood method (SNM — Hernández & Stolfo, SIGMOD'95):
    * sort the distinct catalog by the value and compare each entry only
    * with its `window − 1` successors in the GLOBAL order. The classic
    * record-linkage complement to [[blockedSelfJoin]]: blocking misses
    * every cross-block pair (a first-token typo escapes its block
    * entirely), SNM misses only pairs that sort > window apart — the
    * two run as passes of a multi-pass linkage in practice.
    *
    * Scale shape: the global order comes from
    * [[graft.op.Scale.globalRowNumbers]] (range partition + local
    * window + O(partitions) driver offsets — never a single-partition
    * ORDER BY window). The sliding window becomes an EQUI-join on the
    * rank bucket of size `window`: any pair with rank distance <
    * window lies in the same or adjacent buckets, so the a-side is
    * exploded to its own and the next bucket key and the join builds
    * groups of exactly window entries — fan-out bounded by
    * construction, skew impossible regardless of value distribution.
    * Each same/adjacent-bucket pair is generated exactly once (the
    * bucket-k copy matches same-bucket partners, the k+1 copy the next
    * bucket), so no distinct() is needed. The threshold levenshtein
    * (banded DP, −1 past the bound) prices O(maxDist·len) per
    * candidate, after the length-difference prefilter.
    *
    * Output: (name_a, name_b, dist, n_a, n_b), name_a < name_b by the
    * sort itself, one row per unordered pair within the neighborhood.
    */
  def sortedNeighborhood(df: DataFrame, value: String, window: Int = 8,
                         maxDist: Int = 3): DataFrame = {
    require(window >= 2 && maxDist >= 0)
    val names = graft.op.Scale.globalRowNumbers(
      distinctNames(df, value).drop("blk"), Seq("name"), idCol = "r")
    val withB = names.withColumn("b", expr(s"r div $window"))
    val aSide = withB.select(
      explode(array(col("b"), col("b") + 1)).as("bj"),
      col("r").as("r_a"), col("name").as("name_a"),
      col("n_rows").as("n_a"))
    val bSide = withB.select(col("b").as("bj"), col("r").as("r_b"),
      col("name").as("name_b"), col("n_rows").as("n_b"))
    aSide.join(bSide, Seq("bj"))
      .filter(col("r_b") > col("r_a") &&
        col("r_b") - col("r_a") < window)
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"),
        col("dist").cast("long").as("dist"), col("n_a"), col("n_b"))
  }

  /** Canonicalization on top of the pair graph: every distinct value is
    * mapped to the representative of its fuzzy-connected family — the
    * member with the highest row count (ties: smallest name), i.e. the
    * spelling most of the data already uses. Families are connected
    * components of the ≤`maxDist` pair graph, computed with the same
    * large-star/small-star contraction that powers
    * [[graft.ext.TextDedup.nearDupClusters]] (the 100 TB-safe CC
    * algorithm — no driver state, no recursion depth tied to component
    * diameter). Output: (name, canonical, n_rows).
    */
  def canonicalize(df: DataFrame, value: String, maxDist: Int,
                   maxBlock: Int = 1000): DataFrame = {
    val names = distinctNames(df, value).select("name", "n_rows")
    val pairs = blockedSelfJoin(df, value, maxDist, maxBlock)
      .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
    val labeled = graft.ext.TextDedup.nearDupClusters(pairs)
      .withColumnRenamed("doc", "name")
    // singletons never entered the pair graph: they label themselves
    val all = names.join(labeled, Seq("name"), "left")
      .withColumn("label", coalesce(col("cluster"), col("name")))
    // representative = argmax(n_rows, ties: min name) — a single
    // order-independent min(struct) aggregate, no window
    val reps = all.groupBy("label")
      .agg(min(struct((-col("n_rows")).as("_neg"), col("name").as("_n")))
        .as("_best"))
      .select(col("label"), col("_best._n").as("canonical"))
    all.join(reps, Seq("label"))
      .select("name", "canonical", "n_rows")
  }
}
