package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: streaming documents into fixed token-capacity
  * training sequences ("bins") — the step between curation and the
  * trainer, where a 100 TB corpus becomes contiguous max-sequence-length
  * examples.
  *
  * Semantics are CONTIGUOUS packing: documents are laid out end-to-end
  * in a deterministic total order and cut into capacity-sized bins; a
  * document belongs to the bin holding its first token and may straddle
  * the boundary into the next (trainers that split at bin edges consume
  * `bin_offset` for that). This is the streaming-concat packing used in
  * practice at scale — unlike first-fit bin packing it is order-stable,
  * embarrassingly parallel given a prefix sum, and SQL-expressible (the
  * oracle states it as one window cumsum).
  *
  * Scale shape: one range partition + local window via
  * [[graft.op.Scale.globalRunningSum]] — never a single-partition
  * global window.
  */
object Packing {

  /** Assign each row to a training bin of `capacity` tokens.
    *
    * Adds `bin` (0-based bin id = exclusive-prefix-sum div capacity) and
    * `bin_offset` (token position of the row's first token within its
    * bin). Rows longer than `capacity` keep the bin of their first token
    * and overflow forward — audit with `filter(col(tokenCol) > capacity)`
    * if the trainer can't split documents.
    *
    * `sortCols` must be a total order (unique key) — same contract as
    * any deterministic layout.
    */
  def packByBudget(df: DataFrame, sortCols: Seq[String], tokenCol: String,
                   capacity: Long, numPartitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    graft.op.Scale.globalRunningSum(df, sortCols, tokenCol, numPartitions,
        outCol = "_cum_before")
      .withColumn("bin", expr(s"_cum_before div ${capacity}L"))
      .withColumn("bin_offset", col("_cum_before") - col("bin") * capacity)
      .drop("_cum_before")
  }

  /** Bin-level summary of a packed frame: rows and token totals per bin
    * plus the fill ratio — the packing-efficiency audit (mean fill close
    * to 1 means little padding waste). Straddling rows count their full
    * token count in their home bin, so the last bin of a straddle can
    * report fill > 1; `fill` is informational, not a mass balance.
    */
  def binStats(packed: DataFrame, tokenCol: String, capacity: Long): DataFrame =
    packed.groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(tokenCol).cast("long")).as("n_tokens"))
      .withColumn("fill",
        round(col("n_tokens").cast("double") / lit(capacity.toDouble), 6))
}
