package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.VectorSearch

/** ANN parameter-sweep harness: measures recall@k of each approximate
  * tier against the exact brute-force top-k on a real corpus, with wall
  * times, one JSON line per configuration. The evidence behind the
  * probe-depth defaults recorded in TUNING.md — run it whenever the
  * corpus or the tier parameters change:
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.RecallSweep /root/testdata/sf0.1"
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.source.Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val k = 10
    val exact = VectorSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"""{"corpus":"$dir","n":${emb.count()},"exact_pairs":${exact.size}}""")

    // substring filter, e.g. SPARK_GRAFT_SWEEP=lsh_multi to sweep one
    // family without paying the full ivfpq grid
    val filt = sys.env.get("SPARK_GRAFT_SWEEP")
    def run(name: String)(mk: => DataFrame): Unit = {
      if (filt.exists(f => !name.contains(f))) return
      val t0 = System.nanoTime()
      val got = mk.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val rec = if (exact.isEmpty) 0.0
        else got.intersect(exact).size.toDouble / exact.size
      println(f"""{"config":"$name","recall":$rec%.4f,"sec":$sec%.2f}""")
      spark.catalog.clearCache()
    }

    for (bits <- Seq(3, 4, 5, 6); d <- Seq(1, 2))
      run(s"lsh_single b=$bits d=$d")(
        VectorSearch.annTopK(emb, queries, "vec_id", "embedding", k, bits, d))
    for ((b, l, d) <- Seq((6, 3, 0), (6, 3, 1), (6, 4, 1), (7, 4, 1), (8, 4, 1), (8, 6, 1),
      (4, 4, 1), (4, 6, 1), (5, 6, 1), (4, 8, 0), (5, 8, 1), (4, 8, 1),
      (5, 10, 1), (4, 12, 1)))
      run(s"lsh_multi b=$b L=$l d=$d")(
        VectorSearch.annTopKMultiTable(emb, queries, "vec_id", "embedding",
          k, b, l, d))
    for (np <- Seq(2, 3, 4, 5, 6); nl <- Seq(8, 16))
      run(s"ivf nLists=$nl nprobe=$np") {
        val idx = VectorSearch.ivfBuild(emb, "vec_id", "embedding", nLists = nl)
        try VectorSearch.ivfTopK(idx, queries, k, np) finally ()
      }
    for ((kc, sl) <- Seq((16, 4), (16, 8), (16, 16), (64, 4), (64, 8),
      (64, 16), (64, 24), (64, 32), (128, 16)))
      run(s"pq_refined kCent=$kc shortlist=$sl") {
        val idx = VectorSearch.pqBuild(emb, "vec_id", "embedding", m = 8,
          kCent = kc)
        VectorSearch.pqTopKRefined(idx, emb, queries, k, sl)
      }
    // The ivfpq grid is joint on purpose: recall losses COMPOSE — IVF
    // pruning (true neighbor in an unprobed list) × ADC shortlist
    // misses — so neither axis alone reveals the ≥0.9 frontier.
    for ((np, sl, kc) <- Seq((4, 4, 16), (4, 8, 16), (6, 8, 64), (4, 8, 64),
      (6, 16, 16), (6, 24, 16), (6, 32, 16), (7, 16, 16), (7, 24, 16),
      (7, 32, 16), (6, 16, 64), (6, 24, 64), (7, 16, 64), (7, 24, 64),
      (8, 24, 16), (8, 16, 64),
      (7, 32, 64), (8, 24, 64), (8, 32, 64), (7, 24, 128), (8, 24, 128),
      (7, 32, 128)))
      run(s"ivfpq nprobe=$np shortlist=$sl kCent=$kc") {
        val ivf = VectorSearch.ivfBuild(emb, "vec_id", "embedding", nLists = 8)
        val pq = VectorSearch.pqBuild(emb, "vec_id", "embedding", m = 8,
          kCent = kc)
        VectorSearch.ivfPqTopK(ivf, pq, emb, queries, k, np, sl)
      }
    spark.stop()
  }
}
