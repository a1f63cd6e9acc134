package graft

import org.apache.spark.sql.functions._
import graft.ext.{EventAnalytics, Packing, TextDedup}
import graft.op.Scale

/** Round-4 operators: distributed prefix sum + sequence packing,
  * block-level dedup, inter-doc duplication profile, funnel/retention,
  * and the shuffle-path decontamination variant.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // ---- globalRunningSum ----

  test("globalRunningSum equals the single-partition window cumsum") {
    val df = spark.range(1, 501)
      .selectExpr("id AS k", "(id * 7) % 13 AS v")
    val got = Scale.globalRunningSum(df, Seq("k"), "v", numPartitions = 7)
      .select($"k", $"running_sum").as[(Long, Long)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val exp = df.withColumn("e", coalesce(sum("v").over(w), lit(0L)))
      .select($"k", $"e").as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("globalRunningSum is partition-count independent") {
    val df = spark.range(1, 101).selectExpr("id AS k", "id AS v")
    val a = Scale.globalRunningSum(df, Seq("k"), "v", numPartitions = 3)
      .select($"k", $"running_sum").as[(Long, Long)].collect().toSet
    val b = Scale.globalRunningSum(df, Seq("k"), "v", numPartitions = 17)
      .select($"k", $"running_sum").as[(Long, Long)].collect().toSet
    assert(a == b)
    // first row's exclusive sum is 0; last is total minus its own value
    assert(a.contains((1L, 0L)) && a.contains((100L, 5050L - 100L)))
  }

  // ---- sequence packing ----

  test("packByBudget: contiguous bins, straddle keeps first-token bin") {
    val docs = Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 10L), (5L, 12L), (6L, 1L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packByBudget(docs, Seq("doc_id"), "n_tokens",
        capacity = 10, numPartitions = 3)
      .select($"doc_id", $"bin", $"bin_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // cum-before: 0,4,9,12,22,34 → bins 0,0,0,1,2,3; offsets 0,4,9,2,2,4
    assert(got.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 9L),
      (4L, 1L, 2L), (5L, 2L, 2L), (6L, 3L, 4L)))
  }

  test("binStats reports fill ratio per bin") {
    val docs = Seq((1L, 6L), (2L, 4L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val stats = Packing.binStats(
        Packing.packByBudget(docs, Seq("doc_id"), "n_tokens", 10, 2),
        "n_tokens", 10)
      .select($"bin", $"n_rows", $"n_tokens", $"fill")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(stats.toSeq == Seq((0L, 2L, 10L, 1.0), (1L, 1L, 10L, 1.0)))
  }

  // ---- block dedup ----

  test("blockDedup drops later exact blocks, reassembles in order") {
    val docs = Seq(
      (1L, "a b c d e f"),        // both blocks first-occurrence
      (2L, "a b c x y z"),        // block 'a b c' dup of doc1 → dropped
      (3L, "x y z"),              // whole doc dup of doc2's block → empty
      (4L, "p q r p q r"),        // within-doc repeat → one survives
      (5L, "m n o p")             // ragged tail block 'p'
    ).toDF("doc_id", "text")
    val got = TextDedup.blockDedup(docs, "text", "doc_id", blockWords = 3)
      .select($"doc", $"clean", $"n_blocks", $"n_kept")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a b c d e f", 2L, 2L),
      (2L, "x y z", 2L, 1L),
      (3L, "", 1L, 0L),
      (4L, "p q r", 2L, 1L),
      (5L, "m n o p", 2L, 2L)))
  }

  test("blockDedup with no duplicates is the identity on text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(50)
    val out = TextDedup.blockDedup(docs, "text", "doc_id", blockWords = 1000)
    // one whole-doc block each, corpus has no exact dup docs in this slice
    val joined = out.join(docs, out("doc") === docs("doc_id"))
      .filter($"clean" =!= $"text").count()
    assert(joined == 0)
  }

  // ---- duplicate-shingle fraction ----

  test("duplicateShingleFraction counts cross-doc shared shingles") {
    val docs = Seq(
      (1L, "the quick brown fox jumps high"),   // shares 'the quick brown','quick brown fox' with 2
      (2L, "the quick brown fox runs away"),
      (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val got = TextDedup.duplicateShingleFraction(docs, "text", "doc_id", 3)
      .select($"doc", $"n_shingles", $"n_dup").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // docs 1/2: 4 trigrams each, 2 shared ('the quick brown','quick brown fox')
    assert(got.toSeq == Seq((1L, 4L, 2L), (2L, 4L, 2L), (3L, 3L, 0L)))
  }

  // ---- decontamination shuffle variant ----

  test("contaminated: shuffle-hash variant returns broadcast-identical rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpus = docs.filter($"doc_id" % 17 =!= 0)
    val bench = docs.filter($"doc_id" % 17 === 0)
    val bc = TextDedup.contaminated(corpus, "text", "doc_id", bench, "text")
      .as[(Long, Long)].collect().toSet
    val sh = TextDedup.contaminated(corpus, "text", "doc_id", bench, "text",
        broadcastBench = false)
      .as[(Long, Long)].collect().toSet
    assert(bc == sh && bc.nonEmpty)
  }

  // ---- funnel ----

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts_s", "event_type")
      .withColumn("ts_us", to_timestamp($"ts_s")).drop("ts_s")

  test("funnel: strict ordering, ties do not advance") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:02:00", "purchase"),   // full funnel
      (2L, "2024-01-01 10:00:00", "click"),      // no view → stage 0
      (3L, "2024-01-01 10:05:00", "view"),
      (3L, "2024-01-01 10:04:00", "click"),      // click BEFORE view → stage 1
      (4L, "2024-01-01 10:00:00", "view"),
      (4L, "2024-01-01 10:00:00", "click"),      // tie → not after → stage 1
      (5L, "2024-01-01 10:00:00", "view"),
      (5L, "2024-01-01 10:01:00", "click"),
      (5L, "2024-01-01 10:01:00", "purchase"))   // purchase ties click → stage 2
    val got = EventAnalytics.funnel(events, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      .select($"user", $"stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2))
  }

  test("funnel picks the FIRST qualifying event per stage") {
    val events = ev(
      (1L, "2024-01-01 09:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "click"))  // earlier click still after view
    val row = EventAnalytics.funnel(events, "user_id", "ts_us", "event_type",
        Seq("view", "click"))
      .select($"ts_1".cast("string")).as[String].collect().head
    assert(row == "2024-01-01 10:00:00")
  }

  // ---- retention ----

  test("retentionCohorts: first-day cohort, distinct users per offset") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 12:00:00", "view"),   // same day, same user: 1 count
      (1L, "2024-01-03 10:00:00", "view"),   // offset 2
      (2L, "2024-01-01 10:00:00", "view"),   // same cohort as user 1
      (3L, "2024-01-02 10:00:00", "view"))   // its own cohort
    val got = EventAnalytics.retentionCohorts(events, "user_id", "ts_us")
      .select($"cohort".cast("string"), $"offset_days", $"n_users")
      .as[(String, Int, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L), ("2024-01-02", 0, 1L)))
  }
}
