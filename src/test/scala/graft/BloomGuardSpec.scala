package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{BloomGuard, TextDedup}
import graft.streaming.EventStream

/** Bloom admission guard: the two-stage (sketch-prefilter → exact
  * verify) incremental dedup must be BIT-IDENTICAL to the plain
  * normalized anti-join — the no-false-negative theorem — while the
  * sketch actually prunes the definitely-new majority off the join.
  */
class BloomGuardSpec extends SparkSpec {
  import spark.implicits._

  private def antiJoinReference(newBatch: DataFrame, corpus: DataFrame): Seq[Long] = {
    val ck = corpus.select(TextDedup.normalizedText(col("text")).as("_n"))
      .filter(col("_n") =!= "")
    val normed = newBatch.withColumn("_n", TextDedup.normalizedText(col("text")))
    val signal = normed.filter(col("_n").isNotNull && col("_n") =!= "")
      .join(ck, Seq("_n"), "left_anti")
    val noSignal = normed.filter(col("_n").isNull || col("_n") === "")
    signal.unionByName(noSignal).select("doc_id").as[Long].collect().toSeq.sorted
  }

  private val corpus = Seq(
    (1L, "The Quick Brown Fox!"),
    (2L, "spark shuffles partition data across executors"),
    (3L, "?!?..."), // empty-norm corpus doc: must never absorb anything
    (4L, "bloom filters have no false negatives")).toDF("doc_id", "text")

  private val newBatch = Seq(
    (10L, "the quick   brown fox"), // dup of 1 after normalization
    (11L, "BLOOM FILTERS have no false negatives?!"), // dup of 4
    (12L, "a genuinely new document about watermarks"),
    (13L, "'';;;"), // empty-norm newcomer: no content signal => new
    (14L, null.asInstanceOf[String]), // NULL text must not vanish
    (15L, "another new one mentioning spark but not duplicating"))
    .toDF("doc_id", "text")

  test("newDocs equals the exact normalized anti-join") {
    val got = BloomGuard.newDocs(newBatch, corpus, "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(12L, 13L, 14L, 15L))
    assert(got == antiJoinReference(newBatch, corpus))
  }

  test("sketch misses bypass the verify join; only real dups + fpp sliver remain") {
    val bigCorpus = (1 to 500).map(i => (i.toLong, s"corpus document number $i about topic ${i % 7}"))
      .toDF("doc_id", "text")
    val dups = (1 to 10).map(i => (1000L + i, s"CORPUS DOCUMENT NUMBER ${i * 3} ABOUT TOPIC ${(i * 3) % 7}"))
    val fresh = (1 to 500).map(i => (2000L + i, s"entirely fresh crawl text $i with payload ${i * 37}"))
    val batch = (dups ++ fresh).toDF("doc_id", "text")
    val sketch = BloomGuard.keySketch(
      bigCorpus.select(TextDedup.normalizedText(col("text")).as("n")), col("n"), fpp = 0.01)
    val (definitelyNew, candidates) = BloomGuard.candidateSplit(batch, "text", sketch)
    val nCand = candidates.count()
    // 10 true dups + at most ~1% of 500 false positives (deterministic
    // sketch hashing => a stable bound, generous slack for hash luck)
    assert(nCand >= 10 && nCand <= 30, s"candidates = $nCand")
    assert(definitelyNew.count() == 510 - nCand)
    // and the final answer is still exact
    val got = BloomGuard.newDocs(batch, bigCorpus, "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == fresh.map(_._1).sorted)
  }

  test("empty corpus admits everything; rebuild is deterministic") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = BloomGuard.newDocs(newBatch, empty, "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(10L, 11L, 12L, 13L, 14L, 15L))
    // sketch build is deterministic (fixed xxhash64 seed + fixed bloom
    // hashing): two builds yield byte-identical filters
    val k = corpus.select(TextDedup.normalizedText(col("text")).as("n"))
    val a = BloomGuard.keySketch(k, col("n"))
    val b = BloomGuard.keySketch(k, col("n"))
    val (ba, bb) = {
      val o1 = new java.io.ByteArrayOutputStream(); a.writeTo(o1)
      val o2 = new java.io.ByteArrayOutputStream(); b.writeTo(o2)
      (o1.toByteArray.toSeq, o2.toByteArray.toSeq)
    }
    assert(ba == bb)
  }

  test("plan: codegen'd might_contain prefilter, no cartesian product") {
    // parquet-backed inputs: over a LocalRelation the optimizer folds
    // the probe filter into the local scan and the assertion sees no
    // might_contain even though the expression ran
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    newBatch.write.parquet(s"$dir/newb")
    corpus.write.parquet(s"$dir/corpus")
    val plan = BloomGuard.newDocs(
      spark.read.parquet(s"$dir/newb"), spark.read.parquet(s"$dir/corpus"), "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("streaming guard equals the batch kernel; stateless append plan") {
    val dir = java.nio.file.Files.createTempDirectory("bloomstream").toString
    val f1 = Seq((10L, "the quick   brown fox"), (12L, "a genuinely new document about watermarks"))
    val f2 = Seq((11L, "BLOOM FILTERS have no false negatives?!"),
      (13L, "'';;;"), (15L, "another new one mentioning spark but not duplicating"))
    f1.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(1100) // distinct mtimes => deterministic batch order
    f2.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir + "/*")
    val out = EventStream.bloomGuardStream(stream, corpus, "text")
      .select("doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bloomguard")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty),
      "admission guard must not hold stream state")
    val got = spark.sql("select doc_id from bloomguard").as[Long].collect().toSeq.sorted
    val batch = BloomGuard.newDocs((f1 ++ f2).toDF("doc_id", "text"), corpus, "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == batch)
    assert(got == Seq(12L, 13L, 15L))
  }
}
