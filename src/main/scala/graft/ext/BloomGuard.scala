package graft.ext

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter admission guard: the incremental form of EXACT dedup.
  *
  * The reference dedups new rows against the accumulated store with an
  * existence check per batch (`dags/dag_collection_data_from_bp.py:64`
  * — fetch-ids-then-filter, the T5 anti-join family). At 100 TB that
  * anti-join shuffles the ENTIRE new batch against the ENTIRE corpus
  * key set on every ingest. The scale idiom is a two-stage admission:
  *
  *  1. summarize the corpus key set ONCE into a bloom sketch (built
  *     distributed, `O(n log 1/fpp)` bits — ~1.2 GB per 10^9 keys at
  *     1% fpp, an executor-resident artifact maintained across ingests
  *     like the IVF/PQ indexes);
  *  2. probe the sketch MAP-SIDE over the new batch (codegen'd
  *     `might_contain`, zero shuffle). A miss is DEFINITELY new — the
  *     sketch has no false negatives — and bypasses the join entirely;
  *  3. only the hits (true duplicates + the fpp sliver) pay the exact
  *     verification join against the corpus keys.
  *
  * So the expensive join's probe side shrinks from |batch| to
  * |dups| + fpp·|batch|, and the result is PROVABLY identical to the
  * plain anti-join — which is why the registered query
  * (`ns_bloom_dedup`) is oracle-checkable even though a probabilistic
  * structure sits in the plan: the sketch only routes rows between the
  * bypass and the verify branch, it never decides membership alone.
  *
  * The verify join keys on the actual normalized text, not its hash:
  * the sketch probes a 64-bit hash, verification compares the real key,
  * so a hash collision costs a wasted probe, never a wrong drop. The
  * corpus-keys side of the verify join is the one unavoidable scan; in
  * steady state it is a bucketed artifact (bucketBy on the key), so the
  * tiny candidate side shuffles to it and the corpus side never moves.
  *
  * Duplicate semantics are [[TextDedup.exactNormalized]]'s: equality of
  * the case/punctuation/whitespace-normalized text; empty/NULL-normal
  * docs carry no content signal and are never duplicates of anything.
  */
object BloomGuard {

  /** Serialize a sketch for embedding in a Catalyst plan. */
  private def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Distributed build of the corpus key sketch over `xxhash64(key)`.
    *
    * `expectedItems <= 0` derives the capacity from a count of the key
    * frame (one extra scan — the build stage's price, amortized across
    * every subsequent ingest). Over-estimating capacity only lowers the
    * realized fpp; under-estimating raises it but can never lose a key,
    * so correctness of [[newDocs]] is capacity-independent.
    */
  def keySketch(keys: DataFrame, key: Column,
                expectedItems: Long = -1L, fpp: Double = 0.01): BloomFilter = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val hashed = keys.select(xxhash64(key).as("_k"))
    // the underlying aggregate yields NULL bytes over zero rows (NPE in
    // readFrom) — an empty corpus means an empty filter, probe = false
    if (expectedItems > 0) {
      if (hashed.isEmpty) BloomFilter.create(64L, fpp)
      else hashed.stat.bloomFilter("_k", expectedItems, fpp)
    } else {
      val n = hashed.count()
      if (n == 0L) BloomFilter.create(64L, fpp)
      else hashed.stat.bloomFilter("_k", n, fpp)
    }
  }

  /** Codegen'd map-side probe: true iff `xxhash64(key)` MIGHT be in the
    * sketch (Spark's own runtime-filter expression — whole-stage
    * friendly, the sketch rides the plan as one binary reference).
    */
  def mightContainKey(sketch: BloomFilter, key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(toBytes(sketch), BinaryType),
      GraftColumnBridge.expression(xxhash64(key))))

  /** The two admission branches, exposed for tests and the streaming
    * twin: (definitely-new rows — sketch miss or no content signal —
    * and candidate rows that must be exactly verified). Both carry the
    * input columns plus `_norm`.
    */
  private[graft] def candidateSplit(newBatch: DataFrame, text: String,
                                    sketch: BloomFilter): (DataFrame, DataFrame) = {
    val probed = newBatch
      .withColumn("_norm", TextDedup.normalizedText(col(text)))
      // coalesce: NULL text yields NULL norm, which must land in the
      // definitely-new branch, not vanish from both filters
      .withColumn("_maybe_dup",
        coalesce(col("_norm") =!= "" && mightContainKey(sketch, col("_norm")),
          lit(false)))
    (probed.filter(!col("_maybe_dup")).drop("_maybe_dup"),
      probed.filter(col("_maybe_dup")).drop("_maybe_dup"))
  }

  /** Rows of `newBatch` whose normalized text does NOT already occur in
    * `corpus` — bit-identical to the plain normalized anti-join, at the
    * two-stage admission cost described above.
    */
  def newDocs(newBatch: DataFrame, corpus: DataFrame, text: String,
              fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val corpusKeys = corpus
      .select(TextDedup.normalizedText(col(text)).as("_norm"))
      .filter(col("_norm") =!= "")
    val sketch = keySketch(corpusKeys, col("_norm"), expectedItems, fpp)
    val (definitelyNew, candidates) = candidateSplit(newBatch, text, sketch)
    // shuffle_hash, not broadcast: at scale the corpus key set is the
    // side that does NOT fit a broadcast budget (it is the 100 TB side)
    val verifiedNew =
      candidates.join(corpusKeys.hint("shuffle_hash"), Seq("_norm"), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("_norm")
  }
}
