package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers (SURVEY §7.4):
  *  - `bruteForceTopK` — exact cosine top-k; the correctness baseline.
  *    Cost O(|queries|·|corpus|·dim): fine when the query side is small
  *    or as the per-bucket kernel.
  *  - random-hyperplane LSH (`lshBuckets` + `annTopK`) — the 100 TB
  *    path: vectors land in 2^bits sign-pattern buckets; queries probe
  *    only their own bucket (plus optional multi-probe neighbors), so
  *    the scan per query is corpus/2^bits on average and the whole
  *    search is one equi-join Catalyst plans as a hash join.
  *
  * All arithmetic is double-precision fold-left over the array —
  * deterministic, and bit-identical to DuckDB's DOUBLE[] cosine, which
  * the oracle uses.
  */
object VectorSearch {

  /** Cosine similarity of two float-array columns, computed in double.
    * Backed by a native Catalyst expression (one primitive loop per
    * row); accumulation order matches the fold-left HOF formulation and
    * DuckDB's DOUBLE[] cosine bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  /** Per-label centroid of an embedding column, in long form
    * (label, dim, n, centroid) — the class-prototype computation behind
    * nearest-centroid classification and IVF-style coarse quantizers.
    *
    * Float means are reduction-order dependent, so each component is
    * first scaled to a 1e-6-resolution BIGINT (exact, associative sum —
    * the same decimal-exact aggregation discipline as Stats.corrStats)
    * and divided back once after aggregation. Scale shape: posexplode
    * fans out n×d rows, but the groupBy partial-aggregates map-side to
    * labels×d rows per task before the one shuffle — at corpus scale
    * the exchange carries O(labels × dims × tasks), never O(rows × dims).
    */
  def labelCentroids(df: DataFrame, label: String, vec: String): DataFrame =
    df.select(col(label), posexplode(col(vec)).as(Seq("dim", "v")))
      .groupBy(col(label), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(cast(v as double) * 1000000) as bigint)")).as("_s"))
      .withColumn("centroid",
        round(col("_s").cast("double") / (col("n") * lit(1000000.0)), 6))
      .drop("_s")

  /** Per-label centroids gathered into dim-ordered vectors
    * (label, cvec: array<double>) — the broadcastable prototype matrix
    * form of [[labelCentroids]]. The gather is a collect_list sorted by
    * dim, so the array order is deterministic regardless of aggregation
    * order.
    */
  def centroidVectors(df: DataFrame, label: String, vec: String): DataFrame =
    labelCentroids(df, label, vec)
      .groupBy(label)
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cvec"))

  /** Nearest-centroid classification: label every vector with the class
    * whose centroid it is most cosine-similar to (ties → smallest
    * label). The prototype-classifier inference step on top of
    * [[labelCentroids]], oracle-exact end to end: centroids are the
    * scaled-integer exact means, similarities round to 6 dp before the
    * argmax, and the argmax is `min(struct(-sim, label))` — identical
    * to an ORDER BY (-sim, label) LIMIT 1 in any engine.
    *
    * Scale shape: the centroid matrix is labels×dims (tiny) and is
    * BROADCAST; each corpus row scores all labels map-side and the
    * argmax partial-aggregates before the one shuffle on `id` — the
    * corpus is never replicated into the exchange, L×N rows exist only
    * inside tasks.
    */
  def nearestCentroid(df: DataFrame, id: String, label: String,
                      vec: String): DataFrame = {
    val cvecs = centroidVectors(df, label, vec)
      .select(col(label).as("pred_label"), col("cvec"))
    df.select(col(id), col(vec))
      .crossJoin(broadcast(cvecs))
      .withColumn("sim", round(cosine(col(vec), col("cvec")), 6))
      .groupBy(col(id))
      .agg(min(struct((-col("sim")).as("_ns"), col("pred_label").as("_l")))
        .as("_b"))
      .select(col(id), col("_b._l").as("pred_label"),
        (-col("_b._ns")).as("sim"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * storage/shuffle-bandwidth reduction trick of large-scale vector
    * pipelines: per vector, scale = max|v|/127 and each component maps
    * to round(v/max|v|·127) ∈ [−127, 127]. Pure map-side (zero
    * shuffle); dequantization is q·scale with ≤ scale/2 absolute error
    * per component. The all-zero vector quantizes to zeros with
    * scale 0 (explicit branch — ANSI would otherwise turn the 0/0 into
    * a runtime error).
    *
    * Engine parity: max|v| via a double array_max (index order
    * irrelevant for max), the per-component expression is the same
    * (v / maxabs) · 127 double tree in the oracle, and round is
    * half-away-from-zero in both engines.
    */
  def quantizeInt8(df: DataFrame, id: String, vec: String): DataFrame = {
    val maxabs = array_max(transform(col(vec), v => abs(v.cast("double"))))
    df.select(col(id), col(vec), maxabs.as("_m"))
      .select(col(id), round(col("_m") / 127.0d, 6).as("qscale"),
        posexplode(when(col("_m") === 0d,
          transform(col(vec), _ => lit(0L)))
          .otherwise(transform(col(vec),
            v => round(v.cast("double") / col("_m") * 127.0d, 0).cast("long"))))
          .as(Seq("dim", "q")))
      .select(col(id), col("dim"), col("q").cast("tinyint").as("q"),
        col("qscale"))
  }

  /** Vector-form int8 quantization: (id, qvec, qscale) with the
    * quantized components kept as a float array so the result plugs
    * straight into [[bruteForceTopK]]/[[annTopK]]. Cosine similarity is
    * scale-invariant per vector — cos(s_a·q_a, s_b·q_b) = cos(q_a, q_b)
    * — so searching the quantized corpus needs NO dequantization and
    * differs from exact search only by the bounded rounding noise
    * (recall asserted in Round5Spec). Same arithmetic as
    * [[quantizeInt8]]'s long form.
    */
  def quantizeInt8Vectors(df: DataFrame, id: String, vec: String): DataFrame = {
    val m = array_max(transform(col(vec), v => abs(v.cast("double"))))
    df.select(col(id), col(vec), m.as("_m"))
      .select(col(id),
        when(col("_m") === 0d, transform(col(vec), _ => lit(0.0f)))
          .otherwise(transform(col(vec),
            v => round(v.cast("double") / col("_m") * 127.0d, 0).cast("float")))
          .as("qvec"),
        round(col("_m") / 127.0d, 6).as("qscale"))
  }

  /** L2-normalize once so repeated searches only pay dot products. */
  def normalized(df: DataFrame, vec: String): DataFrame =
    df.withColumn("_norm",
      sqrt(aggregate(transform(col(vec), v => v.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)))
      .withColumn(vec, transform(col(vec), v => v.cast("double") / col("_norm")))
      .drop("_norm")

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The query side is broadcast (it is small by contract), so the
    * corpus never shuffles for the join; the only shuffle is the
    * per-query top-k window. Ranking uses (rounded sim, id) so the
    * result order is stable across engines/ulp.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that sit closest to the decision boundary, which is
    * what a contrastive objective actually needs (random negatives are
    * trivially easy; in-batch negatives are a lottery). Same scale
    * shape as [[bruteForceTopK]]: the query side broadcasts, the
    * corpus never shuffles for the join, the label inequality filters
    * before scoring output, and the per-query top-k is the only
    * exchange. Swap the corpus scan for an IVF/LSH candidate set when
    * the corpus outgrows brute force — the contract downstream is
    * unchanged.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, id: String,
                    vec: String, label: String, k: Int): DataFrame = {
    val c = corpus.select(col(id).as("vec_id"), col(vec).as("cv"),
      col(label).as("neg_label"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"),
      col(label).as("query_label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("query_label"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("rank"),
        col("vec_id"), col("neg_label"), col("sim"))
  }

  /** Sign-pattern LSH bucket id (`bits` hyperplanes → long in
    * [0, 2^bits)) for the vector array column. Native expression; the
    * hyperplanes are splitmix64-derived from a fixed seed, so every
    * executor regenerates identical planes — no stored/broadcast model,
    * which is what makes the index reproducible at cluster scale.
    */
  def lshBucketExpr(bits: Int, vecCol: String): Column =
    graft.functions.VectorExpressions.lsh_bucket(col(vecCol), bits)

  /** The ENGINE-PORTABLE sign-bucket family (the round-15 ANN oracle
    * promotion — the `ns_dedup_simhash_portable`/`ns_dedup_minhash`
    * recipe applied to hyperplane LSH): vectors are quantized to exact
    * integers (`floor(double(x) · 1024)` — float→double widening and a
    * power-of-two multiply are both exact, so both engines see the
    * identical BIGINT), and plane `j` is a seeded Rademacher (±1)
    * vector whose entry for 1-based dimension `i` is the parity of
    * `(i · (2j+3)·65537 + (j+1)·514229) mod 1000003` — the same seeded
    * multiplier family as the portable MinHash permutations. Bit j is
    * set iff the exact integer dot `Σ qᵢ·hⱼᵢ ≥ 0`, so a DuckDB twin
    * recomputes the WHOLE bucket with plain integer SQL and the two
    * engines can never drift (OracleSql.annSigCtes). Rademacher planes
    * are standard sign-LSH projections (collision probability is the
    * same 1 − θ/π law in expectation), so this is a production-usable
    * index, not an oracle crutch — the splitmix64 native family
    * ([[lshBucketExpr]]) remains the codegen'd fast path.
    */
  def lshBucketPortableExpr(bits: Int, vecCol: String): Column = {
    require(bits >= 1 && bits <= 63, "bits in [1, 63]")
    // r15: the quantized vector is BOUND as a lambda variable
    // (`transform(array(Q), q -> body)` evaluates Q exactly once per
    // row) — inlining it re-ran the O(dim) quantize once PER BIT
    // (24–32× per row on the multi-table forms). Same arithmetic,
    // same signature values; the winnowingFingerprints hoist trick.
    val quant = s"transform($vecCol, " +
      "x -> cast(floor(cast(x as double) * 1024.0D) as bigint))"
    expr(
      s"""element_at(transform(array($quant), q ->
         |  aggregate(
         |    transform(sequence(0, ${bits - 1}), j ->
         |      if(aggregate(
         |           zip_with(q,
         |             transform(sequence(1, size(q)), i ->
         |               if(pmod(cast(i as bigint) * ((2L * j + 3L) * 65537L)
         |                         + (cast(j as bigint) + 1L) * 514229L,
         |                       1000003L) % 2L = 0L, 1L, -1L)),
         |             (x, h) -> x * h),
         |           0L, (acc, x) -> acc + x) >= 0L,
         |         shiftleft(1L, j), 0L)),
         |    0L, (acc, x) -> acc + x)), 1)""".stripMargin)
  }

  /** The bucket column for the chosen hash family: native splitmix64
    * planes (default — codegen'd) or the portable seeded Rademacher
    * family (oracle-recomputable; see [[lshBucketPortableExpr]]).
    * r16: the portable arm runs the COMPILED kernel
    * ([[graft.functions.VectorExpressions.portable_lsh_bucket]]) —
    * bit-identical values to [[lshBucketPortableExpr]] (parity pinned
    * in AnnPortableSpec), same hash family, same oracle; the HOF form
    * evaluated O(bits·dim) interpreted lambdas per row and was the
    * dominant per-row cost of every portable ANN line.
    */
  private[graft] def bucketExprOf(bits: Int, vecCol: String,
                                  portable: Boolean): Column =
    if (portable)
      graft.functions.VectorExpressions.portable_lsh_bucket(col(vecCol), bits)
    else lshBucketExpr(bits, vecCol)

  /** Assign every vector its LSH bucket. Map-side; persist/bucket-write
    * the result once and reuse it across queries.
    */
  def lshBuckets(df: DataFrame, vec: String, bits: Int = 8,
                 portable: Boolean = false): DataFrame =
    df.withColumn("bucket", bucketExprOf(bits, vec, portable))

  /** A prebuilt IVF index: the corpus with each row's list assignment
    * (stored — eagerly localCheckpoint'd at build, so probes read index
    * blocks and never re-run the assignment), the centroid
    * matrix (tiny, re-broadcast per probe), and the column names it was
    * built over. Build once with `ivfBuild`, probe many times with
    * `ivfTopK(index, ...)` — training cost is paid exactly once, which
    * is the difference between an index and a per-query KMeans fit.
    */
  final case class IvfIndex(assigned: DataFrame,
                            centroids: org.apache.spark.ml.linalg.DenseMatrix,
                            id: String, vec: String) {
    /** Release the assignment frame. The frame is localCheckpoint'd
      * (a STORED index artifact, like the pair-graph/cluster caches:
      * it survives `spark.catalog.clearCache`, and probes read blocks
      * instead of re-running the KMeans transform); there is no
      * un-checkpoint API, so close() drops what it can and the
      * ContextCleaner reclaims the blocks once the last reference is
      * gone (see SparkEntry.releaseArtifacts quiescence contract).
      */
    def close(): Unit = { assigned.unpersist(); () }
  }

  /** IVF (inverted-file) index build: KMeans centroids, every vector
    * assigned to its nearest centroid list. Deterministic (fixed seed);
    * centroids are tiny and broadcast. Complements the hyperplane LSH:
    * IVF adapts to the data distribution, LSH needs no training pass.
    *
    * `fitSampleFraction < 1` fits the quantizer on a corpus sample — at
    * 100 TB the centroids converge on a few million rows; only the
    * (map-side) assignment pass must see every row.
    */
  def ivfBuild(df: DataFrame, id: String, vec: String, nLists: Int = 16,
               seed: Long = 42L, fitSampleFraction: Double = 1.0): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(fitSampleFraction > 0 && fitSampleFraction <= 1.0,
      "fitSampleFraction in (0, 1]")
    val feat = df.withColumn("_fv",
      array_to_vector(transform(col(vec), v => v.cast("double"))))
    val fitData =
      if (fitSampleFraction < 1.0) feat.sample(fitSampleFraction, seed) else feat
    // few iterations suffice for a coarse quantizer — lists need to be
    // balanced, not optimal
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("_fv").setPredictionCol("_list").fit(fitData)
    // eager localCheckpoint, not persist: the index is a STORED
    // artifact — session-wide cache clears (the per-query hygiene in
    // Verify/Bench/ScaleStress) must not force every later probe to
    // re-run the assignment transform, same contract as the pair-graph
    // and cluster-label artifacts
    val assigned = model.transform(feat).drop("_fv")
      .withColumnRenamed("_list", "ivf_list")
      .localCheckpoint(true)
    val centers = model.clusterCenters
    val mat = new org.apache.spark.ml.linalg.DenseMatrix(
      centers.length, centers.head.size,
      centers.flatMap(_.toArray), isTransposed = true)
    IvfIndex(assigned, mat, id, vec)
  }

  /** IVF top-k probe against a prebuilt index: each query probes its
    * `nprobe` nearest centroid lists; exact cosine within the probed
    * lists. The corpus side shuffles once on `ivf_list`; the
    * probed-queries side is broadcast. No training happens here.
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, k: Int,
              nprobe: Int): DataFrame = {
    val (id, vec, centers) = (index.id, index.vec, index.centroids)
    val c = index.assigned
      .select(col("ivf_list"), col(id).as("vec_id"), col(vec).as("cv"))
    // rank centroid lists per query by distance, keep nprobe
    val centroidRows = (0 until centers.numRows).map { i =>
      (i, (0 until centers.numCols).map(j => centers(i, j)).toArray)
    }
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val centDf = centroidRows.toDF("ivf_list", "centroid")
    // rank probe lists by EUCLIDEAN distance — the metric KMeans
    // assigned corpus vectors with; mixing metrics would probe lists
    // that exclude the query's own assignment list
    def sqDist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("dist", sqDist(col("qv"), col("centroid")))
      .withColumn("_r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist"), col("ivf_list"))))
      .filter(col("_r") <= nprobe)
      .select(col("ivf_list"), col("query_id"), col("qv"))
    val scored = c.join(broadcast(q), Seq("ivf_list"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** One-shot convenience: build the index, then probe. Repeated-query
    * workloads should call `ivfBuild` once, reuse the index, and
    * `close()` it when done — this form re-trains per call and leaves
    * its per-call index cached until the session clears its cache.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, nLists: Int = 16,
              nprobe: Int = 3, seed: Long = 42L): DataFrame =
    ivfTopK(ivfBuild(corpus, id, vec, nLists, seed), queries, k, nprobe)

  /** All buckets within Hamming distance `depth` (0-2) of `bucket`, as
    * a SQL array expression — the multi-probe neighborhood. Sizes:
    * 1, 1+bits, 1+bits+C(bits,2); each probed bucket adds ~corpus/2^bits
    * rows to the query's candidate scan.
    */
  private[ext] def probeNeighborhoodSql(bits: Int, depth: Int): String = {
    // at bits = 1 the d2 term's sequence(0, bits-2) would be the
    // DESCENDING Spark SQL sequence [0, -1] — negative shift amounts,
    // keys outside the bucket space, silently-wasted probes
    require(bits >= 2 || depth <= 1,
      s"depth-2 multi-probe needs bits >= 2 (got bits=$bits)")
    val self = "array(cast(bucket as long))"
    val d1 = s"transform(sequence(0, ${bits - 1}), b -> " +
      "cast(bucket as long) ^ shiftleft(1L, b))"
    // b1 ranges to bits-2 so the inner sequence(b1+1, bits-1) is always
    // ascending (a descending sequence would double-count pairs)
    val d2 = s"flatten(transform(sequence(0, ${bits - 2}), b1 -> " +
      s"transform(sequence(b1 + 1, ${bits - 1}), b2 -> " +
      "cast(bucket as long) ^ shiftleft(1L, b1) ^ shiftleft(1L, b2))))"
    depth match {
      case 0 => self
      case 1 => s"array_union($self, $d1)"
      case 2 => s"array_union(array_union($self, $d1), $d2)"
    }
  }

  /** Approximate top-k: probe only the query's bucket. Recall is traded
    * against `bits`, and raised with multi-probe: `probeNeighbors` is
    * the maximum Hamming distance of probed buckets (0 = own bucket
    * only, 1 = + bits neighbors, 2 = + C(bits,2) more — measured sweep
    * in TUNING.md; depth 2 at low bits approaches exact recall while
    * still bounding the scan to a bucket fraction of the corpus).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, bits: Int = 8,
              probeNeighbors: Int = 0,
              portable: Boolean = false): DataFrame = {
    val scored = annCandidates(corpus, queries, id, vec, bits,
      probeNeighbors, portable)
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** The candidate-generation half of [[annTopK]]: every
    * bucket-colliding (query, vector) pair with its exact cosine —
    * no window, no rank. This is the part that is a PURE map-side /
    * stream-static shape (bucket expr + equi-join + scalar score), so
    * it doubles as the streaming twin's kernel
    * ([[graft.streaming.EventStream.annCandidatesStream]]): window
    * functions are not available on append-mode streams, so the
    * k-selection stays with the consumer — the
    * candidates-plus-batch-argmax contract the attribution stream
    * already set.
    */
  def annCandidates(corpus: DataFrame, queries: DataFrame, id: String,
                    vec: String, bits: Int = 8,
                    probeNeighbors: Int = 0,
                    portable: Boolean = false): DataFrame = {
    require(probeNeighbors >= 0 && probeNeighbors <= 2,
      "probeNeighbors (max probe Hamming distance) must be 0, 1, or 2")
    require(bits >= 2, "bits must be >= 2")
    val c = lshBuckets(corpus, vec, bits, portable)
      .select(col("bucket"), col(id).as("vec_id"), col(vec).as("cv"))
    val q0 = lshBuckets(queries, vec, bits, portable)
      .select(col("bucket"), col(id).as("query_id"), col(vec).as("qv"))
    val q = if (probeNeighbors == 0) q0 else {
      q0.select(col("query_id"), col("qv"),
        explode(expr(probeNeighborhoodSql(bits, probeNeighbors))).as("bucket"))
    }
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
  }

  /** Multi-table LSH top-k — the standard recall-amplification shape
    * (L independent hash tables, candidates unioned) that single-table
    * multi-probe can't reach: a true neighbor is missed only if it
    * collides in NONE of the L tables, so miss probability decays
    * geometrically with `tables` while the scan stays a bounded bucket
    * fraction (≈ tables · (1 + probed neighbors) / 2^bits of the corpus,
    * before overlap dedup).
    *
    * The L tables cost nothing extra to store or compute: one
    * `lsh_bucket(vec, tables·bits)` call yields `tables·bits` sign bits
    * from independent hyperplanes, and table `t` is the bit-slice
    * `[t·bits, (t+1)·bits)` — so the "index" is still a single long
    * column, map-side, with no trained model. Join keys are offset by
    * `t · 2^bits` so tables never cross-match in the one equi-join.
    * Candidates are deduped on (query, vector) BEFORE scoring, so each
    * pair pays the cosine kernel once no matter how many tables it
    * collides in. `probeNeighbors ∈ {0, 1}`: depth-1 probing flips each
    * of the low `bits` within a table (multi-table already supplies the
    * diversity depth-2 probing buys in the single-table form).
    */
  def annTopKMultiTable(corpus: DataFrame, queries: DataFrame, id: String,
                        vec: String, k: Int, bits: Int = 6, tables: Int = 4,
                        probeNeighbors: Int = 1,
                        portable: Boolean = false): DataFrame = {
    require(bits >= 2, "bits must be >= 2")
    require(tables >= 1 && tables * bits <= 63,
      "tables >= 1 and tables*bits <= 63 (one long of sign bits)")
    require(probeNeighbors >= 0 && probeNeighbors <= 1,
      "probeNeighbors must be 0 or 1 for the multi-table form")
    val width = 1L << bits
    val mask = width - 1L
    // per-table join keys, offset so table t only matches table t
    val subkeys = s"transform(sequence(0, ${tables - 1}), " +
      s"t -> cast(t as long) * ${width}L + " +
      s"(shiftright(_bf, t * $bits) & ${mask}L))"
    val c = corpus.withColumn("_bf", bucketExprOf(tables * bits, vec, portable))
      .select(col(id).as("vec_id"), col(vec).as("cv"),
        explode(expr(subkeys)).as("key"))
    val qkeys =
      if (probeNeighbors == 0) subkeys
      else
        // self + the `bits` Hamming-1 flips of the low bits — stays
        // inside the table's key block by construction
        s"array_distinct(flatten(transform($subkeys, base -> " +
          s"array_union(array(base), transform(sequence(0, ${bits - 1}), " +
          "b -> base ^ shiftleft(1L, b))))))"
    val q = queries.withColumn("_bf", bucketExprOf(tables * bits, vec, portable))
      .select(col(id).as("query_id"), col(vec).as("qv"),
        explode(expr(qkeys)).as("key"))
    // union of per-table matches, deduped before the cosine kernel
    val cand = c.join(broadcast(q), Seq("key"))
      .filter(col("query_id") =!= col("vec_id"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** A prebuilt product-quantization index: every corpus vector
    * compressed to `m` sub-codebook indices (the stored — eagerly
    * localCheckpoint'd — `codes` frame, `m` small ints ≈ `m` bytes per
    * vector vs `4·dim` float bytes — 32× at dim=64/m=8), plus the
    * per-subspace codebooks
    * (m × kCent × dim/m doubles — tiny, re-broadcast per probe).
    *
    * This is the MEMORY-side ANN scale path, complementing IVF (which
    * prunes how many vectors a query scans, but stores them full-size):
    * at 10^9+ vectors the full-precision corpus no longer fits the
    * cluster's RAM; PQ codes do. Vectors are L2-NORMALIZED at build,
    * so the probe's squared-L2 ADC ranking is monotone with cosine
    * (‖q−x‖² = 2−2·q·x on unit vectors) — recall is measured against
    * the same exact-cosine baseline as the other ANN tiers.
    */
  final case class PqIndex(codes: DataFrame,
                           codebooks: Array[(Int, Int, Array[Double])],
                           id: String, vec: String, m: Int, kCent: Int) {
    /** Release the persisted codes frame (same contract as IvfIndex). */
    def close(): Unit = { codes.unpersist(); () }
  }

  /** Train a PQ index: split each (normalized) vector into `m`
    * subvectors, fit an independent KMeans codebook of `kCent`
    * centroids per subspace (deterministic seed; optionally on a
    * sample — at 100 TB codebooks converge on a few million rows),
    * then encode every vector map-side against the broadcast
    * codebooks. The encode pass aggregates (id, sub) argmins map-side,
    * so its exchange carries O(rows · m) small rows, never the
    * exploded (rows · m · kCent) distance rows.
    */
  def pqBuild(df: DataFrame, id: String, vec: String, m: Int = 8,
              kCent: Int = 16, seed: Long = 42L,
              fitSampleFraction: Double = 1.0): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(m >= 1 && kCent >= 2, "m >= 1, kCent >= 2")
    require(fitSampleFraction > 0 && fitSampleFraction <= 1.0,
      "fitSampleFraction in (0, 1]")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = df.select(size(col(vec))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    val unit = normalized(df.select(col(id), col(vec)), vec)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-subspace codebooks: m independent small KMeans fits (driver
    // loop over m, not over rows; each fit sees |sample| × (dim/m))
    val codebooks = (0 until m).flatMap { s2 =>
      val feat = unit.withColumn("_fv",
        array_to_vector(slice(col(vec), s2 * sub + 1, sub)))
      val fitData = if (fitSampleFraction < 1.0)
        feat.sample(fitSampleFraction, seed + s2) else feat
      val model = new KMeans().setK(kCent).setSeed(seed + s2).setMaxIter(5)
        .setFeaturesCol("_fv").setPredictionCol("_c").fit(fitData)
      model.clusterCenters.zipWithIndex.map { case (c, j) =>
        (s2, j, c.toArray)
      }
    }.toArray
    val cbDf = codebooks.toSeq.toDF("sub", "j", "cvec")
    // encode: (id, sub, subvec) map-side fan-out, broadcast-join the
    // codebooks, per-(id, sub) argmin as min(struct(dist, j)) — partial
    // aggregation keeps the exchange at rows × m
    val subvecs = unit.select(col(id),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col(vec), i * sub + lit(1), lit(sub)))).as(Seq("sub", "sv")))
    val dist = aggregate(zip_with(col("sv"), col("cvec"), (x, y) => {
      val d = x - y; d * d
    }), lit(0.0), (acc, v) => acc + v)
    // eager localCheckpoint (see ivfBuild): the encode pass is two
    // shuffles — a session-wide cache clear must not silently turn
    // every later ADC probe into a full re-encode; probes read stored
    // code blocks, which is what a cluster scanning a written index
    // pays
    val codes = subvecs.join(broadcast(cbDf), Seq("sub"))
      .withColumn("_d", dist)
      .groupBy(col(id), col("sub"))
      .agg(min(struct(col("_d"), col("j"))).as("_best"))
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("sub"), col("_best.j").as("c"))))
        .as("_sc"))
      .select(col(id), expr("transform(_sc, x -> x.c)").as("codes"))
      .localCheckpoint(true) // eager: materialized before unit unpersists
    unit.unpersist()
    PqIndex(codes, codebooks, id, vec, m, kCent)
  }

  /** PQ top-k probe by asymmetric distance (ADC): each query computes
    * its m × kCent table of exact subspace distances to the codebook
    * centroids ONCE, then every corpus vector scores as m table
    * lookups over its codes — no float vector is ever read at scan
    * time. Query side (with tables) broadcasts; the scan is one
    * map-side pass over the codes frame; per-query top-k is the same
    * bounded window as the other ANN tiers. Ranking is squared-L2 on
    * the normalized vectors = cosine order (see [[PqIndex]]).
    */
  def pqTopK(index: PqIndex, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = index.codes.sparkSession
    import spark.implicits._
    val (m, kc) = (index.m, index.kCent)
    val cbDf = index.codebooks.toSeq.toDF("sub", "j", "cvec")
    val dim = index.codebooks.head._3.length * m
    val sub = dim / m
    val q = normalized(
      queries.select(col(index.id).as("query_id"), col(index.vec)),
      index.vec)
    val qsub = q.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col(index.vec), i * sub + lit(1), lit(sub)))).as(Seq("sub", "sv")))
    val dist = aggregate(zip_with(col("sv"), col("cvec"), (x, y) => {
      val d = x - y; d * d
    }), lit(0.0), (acc, v) => acc + v)
    // flat m·kCent distance table per query, indexed [sub·kCent + j]
    val qtab = qsub.join(broadcast(cbDf), Seq("sub"))
      .withColumn("_d", dist)
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(
        (col("sub") * kc + col("j")).as("slot"), col("_d").as("d"))))
        .as("_st"))
      .select(col("query_id"), expr("transform(_st, x -> x.d)").as("dtab"))
    val scored = index.codes
      .select(col(index.id).as("vec_id"), col("codes"))
      .crossJoin(broadcast(qtab))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adist", round(expr(
        s"aggregate(transform(codes, (c, s) -> dtab[s * $kc + c]), " +
          "0D, (acc, v) -> acc + v)"), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("adist"))
  }

  /** IVF-PQ: the standard billion-scale composition (coarse quantizer
    * prunes WHICH vectors a query scans — `nprobe` lists of the IVF
    * index; PQ codes compress WHAT is scanned — ADC lookups instead of
    * float reads), finished by the exact re-rank of a bounded
    * shortlist. Both indexes are prebuilt/amortized; the probe touches
    * ~nprobe/nLists of the code frame and reads full vectors only for
    * queries·shortlist·k candidates.
    *
    * Scale: candidate scan = hash equi-join of the code frame (joined
    * map-side to list assignments) against the broadcast probed-query
    * side; ADC scoring is m table lookups per candidate; both window
    * passes are per-query-bounded. Nothing corpus-sized shuffles.
    */
  def ivfPqTopK(ivf: IvfIndex, pq: PqIndex, corpus: DataFrame,
                queries: DataFrame, k: Int, nprobe: Int = 2,
                shortlist: Int = 4): DataFrame = {
    require(k >= 1 && nprobe >= 1 && shortlist >= 1,
      "k, nprobe, shortlist must be >= 1")
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val centers = ivf.centroids
    val centDf = (0 until centers.numRows).map { i =>
      (i, (0 until centers.numCols).map(j => centers(i, j)).toArray)
    }.toDF("ivf_list", "centroid")
    def sqD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }), lit(0.0), (acc, v) => acc + v)
    // nprobe nearest lists per query — same euclidean metric KMeans
    // assigned with (see ivfTopK)
    val probed = queries
      .select(col(ivf.id).as("query_id"), col(ivf.vec).as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("dist", sqD(col("qv"), col("centroid")))
      .withColumn("_r", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist"), col("ivf_list"))))
      .filter(col("_r") <= nprobe)
      .select(col("ivf_list"), col("query_id"))
    // ADC distance tables per query (same construction as pqTopK)
    val (m, kc) = (pq.m, pq.kCent)
    val cbDf = pq.codebooks.toSeq.toDF("sub", "j", "cvec")
    val sub = pq.codebooks.head._3.length
    val qn = normalized(
      queries.select(col(pq.id).as("query_id"), col(pq.vec)), pq.vec)
    val qsub = qn.select(col("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        i => slice(col(pq.vec), i * sub + lit(1), lit(sub))))
        .as(Seq("sub", "sv")))
    val qtab = qsub.join(broadcast(cbDf), Seq("sub"))
      .withColumn("_d", sqD(col("sv"), col("cvec")))
      .groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(
        (col("sub") * kc + col("j")).as("slot"), col("_d").as("d"))))
        .as("_st"))
      .select(col("query_id"), expr("transform(_st, x -> x.d)").as("dtab"))
    val qside = probed.join(qtab, Seq("query_id"))
    // candidate scan: codes of the probed lists only
    val assigned = ivf.assigned
      .select(col(ivf.id).as("vec_id"), col("ivf_list"))
    val codes = pq.codes.select(col(pq.id).as("vec_id"), col("codes"))
    val cand = codes.join(assigned, Seq("vec_id"))
      .join(broadcast(qside), Seq("ivf_list"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adist", expr(
        s"aggregate(transform(codes, (c, s) -> dtab[s * $kc + c]), " +
          "0D, (acc, v) -> acc + v)"))
      .withColumn("_sr", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("adist").asc, col("vec_id"))))
      .filter(col("_sr") <= k * shortlist)
      .select(col("query_id"), col("vec_id"))
    // exact re-rank of the bounded shortlist
    val c = corpus.select(col(pq.id).as("vec_id"), col(pq.vec).as("cv"))
    val q = queries.select(col(pq.id).as("query_id"), col(pq.vec).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    cand.join(c, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** PQ search with exact re-rank — the production two-stage shape:
    * the ADC code scan shortlists `shortlist·k` candidates per query
    * (cheap, compressed-domain), then ONLY those candidates' full
    * vectors are fetched (one bounded hash equi-join against the
    * corpus — queries·shortlist·k rows, never corpus-sized) and
    * re-ranked by exact cosine. Recall loss is then confined to
    * true-neighbors the shortlist missed, which shrinks geometrically
    * with `shortlist` (sweep in the spec/TUNING.md). Output schema
    * matches [[bruteForceTopK]].
    */
  def pqTopKRefined(index: PqIndex, corpus: DataFrame, queries: DataFrame,
                    k: Int, shortlist: Int = 4): DataFrame = {
    require(shortlist >= 1, "shortlist must be >= 1")
    val cand = pqTopK(index, queries, k * shortlist)
      .select(col("query_id"), col("vec_id"))
    val c = corpus.select(col(index.id).as("vec_id"),
      col(index.vec).as("cv"))
    val q = queries.select(col(index.id).as("query_id"),
      col(index.vec).as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    cand.join(c, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", round(cosine(col("cv"), col("qv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"))
  }

  /** The exact CosineSim accumulation loop on plain float arrays —
    * shared by [[mmrRerank]]'s JVM kernel so its candidate-candidate
    * similarities are bit-identical to the `cosine` Column (and hence
    * to DuckDB's DOUBLE[] cosine, which the oracle uses). Any change
    * here MUST mirror `VectorExpressions.CosineSim`.
    */
  private[graft] def cosineFold(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Maximal-Marginal-Relevance re-rank — the diversity stage retrieval
    * pipelines run AFTER a top-k search: greedily pick, k times, the
    * candidate maximizing `λ·rel − (1−λ)·max_{s∈selected} cos(c, s)`,
    * so near-duplicate hits can't fill the result list. First pick is
    * pure relevance (empty-set max-sim is pinned to 0.0); ties break on
    * the smaller id. Emits (query_id, pos, vec_id, mmr) with the score
    * at selection time, rounded like the search tiers.
    *
    * Determinism/oracle contract: `rel` must be a deterministic
    * engine-portable score (the ROUNDED `sim` from any search tier);
    * λ = lambdaPermille/1000 is dyadic-friendly at the 500 default, and
    * every comparison happens on full-precision doubles produced by
    * the same IEEE op chain on both engines — the DuckDB twin unrolls
    * the identical greedy steps ([[OracleSql]] `mmrSql`).
    *
    * Scale shape: this is the bounded-group typed-kernel tier ((b) in
    * the custom-operator preference order): the SHORTLIST stage bounds
    * every group to ≤ shortlist rows, the groupByKey exchange carries
    * queries·shortlist rows (never the corpus), and the per-group cost
    * is O(k·shortlist²·dim). Feeding it an unbounded per-query set is
    * a contract violation, not a slow path — the selection itself is
    * inherently sequential, so it must never see corpus-sized input.
    */
  def mmrRerank(candidates: DataFrame, queryCol: String, docCol: String,
                relCol: String, vecCol: String, k: Int,
                lambdaPermille: Int = 500): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaPermille >= 0 && lambdaPermille <= 1000,
      "lambdaPermille in [0, 1000]")
    val lam = lambdaPermille / 1000.0
    val ss = candidates.sparkSession
    import ss.implicits._
    val typed = candidates.select(
      col(queryCol).cast("long").as("q"), col(docCol).cast("long").as("d"),
      col(relCol).cast("double").as("rel"), col(vecCol).as("v"))
      .as[(Long, Long, Double, Array[Float])]
    typed.groupByKey(_._1).flatMapGroups { (q, it) =>
      // deterministic candidate order regardless of partition layout
      val cs = it.toArray.sortBy(c => (-c._3, c._2))
      val used = scala.collection.mutable.HashSet[Long]()
      val selected = scala.collection.mutable.ArrayBuffer[Array[Float]]()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double)]()
      var pos = 1
      while (pos <= k && used.size < cs.length) {
        var bestDoc = -1L; var bestVec: Array[Float] = null
        var bestMmr = 0.0
        for (c <- cs if !used.contains(c._2)) {
          val maxSim =
            if (selected.isEmpty) 0.0
            else selected.iterator.map(s => cosineFold(c._4, s)).max
          val mmr = lam * c._3 - (1.0 - lam) * maxSim
          if (bestVec == null || mmr > bestMmr ||
            (mmr == bestMmr && c._2 < bestDoc)) {
            bestDoc = c._2; bestVec = c._4; bestMmr = mmr
          }
        }
        used += bestDoc; selected += bestVec
        // the same HALF_UP rounding as Spark round() (math.round differs
        // on negative exact halves — the VecSumAgg lesson)
        out += ((q, pos, bestDoc, BigDecimal(bestMmr)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        pos += 1
      }
      out.iterator
    }.toDF("query_id", "pos", "vec_id", "mmr")
  }

  /** SemDeDup-style semantic deduplication, in its oracle-checkable
    * form: embeddings are partitioned into sign-pattern cells (the sign
    * of the first `signBits` components — an engine-portable coarse
    * quantizer DuckDB recomputes exactly, standing in for the seeded
    * KMeans clusters of the production path), and within each cell a
    * vector is dropped when a LOWER-ID cell-mate lies above the cosine
    * threshold. The drop rule is pairwise dominance (∃ y < x in the
    * cell with cos(x,y) > τ), not greedy-sequential: deterministic,
    * order-independent, and one self-join in both engines.
    *
    * Scale shape: pairing is within-cell only — never all pairs — and
    * cells larger than `maxCell` are excluded from pairing entirely
    * (their members all survive: a cell that size means the quantizer,
    * not the data, failed) with an optional audit, the minhashLsh cap
    * discipline. The registered query's cap never engages at test
    * scales, so the uncapped oracle twin stays exact. Production
    * variants: [[ivfBuild]] cells + this kernel, or the LSH-bucketed
    * pair listing in [[graft.ext.TextDedup.embeddingNearDupsBucketed]].
    */
  /** Sign-pattern cell id of an embedding column: bit j set iff
    * component j+1 is > 0 — the engine-portable coarse quantizer
    * [[semDedup]] and [[IncrementalSemDedup]] share (one expression,
    * so the two paths cannot bin differently).
    */
  def signCell(v: Column, signBits: Int): Column = {
    require(signBits >= 1 && signBits <= 62, s"signBits in [1,62], got $signBits")
    (0 until signBits).map(j =>
      when(element_at(v, j + 1) > lit(0f), lit(1L << j))
        .otherwise(lit(0L))).reduce(_ + _)
  }

  def semDedup(emb: DataFrame, id: String, vec: String, signBits: Int = 4,
               threshold: Double = 0.45, maxCell: Long = 100000L,
               verbose: Boolean = false): DataFrame = {
    val cellCol = signCell(col("_v"), signBits)
    val cells = emb.select(col(id).as("_vid"), col(vec).as("_v"))
      .withColumn("cell", cellCol)
      .withColumn("_csize", count(lit(1)).over(Window.partitionBy("cell")))
    if (verbose) {
      val over = cells.filter(col("_csize") > maxCell)
        .agg(countDistinct(col("cell")).as("cells"), count(lit(1)).as("rows"))
        .collect()(0)
      if (over.getLong(1) > 0)
        println(s"semDedup: ${over.getLong(0)} cells over maxCell=$maxCell " +
          s"excluded from pairing (${over.getLong(1)} rows survive unpaired)")
    }
    val paired = cells.filter(col("_csize") <= maxCell)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = paired.select(col("cell"), col("_vid").as("id_a"), col("_v").as("va"))
    val b = paired.select(col("cell"), col("_vid").as("id_b"), col("_v").as("vb"))
    // shuffle_hash: both sides are corpus-cardinality (never broadcast)
    val dropped = a.join(b.hint("shuffle_hash"), Seq("cell"))
      .filter(col("id_b") < col("id_a") &&
        cosine(col("va"), col("vb")) > threshold)
      .select(col("id_a").as("_vid")).distinct()
    cells.join(dropped.hint("shuffle_hash"), Seq("_vid"), "left_anti")
      .select(col("_vid").as(id), col("cell"))
  }
}
