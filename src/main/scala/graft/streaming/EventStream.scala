package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.3 O2): the reference's daily
  * cron cadence re-expressed as incremental micro-batch processing.
  * `Trigger.AvailableNow` gives exactly the reference's "process
  * everything that arrived, then stop" daily-batch semantics with
  * checkpointed exactly-once state — but incrementally, which at 100 TB
  * means each run touches only new files instead of rescanning history.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream source over a directory of event files. */
  def readEvents(spark: SparkSession, path: String,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(path)

  /** Watermarked sliding-window aggregation — the incremental form of
    * the batch groupBy/count (T7). Late data beyond the watermark is
    * dropped; state is bounded.
    */
  def windowedCounts(events: DataFrame, window_ : String = "5 minutes",
                     slide: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  final case class PriceState(lastValue: Double, lastVersion: Long, updates: Long)
  final case class PriceUpdate(key: String, value: Double, updates: Long)

  /** Stateful last-write-wins — the streaming form of the reference's
    * ON CONFLICT upsert (T10/S8): per key keep the value with the
    * highest version (event_id) seen so far, across micro-batches — a
    * late batch carrying an older event must not clobber a newer value,
    * so the state stores the high-water version.
    *
    * State retention contract: state expires via event-time timeout
    * once a key has been idle for `stateTTLMs` past the watermark —
    * without it, state grows with key cardinality forever (fine at
    * gas-station scale, fatal at events scale). On expiry the final
    * value is flushed once and the state removed; an event arriving
    * after its key expired starts a fresh version floor (a
    * full-history merge is the batch T10 operator, not streaming
    * state).
    */
  def lastWriteWinsStream(spark: SparkSession, events: DataFrame,
                          watermark: String = "10 minutes",
                          stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    // ts stays in the projection: the analyzer requires the watermarked
    // event-time attribute to survive to the stateful operator
    events.withWatermark("ts", watermark)
      .selectExpr("concat(cast(user_id as string), '|', event_type) as key",
        "value", "event_id", "ts")
      .as[(String, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[PriceState, PriceUpdate](GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[PriceState]) =>
          if (state.hasTimedOut) {
            // idle beyond the retention horizon: flush the final value
            // once, then free the state
            val last = state.get
            state.remove()
            PriceUpdate(key, last.lastValue, last.updates)
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(PriceState(0.0, Long.MinValue, 0L))
            val newest = batch.maxByOption(_._3)
            val next = newest match {
              case Some((_, v, ver, _)) if ver > prev.lastVersion =>
                PriceState(v, ver, prev.updates + batch.size)
              case _ => prev.copy(updates = prev.updates + batch.size)
            }
            state.update(next)
            // expire TTL past the key's own latest event time (bounded
            // below by the watermark: setTimeoutTimestamp must stay
            // ahead of it) — NOT watermark + TTL, which in the first
            // micro-batch (watermark 0) would schedule 1970-era timers
            // that fire the moment real event times advance the clock
            val maxEventMs = batch.map(_._4.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEventMs, state.getCurrentWatermarkMs()) + stateTTLMs)
            PriceUpdate(key, next.lastValue, next.updates)
          }
      }
  }

  final case class AsofRef(t: Long, refId: Long, refValue: Double)
  final case class AsofIn(key: String, t: Long, side: Int, id: Long, value: Double)
  final case class AsofOut(key: String, id: Long, t: Long,
                           ref_id: Option[Long], ref_t: Option[Long],
                           ref_value: Option[Double])

  /** Streaming as-of enrichment — the incremental twin of
    * `op.AsofJoin.asof` (backward): one keyed stream carries both sides
    * (side 0 = reference rows, e.g. quotes; side 1 = probe rows, e.g.
    * trades); each probe row is emitted with the latest reference row
    * at-or-before its time. State is O(1) per key — only the reference
    * high-water row is kept, the monotone-state pattern shared with
    * `lastWriteWinsStream`: a late micro-batch carrying an older
    * reference row cannot clobber newer state.
    *
    * Within a micro-batch rows are processed in (t, side, id) order, so
    * in-order streams reproduce the batch operator exactly (inclusive
    * same-instant match, highest-id tiebreak). Probe rows older than
    * the kept reference (late beyond the O(1) state horizon) emit an
    * unmatched row rather than a wrong one — a full late-data replay is
    * a batch `AsofJoin` over the historical table, not streaming state.
    *
    * State retention contract: `t` is interpreted as event-time epoch
    * MILLIS; a key whose reference has been idle for `stateTTLMs` past
    * the watermark is dropped silently (expired state emits nothing —
    * probes for that key thereafter emit unmatched until a new
    * reference row arrives). Without the timeout, one reference row is
    * retained per key forever.
    */
  def streamingAsof(spark: SparkSession, tagged: DataFrame,
                    watermark: String = "10 minutes",
                    stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    tagged
      .withColumn("_event_ts", timestamp_millis(col("t").cast("long")))
      .withWatermark("_event_ts", watermark)
      .as[AsofIn].groupByKey(_.key)
      .flatMapGroupsWithState[AsofRef, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[AsofRef]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var ref = state.getOption
            val batch = rows.toSeq
            val out = Vector.newBuilder[AsofOut]
            batch.sortBy(e => (e.t, e.side, e.id)).foreach { e =>
              if (e.side == 0) {
                if (ref.forall(r => r.t < e.t || (r.t == e.t && r.refId < e.id)))
                  ref = Some(AsofRef(e.t, e.id, e.value))
              } else {
                val m = ref.filter(_.t <= e.t)
                out += AsofOut(key, e.id, e.t,
                  m.map(_.refId), m.map(_.t), m.map(_.refValue))
              }
            }
            ref.foreach { r =>
              state.update(r)
              // TTL past the key's latest event time, never behind the
              // watermark (see lastWriteWinsStream)
              state.setTimeoutTimestamp(
                math.max(batch.map(_.t).max, state.getCurrentWatermarkMs()) + stateTTLMs)
            }
            out.result().iterator
          }
      }
  }

  final case class RollState(ringCents: Vector[Long])
  final case class RollOut(user_id: Long, event_id: Long,
                           roll_sum: Double, roll_n: Long, roll_avg: Double)

  /** Streaming rolling-window statistics — the incremental twin of
    * `op.Stats.rollingAgg`: per user, the sum/count/mean of `value` over
    * the trailing `window` rows in (ts, event_id) order. State is a
    * bounded ring of the last `window` values per key (never the
    * history), expired by the same event-time TTL contract as
    * [[lastWriteWinsStream]].
    *
    * Parity discipline: the batch operator accumulates DECIMAL(18,2);
    * here each value is scaled to exact integer cents, summed as longs,
    * and divided back once — so on in-order streams the emitted numbers
    * equal the batch operator's bit for bit (StreamSpec asserts it).
    * Rows arriving out of order across micro-batches see the ring as of
    * arrival (their trailing window is approximate); an exact late-data
    * replay is the batch operator over the historical table.
    */
  def rollingStatsStream(spark: SparkSession, events: DataFrame,
                         window: Int = 5,
                         watermark: String = "10 minutes",
                         stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    require(window >= 1, "window must be >= 1")
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "event_id", "value", "ts")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RollState, RollOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[RollState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var ring = state.getOption.map(_.ringCents).getOrElse(Vector.empty)
            val batch = rows.toSeq.sortBy(r => (r._4.getTime, r._2))
            val out = batch.map { case (uid, id, v, _) =>
              ring = (ring :+ math.round(v * 100)).takeRight(window)
              val sum = ring.sum / 100.0
              val avg = BigDecimal(sum / ring.size)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              RollOut(uid, id, sum, ring.size, avg)
            }
            state.update(RollState(ring))
            state.setTimeoutTimestamp(math.max(batch.map(_._4.getTime).max,
              state.getCurrentWatermarkMs()) + stateTTLMs)
            out.iterator
          }
      }
  }

  final case class ScdState(state: String, validFromMs: Long, n: Long)
  final case class ScdOut(user_id: Long, state: String,
                          valid_from: java.sql.Timestamp,
                          valid_to: Option[java.sql.Timestamp],
                          n_snapshots: Long, is_current: Boolean)

  /** Streaming SCD2 — the incremental twin of `op.Scd.collapse`: per
    * key, consecutive same-state snapshots extend the OPEN interval;
    * a state flip closes it (emitted once, `valid_to` = the flip time)
    * and opens the next. State is O(1) per key — only the open
    * interval, never history.
    *
    * On in-order streams the closed intervals equal the batch
    * operator's bit for bit (StreamSpec asserts it); the one open
    * interval per key lives in state and is flushed as `is_current`
    * when the key expires via the shared event-time-TTL contract
    * ([[lastWriteWinsStream]]). Out-of-order snapshots across
    * micro-batches see intervals as of arrival; the exact late-data
    * replay is the batch operator over the historical table.
    */
  def scd2Stream(spark: SparkSession, events: DataFrame,
                 watermark: String = "10 minutes",
                 stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ScdState, ScdOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[ScdState]) =>
          if (state.hasTimedOut) {
            // retention horizon: flush the open interval as current
            val fin = state.getOption.map(c => ScdOut(key, c.state,
              new java.sql.Timestamp(c.validFromMs), None, c.n, true))
            state.remove()
            fin.iterator
          } else {
            val batch = rows.toSeq.sortBy(_._3.getTime)
            var cur = state.getOption
            val closed = Vector.newBuilder[ScdOut]
            batch.foreach { case (_, st, ts) =>
              cur match {
                case Some(c) if c.state == st => cur = Some(c.copy(n = c.n + 1))
                case Some(c) =>
                  closed += ScdOut(key, c.state,
                    new java.sql.Timestamp(c.validFromMs),
                    Some(ts), c.n, is_current = false)
                  cur = Some(ScdState(st, ts.getTime, 1))
                case None => cur = Some(ScdState(st, ts.getTime, 1))
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(math.max(batch.map(_._3.getTime).max,
                state.getCurrentWatermarkMs()) + stateTTLMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming key dedup — the incremental form of the reference's
    * T5/T6 "insert only if unseen" (the anti-join against all history
    * becomes watermarked streaming state): each key is emitted once;
    * duplicates arriving within the watermark horizon are dropped by
    * Spark's dedup state store.
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     tsCol: String = "ts",
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming → JDBC upsert: the production shape of the reference's
    * daily price merge — each micro-batch is last-write-wins-merged and
    * then upserted transactionally per partition via foreachBatch.
    * Exactly-once per key-version: re-delivered batches overwrite with
    * identical values.
    */
  def upsertEachBatch(df: DataFrame, url: String, table: String,
                      conflictKeys: Seq[String],
                      version: Seq[org.apache.spark.sql.Column],
                      dialect: graft.sink.Sinks.UpsertDialect =
                        graft.sink.Sinks.postgresDialect)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val merged = graft.op.Dedup.lastWriteWins(batch, conflictKeys, version)
      graft.sink.Sinks.jdbcUpsert(merged, url, table, conflictKeys,
        dialect = dialect)
    }

  final case class QuotaState(emitted: Long)

  /** Streaming per-group quota — the incremental form of
    * `Sampling.capPerGroup`, with the honest streaming contract: a
    * stream cannot rank rows it has not seen, so the survivors are
    * the FIRST k rows to ARRIVE per group (ties inside a micro-batch
    * resolve by id, so a replayed batch emits identically), not the
    * k best under a global priority — when the corpus is complete,
    * re-rank offline with the batch cap. The state is ONE counter per
    * group (O(groups), never O(rows)), and it never expires: a
    * filled quota that timed out would silently re-open, so
    * NoTimeout is the correct retention policy here, unlike the
    * value-carrying states above.
    */
  def quotaStream(spark: SparkSession, docs: DataFrame, group: String,
                  idCol: String, k: Int) = {
    import spark.implicits._
    require(k >= 1, "k must be >= 1")
    docs.selectExpr(s"cast($group as string) as g",
        s"cast($idCol as long) as id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[QuotaState, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (g, rows, state: GroupState[QuotaState]) =>
          val prev = state.getOption.map(_.emitted).getOrElse(0L)
          val room = (k - prev).max(0L).toInt
          val take = rows.map(_._2).toSeq.sorted.take(room)
          state.update(QuotaState(prev + take.size))
          take.iterator.map(id => (g, id))
      }
      .toDF("source", "doc_id")
  }

  /** Streaming BM25-scored routing — the incremental twin of
    * `TextAnalysis.bm25Route`: incoming documents are scored against a
    * FROZEN [[graft.ext.TextAnalysis.Bm25Snapshot]] (corpus stats +
    * route-term dfs snapshotted once from a reference corpus) and each
    * doc's best route is appended to the sink. Because a document's
    * score depends only on its own tokens and the frozen model, there
    * is no cross-batch state at all: each micro-batch runs the EXACT
    * batch kernel via foreachBatch, so stream output is bit-equal to
    * the batch operator under any batch split (spec-asserted).
    *
    * Model staleness is the explicit contract (class doc of
    * Bm25Snapshot): route quality drifts as the live corpus diverges
    * from the snapshot — production re-snapshots on a cadence and
    * swaps the model between micro-batches by restarting the query.
    */
  def bm25RouteStream(docs: DataFrame, text: String, id: String,
                      model: graft.ext.TextAnalysis.Bm25Snapshot,
                      k1: Double = 1.2, b: Double = 0.75)
                     (sink: DataFrame => Unit)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ext.TextAnalysis.bm25Route(batch, text, id, model, k1, b))
    }

  /** Streaming decontamination — the incremental twin of
    * `TextDedup.decontaminate`: each incoming micro-batch of documents
    * is filtered against a FROZEN benchmark table (the eval suites a
    * crawl must never leak), surviving docs appended to the sink. A
    * document's keep decision depends only on its own shingles and the
    * static benchmark side — no cross-batch state — so each
    * micro-batch runs the EXACT batch kernel via foreachBatch and the
    * stream output is bit-equal to the batch operator under any batch
    * split (spec-asserted).
    *
    * This is the deployment shape for ingest-time decontamination:
    * benchmarks change rarely (the model-staleness contract of
    * [[bm25RouteStream]] applies — swap the benchmark table by
    * restarting the query); the corpus streams in daily.
    */
  def decontaminateStream(docs: DataFrame, text: String, id: String,
                          benchmark: DataFrame, benchText: String,
                          shingleN: Int = 3, minOverlap: Long = 1)
                         (sink: DataFrame => Unit)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ext.TextDedup.decontaminate(batch, text, id,
        benchmark, benchText, shingleN, minOverlap))
    }

  /** Streaming passage-reuse detection — the incremental twin of
    * `TextDedup.winnowingCrossMatches`: each micro-batch of incoming
    * documents is fingerprinted and probed against the FROZEN corpus
    * side. Stateless per doc (fingerprints depend only on the doc's
    * own tokens; the corpus side is static), so each micro-batch runs
    * the exact batch kernel and stream output is bit-equal to the
    * batch operator under any split. Corpus refresh = query restart
    * (the [[bm25RouteStream]] staleness contract).
    */
  def winnowCrossStream(docs: DataFrame, corpus: DataFrame,
                        text: String, id: String,
                        k: Int = 3, w: Int = 4, minShared: Long = 3,
                        portableHash: Boolean = true)
                       (sink: DataFrame => Unit)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(graft.ext.TextDedup.winnowingCrossMatches(batch, corpus,
        text, id, k, w, minShared, portableHash))
    }

  /** Streaming near-dup guard: flag incoming documents whose portable
    * 32-bit simhash is within `maxHamming` of any reference-corpus
    * document — (doc_id, corpus_id, hamming), append mode.
    *
    * Unlike the foreachBatch twins above, this is a PURE streaming
    * transformation: the signature is a map-side expression, the chunk
    * explode is stateless, the corpus join is a stream-static equi-join
    * on chunk pieces, and pair-dedup is the first-agreeing-chunk filter
    * instead of a distinct() — so there is NO state store, no
    * watermark, and the micro-batch output is independent of batch
    * boundaries. The corpus's keyed signature table persists across
    * micro-batches (static-side cache).
    */
  def simhashGuardStream(docs: DataFrame, corpus: DataFrame,
                         text: String, id: String,
                         maxHamming: Int = 3): DataFrame =
    graft.ext.TextDedup.simhashCrossPortable(docs, corpus, text, id, maxHamming)

  /** Streaming admission guard: pass through only documents whose
    * normalized text is NOT already in the reference corpus — the
    * streaming twin of [[graft.ext.BloomGuard.newDocs]], delegated to
    * the batch kernel so stream and batch semantics are one code path.
    *
    * PURE streaming transformation: the corpus sketch is built ONCE
    * from the static side at plan time (the [[bm25RouteStream]]
    * frozen-model contract — corpus refresh = query restart) and rides
    * the plan as a codegen'd map-side probe; sketch misses bypass the
    * join entirely, and only candidate rows pay the stream-static
    * anti-join. No state store, no watermark: the admission decision is
    * per-row, so micro-batch boundaries cannot change the output.
    * Rows admitted here and appended to the corpus become visible to
    * the guard at the NEXT restart, not the next micro-batch — the
    * intra-stream first-occurrence dedup is [[streamingDedup]]'s job.
    */
  def bloomGuardStream(docs: DataFrame, corpus: DataFrame, text: String,
                       fpp: Double = 0.01): DataFrame =
    graft.ext.BloomGuard.newDocs(docs, corpus, text, fpp)

  /** Online retrieval: a STREAM of query vectors probed against the
    * static embedding corpus — the streaming twin of
    * [[graft.ext.VectorSearch.annCandidates]], delegated to the batch
    * kernel so stream and batch semantics are one code path. PURE
    * stream-static shape: the corpus is bucketed at plan time (the
    * frozen-model contract — corpus refresh = query restart), each
    * query row map-side expands to its probed buckets and equi-joins
    * the static side; no state store, no watermark — per-row
    * candidates, so micro-batch boundaries cannot change the output.
    * Emits (query_id, vec_id, sim) CANDIDATES in append mode; the
    * top-k argmax stays with the consumer (window functions are not
    * available on append streams, and a stateful per-query top-k
    * could never retract an emitted winner) — the same
    * candidates-plus-batch-selection contract as
    * [[attributionCandidatesStream]].
    */
  def annCandidatesStream(queries: DataFrame, corpus: DataFrame,
                          id: String, vec: String, bits: Int = 8,
                          probeNeighbors: Int = 0): DataFrame =
    graft.ext.VectorSearch.annCandidates(corpus, queries, id, vec, bits,
      probeNeighbors)
      .select(col("query_id"), col("vec_id"), col("sim"))

  /** TRUE stream-stream interval join — the one Structured Streaming
    * join shape with state on BOTH sides, and the streaming twin of
    * [[graft.op.Attribution.lastTouch]]. Conversions are joined to
    * every qualifying touch of the same user inside the horizon
    * (`touch_ts <= conv_ts <= touch_ts + horizon`). Both inputs carry a
    * watermark and the join condition bounds each side's event time by
    * the other's, which is exactly what lets Spark expire BOTH state
    * stores: a touch older than `watermark + horizon` can never match a
    * future conversion and is dropped, symmetrically for conversions.
    * Without the band, stream-stream inner join state grows forever.
    *
    * Emits CANDIDATE pairs in append mode. The last-touch argmax is
    * deliberately left to the batch operator: chaining a stateful
    * aggregation behind a stream-stream join would stack two state
    * stores, and a late touch could never retract an already-emitted
    * "winner" — candidates + batch replay is the honest contract
    * (same late-data stance as [[streamingAsof]]).
    */
  def attributionCandidatesStream(touches: DataFrame, conversions: DataFrame,
                                  user: String, tsCol: String, idCol: String,
                                  horizon: String = "30 minutes",
                                  watermark: String = "10 minutes",
                                  joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer")
    val t = touches.select(col(user).as("t_user"),
      col(tsCol).as("touch_ts"), col(idCol).as("touch_id"))
      .withWatermark("touch_ts", watermark)
    val c = conversions.select(col(user).as("c_user"),
      col(tsCol).as("conv_ts"), col(idCol).as("conv_id"))
      .withWatermark("conv_ts", watermark)
    // left_outer = conversions side preserved: an UNATTRIBUTED
    // conversion is emitted with null touch columns once the watermark
    // proves no in-horizon touch can still arrive (so outer rows are
    // late by one watermark delay — the price of correctness)
    c.join(t, expr(
      s"t_user = c_user AND touch_ts <= conv_ts AND " +
        s"conv_ts <= touch_ts + interval $horizon"), joinType)
      .select(col("c_user").as(user), col("conv_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"))
  }

  /** File-sink streaming with a durable checkpoint — the exactly-once
    * production shape. The checkpoint (source offsets + sink commit
    * log) is what makes restarts INCREMENTAL: a re-run against the same
    * checkpoint processes only files that arrived since the last
    * commit, and a crash between write and commit replays into the
    * same epoch id, so the parquet sink's commit protocol discards the
    * partial output (no duplicates, no loss). AvailableNow = the
    * daily-batch trigger: drain everything pending, then stop —
    * cron-driven batch cadence with streaming-grade bookkeeping
    * (SURVEY §2.3 O2).
    */
  def runToParquet(df: DataFrame, outPath: String,
                   checkpointPath: String): Unit = {
    val q = df.writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  /** Run a streaming query to completion over currently-available data
    * (the daily-batch trigger), writing to an in-memory sink — used by
    * tests; production swaps the sink for parquet/kafka.
    */
  /** Full-precision event-time nanos from a java.sql.Timestamp —
    * `getTime` alone truncates to MILLIS, which would let two
    * same-millisecond events sort by id instead of their true
    * sub-ms order and diverge from the batch (ts, event_id) kernels
    * (the test events carry sub-ms components). getNanos holds the
    * entire sub-SECOND fraction, so seconds must come from a floor
    * division of getTime (negative-epoch safe).
    */
  private def tsNanos(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

  final case class TransState(t: Long, id: Long, tpe: String)
  final case class TransPair(user_id: Long, from_type: String, to_type: String,
                             from_event_id: Long, to_event_id: Long)

  /** Stateful per-user transition pairing — the incremental twin of
    * `t_event_transitions`' lead kernel: each user's adjacent
    * (from_type → to_type) event pairs, emitted as they become known
    * across micro-batches. State is O(1) per key — only the last seen
    * (ts, event_id, event_type) is carried, the monotone-state pattern
    * shared with `streamingAsof`: the carried row is the head of the
    * next batch's pair chain, so a session split across any number of
    * micro-batches yields exactly the batch operator's pairs.
    *
    * Ordering contract: within a micro-batch rows are sorted by
    * (ts, event_id), so in-order streams reproduce the batch lead
    * kernel bit-for-bit. A row arriving LATE — behind the carried
    * state's event time — is paired in arrival order (it extends the
    * chain rather than splicing into history); replaying true order
    * over late data is the batch operator over the historical table,
    * not streaming state. Downstream aggregation to the transition
    * matrix is a plain streaming groupBy over this output.
    *
    * State retention: event-time timeout `stateTTLMs` past the key's
    * own latest event time (never behind the watermark — the
    * lastWriteWinsStream timer discipline); an expired key emits
    * nothing and the next event starts a fresh chain.
    */
  def transitionPairsStream(spark: SparkSession, events: DataFrame,
                            watermark: String = "10 minutes",
                            stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TransState, TransPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // state.t carries full-precision NANOS; the timeout clock
            // below needs millis
            val batch = rows.toSeq.map(r => (tsNanos(r._2), r._3, r._4))
              .sortBy(r => (r._1, r._2))
            val chain = state.getOption.map(s => (s.t, s.id, s.tpe)).toList ++ batch
            val pairs = chain.sliding(2).collect {
              case Seq(a, b) => TransPair(user, a._3, b._3, a._2, b._2)
            }.toList
            val last = chain.last
            state.update(TransState(last._1, last._2, last._3))
            state.setTimeoutTimestamp(
              math.max(last._1 / 1000000L, state.getCurrentWatermarkMs()) + stateTTLMs)
            pairs.iterator
          }
      }
  }

  // s/q are string-encoded BigInt: Long moments wrap on q += v*v at
  // v >= ~3.04e9 cents (~$30M — well inside decimal(18,2)), silently
  // corrupting Q. The batch twin (t_outlier_events) runs DECIMAL(38,0)
  // for the same reason; this state mirrors that exactness.
  //
  // CHECKPOINT COMPATIBILITY: the round-10 Long→String change ALTERED
  // the flatMapGroupsWithState state encoder schema. A
  // runningOutlierStream restarted on a checkpoint written by the old
  // (Long s/q) build fails state-schema validation at start — there is
  // no in-place migration; restart such a stream from a NEW checkpoint
  // location (the source replays from its own offsets; prior per-user
  // moments re-accumulate). Version any future state change the same
  // way: new checkpoint, or a read-time upgrade shim.
  final case class MomState(n: Long, s: String, q: String)
  final case class OutlierFlag(user_id: Long, event_id: Long, cents: Long,
                               n_prior: Long, is_outlier: Boolean)

  /** Streaming 3σ anomaly flags — the incremental cousin of the batch
    * `t_outlier_events` query with STREAMING semantics: each event is
    * tested against the user's history SO FAR (the prior-state
    * moments, excluding the event itself), then folded into the state.
    * That is the online monitoring contract — the batch operator's
    * whole-corpus moments are a different (retrospective) question.
    *
    * The test is the same divisions-cleared integer comparison,
    * (v·n − S)² > 9·(n·Q − S²), evaluated in BigInt, and the STORED
    * moments are BigInt too (string-encoded in state) — Long storage
    * would wrap Q at a single cents value ≥ ~3.04e9 with no error,
    * the exact overflow the batch twin's DECIMAL(38,0) move fixed.
    * Prior n ≥ 2 is
    * required to flag (σ of one point is undefined). Within a
    * micro-batch rows fold in (ts, event_id) order, so in-order
    * streams are deterministic under any batch split.
    */
  def runningOutlierStream(spark: SparkSession, events: DataFrame,
                           watermark: String = "10 minutes",
                           stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .filter(col("value").isNotNull)
      .selectExpr("user_id", "ts", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MomState, OutlierFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[MomState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // full-precision nanos order — getTime truncates to ms and
            // can reverse same-millisecond folds vs the batch kernel
            val batch = rows.toSeq.sortBy(r => (tsNanos(r._2), r._3))
            val st0 = state.getOption.getOrElse(MomState(0L, "0", "0"))
            var nAcc = st0.n
            var sAcc = BigInt(st0.s)
            var qAcc = BigInt(st0.q)
            val out = batch.map { case (_, _, id, v) =>
              val flag = nAcc >= 2 && {
                val n = BigInt(nAcc)
                val dev = BigInt(v) * n - sAcc
                dev * dev > 9 * (n * qAcc - sAcc * sAcc)
              }
              val bv = BigInt(v)
              nAcc += 1; sAcc += bv; qAcc += bv * bv
              OutlierFlag(user, id, v, nAcc - 1, flag)
            }
            state.update(MomState(nAcc, sAcc.toString, qAcc.toString))
            val maxEventMs = batch.map(_._2.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxEventMs, state.getCurrentWatermarkMs()) + stateTTLMs)
            out.iterator
          }
      }
  }

  final case class IslandState(s: Long, f: Long, n: Long)
  final case class Island(user_id: Long, i_start: Long, i_end: Long,
                          n_spans: Long)

  /** Streaming interval-union islands — the incremental twin of
    * `op.Intervals.mergeIntervals` for activity/uptime monitoring:
    * each event opens a `spanNs` window; overlapping/adjacent windows
    * merge into islands per user, and an island is EMITTED exactly
    * once — the moment a later span proves it closed (starts past its
    * end), or at state expiry for the final open island. State is
    * O(1) per key: only the open island.
    *
    * In-order streams reproduce the batch operator's islands exactly
    * (within a micro-batch spans fold in full-precision time order).
    * A late span behind the open island's start extends/merges into
    * it rather than reopening history — replaying true order over
    * late data is the batch operator, the streamingAsof contract.
    */
  def activityIslandsStream(spark: SparkSession, events: DataFrame,
                            spanNs: Long = 600000000000L,
                            watermark: String = "10 minutes",
                            stateTTLMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    require(spanNs > 0)
    events.withWatermark("ts", watermark)
      .selectExpr("user_id", "ts")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[IslandState, Island](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state: GroupState[IslandState]) =>
          if (state.hasTimedOut) {
            val last = state.getOption.map(st =>
              Island(user, st.s, st.f, st.n))
            state.remove()
            last.iterator
          } else {
            val spans = rows.toSeq.map(r => tsNanos(r._2)).sorted
              .map(s0 => (s0, s0 + spanNs))
            var cur = state.getOption
            val closed = scala.collection.mutable.ListBuffer[Island]()
            spans.foreach { case (s0, f0) =>
              cur match {
                case Some(st) if s0 > st.f =>
                  closed += Island(user, st.s, st.f, st.n)
                  cur = Some(IslandState(s0, f0, 1L))
                case Some(st) =>
                  cur = Some(IslandState(math.min(st.s, s0),
                    math.max(st.f, f0), st.n + 1L))
                case None =>
                  cur = Some(IslandState(s0, f0, 1L))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.f / 1000000L, state.getCurrentWatermarkMs())
                  + stateTTLMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming lakehouse ingest: fold a change stream into a
    * partitioned parquet table, one [[graft.sink.ParquetMerge]]
    * partition-level merge per micro-batch. The merge is last-write-
    * wins by `ver`, which makes the sink IDEMPOTENT — a micro-batch
    * replayed after a crash (foreachBatch's at-least-once contract)
    * re-merges to the identical table, so checkpoint + LWW = effective
    * exactly-once without a transaction log. Only partitions present
    * in each batch are read or rewritten.
    */
  def mergeStream(changes: DataFrame, dir: String, partCol: String,
                  key: String, ver: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sink.ParquetMerge.upsertPartitions(
          b.sparkSession, dir, b.toDF(), partCol, key, ver)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  def runAvailableNow(df: DataFrame, queryName: String,
                      outputMode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.outputMode(outputMode)
      .format("memory").queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }
}
