package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import java.sql.Timestamp

/**
 * Structured Streaming pipelines over the events schema (SURVEY.md §1.3 noted
 * streaming as out of reference scope; the driver north-star includes it for
 * the events table). Each pipeline is the streaming twin of a batch query in
 * [[graft.queries.EventQueries]], so batch results are the correctness oracle
 * (StreamingSpec runs both and diffs).
 *
 * Design for scale:
 *  - file source with `maxFilesPerTrigger`/`Trigger.AvailableNow` — replayable
 *    and backpressured, the same pattern as a real object-store feed;
 *  - watermarks bound state: the hourly aggregation keeps only windows newer
 *    than the watermark, so state is O(active windows), not O(history);
 *  - sessionization uses flatMapGroupsWithState with event-time timeout — the
 *    canonical unbounded-keyed-state pattern with explicit state eviction.
 */
object Streams {

  /** Schema of the events stream = batch schema with ts normalized to a
    * microsecond TIMESTAMP (ltz). The on-disk flavor has varied across
    * driver rounds (TIMESTAMP(NANOS)-as-Long, then naive µs), so take the
    * file's actual schema from a batch peek and share the batch loader's
    * normalization ([[graft.sources.Tables.normalizeEventTs]]).
    *
    * When no events file exists yet at definition time (the normal
    * stream-before-data pattern — the feed directory starts empty), the peek
    * fails and we fall back to the static schema below (the current driver
    * flavor: naive-µs `ts`, which `normalizeEventTs` casts to ltz). A feed
    * whose first files arrive in a DIFFERENT historical flavor must be
    * defined after at least one file exists so the peek can see it. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema =
      try spark.read.option("pathGlobFilter", "events.parquet").parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException => staticEventSchema
      }
    graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Fallback events schema for defining the stream before any data lands
    * (FIXTURES.md events table, naive-µs ts flavor). */
  private[graft] val staticEventSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** Streaming hourly windowed aggregation with a 2-hour watermark —
    * streaming twin of EventQueries.e1_hourly_agg. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           expr("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming HOPPING-window aggregation (1-hour windows every 15 min) —
    * streaming twin of EventQueries.e8_hopping_window. Same watermarked
    * state shape as hourlyAgg; state holds window_len/slide = 4 overlapping
    * windows per (slide, type) until the watermark closes them. */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class SessionState(sessionId: Long, nEvents: Long,
                                startUs: Long, lastUs: Long)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                              session_start: Timestamp, session_end: Timestamp)

  private val GapUs: Long = 30L * 60 * 1000000

  /** Microsecond-faithful Timestamp reconstruction (the millis constructor
    * alone would truncate to milliseconds). */
  private def tsFromUs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(((us - math.floorDiv(us, 1000000L) * 1000000L) * 1000L).toInt)
    t
  }

  /** Epoch micros of an event's timestamp: getTime() millis already include
    * nanos/1e6, so rebuild from whole seconds + fractional nanos. */
  private def epochUs(e: Event): Long =
    math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000

  /** Event-time watermark delay for the sessionizer — the disorder bound a
    * real feed is allowed, and with it the state-eviction horizon: an open
    * session whose gap deadline falls behind the watermark is CLOSED BY
    * TIMEOUT (emitted + state removed). */
  private val SessionWatermark = "2 hours"

  /** Gap-based sessionization (30-min inactivity) via flatMapGroupsWithState —
    * streaming twin of EventQueries.e2_sessions. State per user is O(1): the
    * open session only; closed sessions are emitted downstream.
    *
    * STATE EVICTION (r15 streaming review — previously NoTimeout, which
    * contradicted the header's bounded-state claim: a user seen once kept a
    * state row forever and their final session never emitted): the stream
    * sets an EVENT-TIME TIMEOUT at the open session's gap deadline
    * (lastUs + GapUs). When the watermark — max event time minus
    * [[SessionWatermark]] — passes it, the session can no longer be
    * extended by any in-watermark event, so it is emitted as closed and
    * the user's state row is REMOVED. State is then bounded by the
    * recently-active-user population, not by every user ever seen.
    *
    * session_id ordinal caveat that follows: the per-user ordinal counts
    * sessions within one state lifetime — a user who returns AFTER being
    * evicted restarts at 1 (remembering the count forever is exactly the
    * unbounded state this fix removes). (user_id, session_start) is the
    * globally stable session key; batch-ordinal parity holds on any replay
    * where no evicted user reappears (single-batch replays, active users).
    *
    * NOTE on semantics: with in-order-per-batch processing this matches the
    * batch lag/cumsum formulation as long as a user's events arrive in
    * timestamp order across triggers (true for the replayed single-file
    * source; real feeds rely on the watermark to bound disorder).
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", SessionWatermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap deadline behind the watermark: no in-watermark event can
            // extend this session — close it and evict the user's row
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, st.sessionId, st.nEvents,
              tsFromUs(st.startUs), tsFromUs(st.lastUs)))
          } else {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var st = state.getOption.orNull
          // Size note: this buffers + sorts ONE user's events from ONE
          // trigger (cross-trigger order is carried by SessionState, which
          // stays O(1)). The executor-memory bound is therefore the hottest
          // user within a single micro-batch — fine under replay and normal
          // traffic; a pathological single-user storm would need a
          // per-trigger rate cap upstream, not more state here.
          // Sort by the same epoch-micros value the gap comparison uses —
          // ordering by getTime (millis) would let two events inside one
          // millisecond but in different microseconds process out of order.
          for (e <- it.toSeq.sortBy(ev => (epochUs(ev), ev.event_id))) {
            val us = epochUs(e)
            if (st == null) {
              st = SessionState(1L, 1L, us, us)
            } else if (us - st.lastUs > GapUs) {
              out += SessionOut(userId, st.sessionId, st.nEvents,
                tsFromUs(st.startUs), tsFromUs(st.lastUs))
              st = SessionState(st.sessionId + 1, 1L, us, us)
            } else {
              st = st.copy(nEvents = st.nEvents + 1, lastUs = us)
            }
          }
          if (st != null) {
            state.update(st)
            // arm the eviction clock at the open session's gap deadline;
            // clamped above the current watermark because Spark refuses a
            // timeout already in the past (reachable via events later than
            // the batch's watermark snapshot but with an old session tail)
            state.setTimeoutTimestamp(math.max(
              st.lastUs / 1000 + GapUs / 1000, state.getCurrentWatermarkMs + 1))
          }
          out.iterator
          }
      }
  }

  /** Run the hourly aggregation end-to-end over the existing events file with
    * Trigger.AvailableNow into an in-memory sink; returns the result table.
    * Complete mode so trailing windows (younger than the watermark at end of
    * input) are also emitted — under a live Append-mode sink those would
    * emit on the next watermark advance. */
  def runHourlyAggOnce(spark: SparkSession, dir: String, queryName: String = "hourly_agg"): DataFrame = {
    val q: StreamingQuery = hourlyAgg(eventStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Run the hopping-window aggregation end-to-end (same harness as
    * [[runHourlyAggOnce]]). */
  def runHoppingAggOnce(spark: SparkSession, dir: String, queryName: String = "hopping_agg"): DataFrame = {
    val q: StreamingQuery = hoppingAgg(eventStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stream-stream inner join with event-time bounds: each purchase joined
    * to the same user's clicks in the preceding hour. Both sides carry
    * watermarks and the join condition bounds event time on both ends, so
    * state on each side is evicted once the watermark passes the bound —
    * the canonical bounded-state stream-stream join. */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_event"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_event"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_event"), col("c_event"), col("p_ts"), col("c_ts"))
  }

  final case class FunnelState(t1: Option[Long], t2: Option[Long])
  final case class FunnelOut(user_id: Long, stage_reached: Int, is_final: Boolean)

  /** Conversion horizon of the streaming funnel: a journey that has not
    * advanced a stage in this long is ABANDONED — its final stage is emitted
    * and the user's state row evicted. The dial every funnel product defines
    * ("attribution window"); 7 days here. */
  private[streaming] val FunnelHorizonUs: Long = 7L * 24 * 3600 * 1000000L

  /** Event-time watermark delay for the funnel — the disorder bound, and
    * with it the eviction clock's reference (a deadline behind the watermark
    * can no longer be beaten by any in-watermark event). */
  private val FunnelWatermark = "2 hours"

  /** Streaming twin of e10_funnel (strict view → click → purchase) via
    * flatMapGroupsWithState: per-user state is EXACTLY two optional
    * first-time stamps of the OPEN journey — O(1) regardless of a user's
    * event volume, never a history buffer. One in-timestamp-order pass
    * equals the batch min-chain: the first view is min(view ts); the first
    * click strictly after a set t1 is min(click ts > t1); likewise the
    * converting purchase. Update-mode emission: each trigger re-emits a
    * touched user's CURRENT stage (an upsert sink keeps the latest row per
    * user); `is_final` marks the journey-closing emissions (conversion or
    * abandonment) so a downstream can separate settled journeys from
    * running ones.
    *
    * STATE EVICTION (VERDICT r15 #1 — previously NoTimeout, the third
    * instance of the unbounded-state class the r15 review fixed in
    * [[dedupStream]] and [[sessionize]]: one state row per user EVER seen,
    * converted users included, never freed):
    *  - CONVERSION evicts immediately — a purchase strictly after a set
    *    click closes the journey, emits (stage 3, is_final=true) and drops
    *    the stamps; nothing about a settled journey needs remembering.
    *  - ABANDONMENT evicts by EVENT-TIME TIMEOUT, the [[sessionize]]
    *    template: the clock is armed at last-stage-advance +
    *    [[FunnelHorizonUs]]; when the watermark (max event time minus
    *    [[FunnelWatermark]]) passes it, the journey can no longer advance
    *    within the disorder bound, so its final stage is emitted with
    *    is_final=true and the row removed.
    *  - A user entering events but never a view holds NO state at all
    *    (nothing to time out; the batch contract starts a funnel at a view).
    * State is then bounded by the users with a journey OPEN inside the
    * horizon, not by every user ever seen.
    *
    * Re-entry caveat that follows (the [[sessionize]] ordinal caveat's
    * funnel shape): a view AFTER a settled journey starts a NEW journey at
    * stage 1 — remembering settled journeys forever is exactly the
    * unbounded state this fix removes. An upsert sink keyed on
    * max(stage_reached) is unaffected (stages of any journey are ≤ 3 and a
    * conversion already emitted its 3); exact batch-e10 equality holds on
    * replays where no abandoned journey's user advances again after
    * eviction (single-batch replays trivially; live feeds inside the
    * horizon). A post-timeout straggler advancing an evicted journey is
    * counted against a fresh journey instead — the documented eviction
    * trade, dedupStream's re-emit window in funnel form.
    *
    * Same ordering caveat as [[sessionize]]: per-trigger events are sorted
    * here, cross-trigger order relies on the source replay /
    * watermark-bounded disorder. */
  def funnelStream(events: Dataset[Event],
                   horizonUs: Long = FunnelHorizonUs): Dataset[FunnelOut] = {
    require(horizonUs > 0, s"funnelStream: conversion horizon must be positive, got $horizonUs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", FunnelWatermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          def stage(st: FunnelState): Int =
            if (st.t2.nonEmpty) 2 else if (st.t1.nonEmpty) 1 else 0
          if (state.hasTimedOut) {
            // horizon behind the watermark: the open journey is abandoned —
            // emit its final stage and evict the user's row
            val st = state.get
            state.remove()
            Iterator.single(FunnelOut(userId, stage(st), is_final = true))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
            var st = state.getOption.getOrElse(FunnelState(None, None))
            // Same microsecond-granularity ordering as [[sessionize]]: the
            // strictness comparisons below are in micros, so the sort must be.
            for (e <- it.toSeq.sortBy(ev => (epochUs(ev), ev.event_id))) {
              val us = epochUs(e)
              e.event_type match {
                case "view" if st.t1.isEmpty =>
                  st = FunnelState(Some(us), None)
                case "click" if st.t1.nonEmpty && st.t2.isEmpty && us > st.t1.get =>
                  st = st.copy(t2 = Some(us))
                case "purchase" if st.t2.nonEmpty && us > st.t2.get =>
                  // converted: settle the journey NOW — emit and forget
                  out += FunnelOut(userId, 3, is_final = true)
                  st = FunnelState(None, None)
                case _ => ()
              }
            }
            if (st.t1.nonEmpty) {
              state.update(st)
              // arm the abandonment clock at last-stage-advance + horizon;
              // clamped above the current watermark because Spark refuses a
              // timeout already in the past (reachable via a batch whose
              // watermark snapshot outran an old journey's deadline)
              val lastAdvanceUs = st.t2.getOrElse(st.t1.get)
              state.setTimeoutTimestamp(math.max(
                (lastAdvanceUs + horizonUs) / 1000,
                state.getCurrentWatermarkMs + 1))
              out += FunnelOut(userId, stage(st), is_final = false)
            } else if (state.exists) state.remove()
            out.iterator
          }
      }
  }

  /** Run the streaming funnel end-to-end. Returns the per-user upsert view
    * (see below); the raw emission log — is_final rows included — stays
    * readable at `spark.table(queryName)` for population-level asserts. */
  def runFunnelOnce(spark: SparkSession, dir: String, queryName: String = "funnel"): DataFrame = {
    import spark.implicits._
    val q = funnelStream(eventStream(spark, dir).as[Event])
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // The memory sink in Update mode APPENDS each trigger's re-emissions
    // rather than upserting, so a user whose stage advanced across
    // micro-batches leaves stale lower-stage rows behind. A journey's
    // stages only ever increase and a conversion's 3 dominates any later
    // re-entry journey's stages, so max(stage_reached) per user IS the
    // upsert a real key-value sink would hold.
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(col("stage_reached")).as("stage_reached"))
      .where(col("stage_reached") >= 1)
  }

  /** Run the purchase↔click stream-stream join end-to-end. */
  def runStreamJoinOnce(spark: SparkSession, dir: String, queryName: String = "pcjoin"): DataFrame = {
    val q = purchaseClickJoin(eventStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact dedup: state holds one key per event inside the
    * watermark horizon and is evicted past it (the streaming twin of the
    * batch d1 exact-dedup; at 100 TB/day the watermark bound is what keeps
    * state finite). This MUST be `dropDuplicatesWithinWatermark`: plain
    * `dropDuplicates(keys)` with the event-time column absent from the key
    * subset never evicts — Spark only attaches the state-removal predicate
    * when the watermarked column is part of the dedup keys — so the store
    * would grow one entry per distinct key FOREVER while the scaladoc
    * claimed otherwise (caught by the r15 streaming review). The trade is
    * the documented one: a duplicate arriving more than the watermark
    * delay after its first copy re-emits. */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(keys)

  /** Run streaming dedup over the events file UNIONed with itself (so every
    * row is duplicated) — output must equal the distinct input. */
  def runDedupOnce(spark: SparkSession, dir: String, queryName: String = "dedup"): DataFrame = {
    val s = eventStream(spark, dir)
    val doubled = s.unionByName(eventStream(spark, dir))
    val q = dedupStream(doubled, Seq("event_id"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stream-static enrichment: streaming events joined to a STATIC customer
    * dimension — the most common production streaming shape (fact stream ⋈
    * dimension table). The static side is a plain batch DataFrame: Spark
    * re-plans it per micro-batch (picking broadcast when it fits — no
    * streaming state at all, unlike a stream-stream join), so dimension
    * updates between batches are picked up automatically. At 100 TB/day the
    * dimension side stays a broadcast as long as it fits executor memory;
    * bigger dims shift to a shuffled join per micro-batch. */
  def enrichStream(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment"), col("c_nation")),
      Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("c_mktsegment"), col("c_nation"))

  /** Run the stream-static enrichment end-to-end (AvailableNow, memory sink). */
  def runEnrichOnce(spark: SparkSession, dir: String, queryName: String = "enrich"): DataFrame = {
    val cust = graft.sources.Tables.customer(spark, dir)
      .join(graft.sources.Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name").as("c_nation"))
    val q = enrichStream(eventStream(spark, dir), cust)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** CHECKPOINTED INGEST: process whatever is new under `inDir` since the
    * checkpoint and append it to the parquet file sink at `outDir`, then
    * stop (Trigger.AvailableNow). Run it again after more files land — or
    * after a crash — and it resumes from the offset log: the checkpoint
    * tracks which source files are consumed, and the file sink's
    * `_spark_metadata` commit log makes partially-written batches invisible
    * to readers, so the pipeline is END-TO-END EXACTLY-ONCE across restarts
    * (the production contract that distinguishes a restartable ingest from
    * a rerun-everything batch job; StreamingSpec proves no-loss,
    * no-duplication, and idempotent re-run). */
  def runCheckpointedIngestOnce(spark: SparkSession, inDir: String,
                                checkpointDir: String, outDir: String,
                                schemaFallback: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    // stream-before-data (the eventStream pattern): an ingest deployed
    // ahead of its feed must not die on the empty/absent input dir — take
    // the caller's fallback schema and checkpoint an empty first pass
    val schema =
      try spark.read.parquet(inDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          schemaFallback.getOrElse(throw new IllegalStateException(
            s"runCheckpointedIngestOnce: $inDir has no readable parquet yet and no " +
              "schemaFallback was supplied — pass the feed's schema to start the " +
              "ingest before its first file lands", e))
      }
    val q = spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The documents feed schema — ONE definition (a second hand-written copy
    * in the domain-cap harness drifted-by-construction; r15 review). */
  private val DocumentsSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** Streaming document source (same file-source pattern as [[eventStream]]). */
  def documentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(DocumentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** Streaming embedding source (same file-source pattern as the others). */
  def embeddingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)

  /** ONLINE VECTOR INGEST: assign each streamed embedding to its IVF cell
    * entirely map-side — the k trained centroids (bounded, driver-collected)
    * unroll into a literal argmax expression over the row alone, so the
    * stream needs no aggregation, no state, no watermark and no shuffle, and
    * replays assign identically under any trigger layout. This is the
    * streaming complement of [[graft.queries.IvfIndex.append]] (same
    * assignment semantics — the batch twin is
    * `SimilarityQueries.assignCells`; StreamingSpec pins set equality), the
    * shape a production vector store runs between index rebuilds.
    *
    * Determinism note: each centroid norm is a sequential left fold driver-
    * side — the same op order as the codegen DotProduct fold — so streamed
    * cosines are bit-identical to the batch path's. */
  def assignVectorsStream(vectors: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame = {
    val v = col("embedding").cast("array<double>")
    vectors.select(col("vec_id"),
      argmaxCidExpr(cents, v, sqrt(graft.functions.VectorFunctions.dot(v, v))).as("cid"))
  }

  /** The literal-argmax cell id of a vector column against a bounded
    * driver-collected centroid set — the row-local expression shared by
    * [[assignVectorsStream]] and [[vectorNearDupProbeStream]]. Each
    * centroid norm is a sequential left fold driver-side (the codegen
    * DotProduct fold order), so cosines are bit-identical to the batch
    * assignCells path's. */
  private def argmaxCidExpr(cents: Seq[(Long, Seq[Double])],
                            v: org.apache.spark.sql.Column,
                            nrm: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    require(cents.nonEmpty,
      "empty centroid set — train (or load) the quantizer before starting the " +
        "ingest; an empty literal array would fail analysis with an " +
        "unrelated-looking struct-field error")
    val dot = graft.functions.VectorFunctions.dot _
    val scored = cents.map { case (cid, cv) =>
      val cn = cv.foldLeft(0.0)((a, x) => a + x * x)
      struct((dot(v, typedlit(cv)) / (nrm * lit(math.sqrt(cn)))).as("cos"),
        lit(-cid).as("ncid"))
    }
    array_max(array(scored: _*))("ncid") * -1
  }

  /** STREAMING VECTOR NEAR-DUP PROBE (r16 — the fourth zero-state decision
    * stream, beside admission / substring / media): each arriving embedding
    * gets the d13 CORPUS-PROBE verdict online — literal-argmax cell
    * assignment map-side (no shuffle), then the same hot-cell-guarded
    * same-cell cosine kernel ([[graft.queries.IvfIndex.corpusHitPairsOf]])
    * against the persisted posting lists as a stream-static join. Emits
    * (vec_id, corpus_id, cos) for every corpus near-dup at `threshold` —
    * the admission check a vector store runs before accepting an
    * embedding. STATELESS: the corpus (posting lists + its ≤ k-row pop
    * table) is static per stream instance; no state store, no watermark;
    * re-create the stream from a re-resolved index to see later appends.
    * SCOPE: this is d13's rule (a) only — the in-batch keep rule (pairs
    * among same-day arrivals) needs cross-arrival memory, which is exactly
    * what a stateless probe cannot hold; the daily batch path
    * ([[graft.queries.IvfIndex.semanticDedupIncremental]]) owns it.
    * `posting` must carry (cid, vec_id, v, nrm) — the
    * [[graft.queries.IvfIndex.cells]] frame with the norm added. */
  def vectorNearDupProbeStream(vectors: DataFrame, cents: Seq[(Long, Seq[Double])],
                               posting: DataFrame, threshold: Double): DataFrame = {
    val dot = graft.functions.VectorFunctions.dot _
    val v = col("embedding").cast("array<double>")
    val b = vectors.select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("cid", argmaxCidExpr(cents, col("v"), col("nrm")))
    graft.queries.IvfIndex.corpusHitPairsOf(b, posting, threshold)
  }

  /** Driver-side centroid collection for the literal argmax (k rows). */
  def collectCentroids(cents: DataFrame): Seq[(Long, Seq[Double])] =
    cents.select("cid", "cv").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

  /** Run the streaming vector ingest end-to-end (AvailableNow, memory sink). */
  def runVectorIngestOnce(spark: SparkSession, dir: String,
                          cents: Seq[(Long, Seq[Double])],
                          queryName: String = "vector_ingest"): DataFrame = {
    val q = assignVectorsStream(embeddingStream(spark, dir), cents)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** STREAMING CHUNKING: t10's overlapping token-window transform applied
    * to the document stream — a pure per-row generate (no state, no
    * watermark, no shuffle), so chunks append under any trigger/replay
    * layout and the stream output is bit-identical to the batch t10 on the
    * same files (StreamingSpec pins it). The ingest shape of a RAG /
    * training pipeline: documents land, chunks + fingerprints stream out. */
  def chunkStream(documents: DataFrame): DataFrame =
    graft.queries.TextQueries.chunksOf(documents)

  def runChunkingOnce(spark: SparkSession, dir: String,
                      queryName: String = "chunking"): DataFrame = {
    val q = chunkStream(documentStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** STREAMING MEDIA INGEST (VERDICT r15 missing #3 — embeddings had the
    * r09 vector-ingest twin but arriving MEDIA ran batch-only): each landed
    * document's media gets codec feature extraction and hyperplane LSH
    * bucket assignment — (media_id, kind, mv, nrm, bkt), the exact frame
    * batch m7 builds its candidate side from, via the SAME shared code
    * ([[graft.queries.MultimodalQueries.mediaFeatureBuckets]]), so stream
    * and batch cannot bucket differently. Every step is per-row (codec
    * mapPartitions + codegen'd vector exprs): no state, no watermark, no
    * shuffle — appends identically under any trigger/replay layout, the
    * [[assignVectorsStream]] shape with the m7 extractor. A production
    * media store runs this between index rebuilds: arriving media lands
    * feature-and-bucket-assigned, searchable by the m7 bucket ∧ same-kind
    * probe immediately. */
  def mediaIngestStream(documents: DataFrame): DataFrame =
    graft.queries.MultimodalQueries.mediaFeatureBuckets(documents)

  /** Run the streaming media ingest end-to-end (AvailableNow, memory sink). */
  def runMediaIngestOnce(spark: SparkSession, dir: String,
                         queryName: String = "media_ingest"): DataFrame = {
    val q = mediaIngestStream(documentStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** STREAMING MEDIA NEAR-DUP PROBE (r16 — the online DECISION on top of
    * [[mediaIngestStream]]'s features): each arriving document's media is
    * checked against the persisted corpus feature index with m6's exact
    * L1-band rule, emitting (new_id, corpus_id, l1) for every corpus
    * near-dup — the admission check a media ingest runs BEFORE accepting a
    * file, the [[admissionStream]]/[[substringHitStream]] shape for the
    * media modality. STATELESS: codec features and band assignment are
    * per-row, the corpus participates as a static frame joined per
    * micro-batch (band ∧ kind equi-join — broadcastable when the index is
    * small, shuffle-keyed when not), so there is no state store, no
    * watermark, and replays emit identically under any trigger layout.
    * Corpus growth is the versioned-artifact story: re-create the stream
    * from a re-resolved index to pick up newly admitted media (the
    * [[substringArtifactsVersioned]] protocol; segments via
    * [[graft.sources.Manifests.appendSegment]]). */
  def mediaNearDupProbeStream(documents: DataFrame, corpusFeatures: DataFrame): DataFrame =
    graft.queries.MultimodalQueries.mediaNearDupProbeOf(
      graft.queries.MultimodalQueries.mediaBandFeatures(documents), corpusFeatures)

  /** One kept doc of [[domainCapStream]]'s running per-domain cap; `n_seen`
    * is the domain's total docs seen so far — the final emission for a
    * domain is the one with its max n_seen (how the spec isolates the
    * end-of-stream answer from the Update-mode history). */
  final case class DomainCapOut(domain: String, rank: Int, doc_id: Long,
                                score: Double, n_seen: Long)

  /** STREAMING PER-DOMAIN CAP — c10's online twin: each domain's running
    * top-[[graft.queries.CurationQueries.DomainCap]] (score desc, doc_id
    * asc — the batch tie order) lives in flatMapGroupsWithState, so state
    * is BOUNDED at cap entries + one counter per domain no matter how many
    * docs stream through it. Every trigger re-emits the domain's current
    * kept set (Update mode); after the last trigger the per-domain rows
    * with max n_seen equal the batch c10 answer on everything seen — the
    * row-local scoring ([[graft.queries.CurationQueries.domainScored]]) is
    * shared code, so stream and batch can never rank differently.
    *
    * NoTimeout is DELIBERATE here, not the [[funnelStream]]/[[sessionize]]
    * bug class: total state is ≤ (cap + 1 counter) × |domain vocabulary| —
    * bounded by the KEY SPACE, which for registrable domains is millions at
    * worst (MBs of state), not by the unbounded document stream. A deploy
    * whose key is genuinely unbounded (per-URL, per-user) must add the
    * sessionize-template event-time timeout before reusing this shape. */
  def domainCapStream(docs: DataFrame): Dataset[DomainCapOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cap = graft.queries.CurationQueries.DomainCap
    graft.queries.CurationQueries.domainScored(docs)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(List[(Double, Long)], Long), DomainCapOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (domain: String, it: Iterator[(String, Long, Double)],
         state: GroupState[(List[(Double, Long)], Long)]) =>
          var (kept, seen) = state.getOption.getOrElse((Nil, 0L))
          it.foreach { case (_, id, sc) =>
            seen += 1
            // insert in (score desc, id asc) order, truncate at cap —
            // list ops bounded by cap, the whole point of the aggregate
            val (before, after) = kept.span(e => e._1 > sc || (e._1 == sc && e._2 < id))
            kept = (before ::: (sc, id) :: after).take(cap)
          }
          state.update((kept, seen))
          kept.iterator.zipWithIndex.map { case ((sc, id), i) =>
            DomainCapOut(domain, i + 1, id, sc, seen)
          }
      }
  }

  /** Run the streaming domain cap end-to-end (AvailableNow, memory sink,
    * Update mode). `maxFilesPerTrigger` < 0 leaves the default single-pass
    * trigger; a positive value forces multi-trigger replay so specs can
    * prove the state carries across micro-batches. */
  def runDomainCapOnce(spark: SparkSession, dir: String,
                       queryName: String = "domain_cap",
                       maxFilesPerTrigger: Int = -1,
                       glob: String = "documents.parquet"): DataFrame = {
    val src = spark.readStream
      .schema(DocumentsSchema)
      .option("pathGlobFilter", glob)
    val srcOpt = if (maxFilesPerTrigger > 0)
      src.option("maxFilesPerTrigger", maxFilesPerTrigger) else src
    val q = domainCapStream(srcOpt.parquet(dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Per-type state of [[rateAnomalyStream]]: counts for the hours a future
    * verdict can still reference (the open hour + its trailing
    * [[graft.queries.EventQueries.TrailHours]]-hour horizon — BOUNDED at
    * ~25 entries per event type no matter the volume or history), plus
    * which hour is open. */
  final case class RateState(counts: Map[Long, Long], openHour: Long)
  final case class RateAnomalyOut(event_type: String, hour: Timestamp, n: Long,
                                  trail_avg: Option[Double], is_anomaly: Boolean)

  /** STREAMING RATE-ANOMALY MONITOR — e11's online twin (VERDICT r11 #7):
    * the ingest-rate gate run where it belongs, on the live stream. Per
    * event type, flatMapGroupsWithState accrues the open hour's count; when
    * an event for a LATER hour arrives the open hour closes and its verdict
    * emits (Append mode): n vs [[graft.queries.EventQueries.BurstFactor]] ×
    * the mean over the present hours of the preceding wall-clock
    * [[graft.queries.EventQueries.TrailHours]] — the same
    * present-hours-in-wall-clock-range trail as batch e11's RANGE frame,
    * same integer counts, one IEEE division, so flags are bit-identical.
    * State then prunes to hours a future trail can still reference.
    *
    * Streaming contract: each type's LAST hour never closes (it remains in
    * state, like [[sessionize]]'s open sessions), so the stream's emissions
    * equal batch e11 minus each type's final hour — StreamingSpec pins
    * exactly that. Same ordering caveat as [[sessionize]]: per-trigger
    * events are sorted here; cross-trigger order relies on source replay /
    * watermark-bounded disorder.
    *
    * Late-event semantics under cross-trigger disorder (no watermark —
    * NoTimeout — so stated explicitly):
    *  - a late event for an ALREADY-EMITTED hour still inside the trail
    *    horizon (`openHour - TrailHours <= h < openHour`) is counted: it
    *    refines FUTURE trails but cannot retract the emitted verdict;
    *  - an hour FIRST SEEN only after a later hour opened (same horizon,
    *    hour absent from state) never emits its own verdict — its close
    *    already passed, and its trail can reach below the pruned horizon,
    *    so any late verdict could not be batch-bit-identical; its count
    *    still refines future trails;
    *  - an event OLDER than the horizon (`h < openHour - TrailHours`) is
    *    dropped outright: no verdict for any hour >= openHour can reference
    *    it, so counting it would only grow state it would immediately
    *    re-prune. This keeps state monotonically bounded (~TrailHours+1
    *    entries) under UNBOUNDED disorder, not just bounded-in-steady-state.
    *
    * CHOSEN CONTRACT (emit-or-watermark, VERDICT r13 #6): a late-seen hour
    * NEVER emits a late verdict. Emitting one could not be batch-bit-
    * identical — its wall-clock trail reaches below the pruned horizon, so
    * the stream cannot reconstruct the exact trail batch e11 used — and a
    * monitor that emits a same-hour verdict twice (once wrong) is worse
    * than one that emits each hour at most once. Instead, DISORDER IS
    * BOUNDED AT THE SOURCE: [[runRateAnomalyOnce]] pre-binds
    * `withWatermark(ts, TrailHours hours)` on the input path, so a source
    * honoring the watermark can only deliver events the kernel counts
    * (open hour or in-horizon refinement) — the no-verdict and drop rules
    * above then handle only watermark-violating stragglers, as belt and
    * braces. Callers wiring [[rateAnomalyStream]] to their own source
    * should pre-bind the same watermark. StreamingSpec asserts this
    * contract explicitly with a pathological replay (late-unseen hour:
    * no verdict ever, but its count refines the next close's trail). */
  def rateAnomalyStream(events: Dataset[Event]): Dataset[RateAnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[RateState, RateAnomalyOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (etype: String, it: Iterator[Event], state: GroupState[RateState]) =>
          val (st, out) = rateAnomalyKernel(etype, it.toSeq,
            state.getOption.getOrElse(RateState(Map.empty, Long.MinValue)))
          state.update(st)
          out.iterator
      }
  }

  /** Pure per-trigger kernel of [[rateAnomalyStream]] — factored out so the
    * late/disorder paths are unit-testable without a streaming harness
    * (StreamingSpec drives it with a pathological replay and asserts state
    * stays within the horizon). Returns the updated state and the verdicts
    * to emit for this trigger. */
  private[streaming] def rateAnomalyKernel(etype: String, batch: Seq[Event],
                                           st0: RateState): (RateState, Seq[RateAnomalyOut]) = {
    val trailH = graft.queries.EventQueries.TrailHours
    val burst = graft.queries.EventQueries.BurstFactor
    val out = scala.collection.mutable.ArrayBuffer.empty[RateAnomalyOut]
    var st = st0
    def verdict(h: Long, counts: Map[Long, Long]): RateAnomalyOut = {
      val trail = ((h - trailH) until h).flatMap(counts.get)
      val avg = if (trail.isEmpty) None else Some(trail.sum.toDouble / trail.size)
      RateAnomalyOut(etype, tsFromUs(h * 3600L * 1000000L), counts(h),
        avg, avg.exists(a => counts(h) > burst * a))
    }
    for (e <- batch.sortBy(ev => (epochUs(ev), ev.event_id))) {
      val h = math.floorDiv(epochUs(e), 3600L * 1000000L)
      if (st.openHour == Long.MinValue)
        st = RateState(Map(h -> 1L), h)
      else if (h < st.openHour - trailH)
        // older than any trail a future verdict can reach back to: drop
        // (see scaladoc) — state stays monotone under unbounded disorder
        ()
      else if (h <= st.openHour)
        // current hour, or an in-horizon late event: count it — for a
        // closed hour this only refines FUTURE trails
        st = st.copy(counts = st.counts + (h -> (st.counts.getOrElse(h, 0L) + 1L)))
      else {
        out += verdict(st.openHour, st.counts)
        // keep only hours a verdict for >= h can still reach back to
        val pruned = st.counts.filter { case (k, _) => k >= h - trailH }
        st = RateState(pruned + (h -> 1L), h)
      }
    }
    (st, out.toSeq)
  }

  /** Run the streaming rate-anomaly monitor end-to-end (AvailableNow,
    * memory sink, Append mode — each closed hour's verdict emits once).
    * The input is watermarked at exactly the kernel's trail horizon
    * ([[graft.queries.EventQueries.TrailHours]]) — the emit-or-watermark
    * contract's watermark half: the engine bounds cross-trigger disorder
    * to the window the kernel can still use, so the kernel's late-drop
    * path is a second line of defense, not the only one. */
  def runRateAnomalyOnce(spark: SparkSession, dir: String,
                         queryName: String = "rate_anomaly"): DataFrame = {
    import spark.implicits._
    val horizon = s"${graft.queries.EventQueries.TrailHours} hours"
    val q = rateAnomalyStream(
      eventStream(spark, dir).withWatermark("ts", horizon).as[Event])
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming twin of the curation hash-sampler (c1_hash_sample): the salted
    * deterministic hash is a pure row-local filter — no state, no watermark —
    * so the IDENTICAL transform runs on the stream and selects the identical
    * rows under any replay/retry/trigger layout. This determinism is the
    * reason curation sampling hashes ids instead of flipping `rand()` coins:
    * a coin-flip sample is irreproducible across retries and can double-count
    * under at-least-once sources. */
  def sampleStream(docs: DataFrame): DataFrame =
    graft.queries.CurationQueries.hashSampled(docs)

  /** Streaming twin of t8's heavy hitters (VERDICT r16 missing #3):
    * corpus-wide token-frequency surveillance over arriving documents,
    * emitted per event-time window AS THE WINDOW CLOSES. Input is a
    * streaming (ts, text) frame (production stamps arrivals with ingest
    * time); output is one row per (window, candidate): (window_start,
    * window_end, n_total, rank, word, est_n).
    *
    * The state per open window is ONE aggregation row holding the ≤ k-
    * counter mergeable Misra-Gries summary ([[graft.functions.MisraGries]])
    * plus the exact token total — O(windows × k), never O(vocabulary): a
    * per-(window, word) count aggregation would hold every distinct token
    * ever seen in an open window, which is exactly the unbounded state this
    * twin exists to avoid. Partials combine map-side like any aggregate
    * (the summary is mergeable with error bounds adding to ≤ total/(k+1)).
    *
    * CONTRACT (the batch-t8 superset guarantee, spec-pinned per closed
    * window): every token with true in-window frequency strictly above
    * n_total/(k+1) — t8's bar at K = k — appears among the emitted
    * candidates, under any trigger layout or arrival order; n_total is
    * exact; and true − n_total/(k+1) ≤ est_n ≤ true per candidate.
    * Estimates are NOT exact and the candidate set may include non-heavy
    * tokens (MG over-reports, never under-reports) — exactness is the
    * nightly batch recount, executable end to end as
    * [[recountHeavyHitters]] (spec-pinned equal to per-window batch t8).
    *
    * A closed window ALL of whose rows tokenize to zero tokens emits no
    * rows (ADVICE r17: the groupBy sees no (ts, word) input for it, so not
    * even an n_total = 0 row appears) — deliberately matching the batch
    * twin, where a window with no tokens likewise contributes no t8 rows;
    * surveillance reads absence-of-rows as "no candidates", not as a
    * missed window. */
  def heavyHittersStream(docs: DataFrame,
                         k: Int = graft.queries.TextQueries.HeavyK,
                         windowDur: String = "1 hour",
                         watermarkDelay: String = "2 hours"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(graft.functions.MisraGries.mg(col("word"), k).as("s"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("s.n_total").as("n_total"), posexplode(col("s.cands")).as(Seq("pos", "c")))
      .select(col("window_start"), col("window_end"), col("n_total"),
        (col("pos") + 1).cast("int").as("rank"),
        col("c.word").as("word"), col("c.est").as("est_n"))

  /** The NIGHTLY EXACT RECOUNT of [[heavyHittersStream]]'s emitted
    * candidates (VERDICT r17 #4: the division-of-labor contract — stream
    * over-reports candidates, batch recounts exactly — was documented but
    * had no executable composition). Input: the stream's closed-window
    * candidate rows (only window_start and word are read) and the SAME
    * day's batch (ts, text) corpus; output: one row per true heavy hitter
    * per window — (window_start, window_end, word, n, n_total), n exact.
    *
    * Correctness leans on MG's superset guarantee: every token with true
    * in-window frequency > n_total/(k+1) IS among the stream's candidates,
    * so recounting ONLY candidates and re-applying the strict bar yields
    * exactly the per-window batch t8 set (the spec pins the equality) —
    * over-reported non-heavy candidates die at the bar, and nothing heavy
    * was missing to begin with.
    *
    * 100 TB notes: t8's prune-then-verify shape, windowed — the candidate
    * set is bounded (closed windows × k rows) and BROADCAST into a
    * semi-join against the token stream, so the exact recount aggregates
    * O(windows × k) keys map-side instead of shuffling the full
    * (window, word) vocabulary; the totals pass is one map-side-combinable
    * count per window. */
  def recountHeavyHitters(candidates: DataFrame, docs: DataFrame,
                          k: Int = graft.queries.TextQueries.HeavyK,
                          windowDur: String = "1 hour"): DataFrame = {
    val tok = docs
      .select(window(col("ts"), windowDur).as("w"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("word"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("word"))
    val totals = tok.groupBy("window_start", "window_end")
      .agg(count(lit(1)).as("n_total"))
    val cands = candidates.select("window_start", "word").distinct()
    tok.join(broadcast(cands), Seq("window_start", "word"), "left_semi")
      .groupBy("window_start", "window_end", "word").agg(count(lit(1)).as("n"))
      .join(totals, Seq("window_start", "window_end"))
      .where(col("n") > col("n_total").cast("double") / (k + 1).toDouble)
      .select("window_start", "window_end", "word", "n", "n_total")
  }

  /** The composed day cycle, end to end: stream the day's arrivals through
    * [[heavyHittersStream]] (AvailableNow — every window closes), then run
    * the exact batch recount of the emitted candidates against the day's
    * corpus. `streamDocs` and `batchDocs` carry the same (ts, text) rows —
    * one as a stream, one as the nightly batch input. */
  def runHeavyHittersRecountOnce(spark: SparkSession,
                                 streamDocs: DataFrame, batchDocs: DataFrame,
                                 k: Int = graft.queries.TextQueries.HeavyK,
                                 windowDur: String = "1 hour",
                                 watermarkDelay: String = "2 hours",
                                 queryName: String = "heavy_hitters_day"): DataFrame = {
    val q = heavyHittersStream(streamDocs, k, windowDur, watermarkDelay)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recountHeavyHitters(spark.table(queryName), batchDocs, k, windowDur)
  }

  /** Run the streaming sampler end-to-end (AvailableNow, memory sink). */
  def runSampleOnce(spark: SparkSession, dir: String, queryName: String = "sample"): DataFrame = {
    val q = sampleStream(documentStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming lake ingest: events → DATE-PARTITIONED parquet file sink —
    * the layout every long-lived ingest lands on (and the one
    * [[graft.sources.Sinks.compactPartitionedParquet]] maintains: a
    * per-trigger micro-batch leaves small files in every `event_date=` leaf).
    * Exactly-once via the checkpoint + the sink's `_spark_metadata` log;
    * downstream batch readers prune on `event_date`.
    *
    * 100 TB notes: partitioning by event date keeps each trigger's append
    * localized to the dates it carries; the partition column comes from the
    * event time (not processing time) so replays land in the same leaves.
    * Compact a RETIRED prefix only — compaction finalizes the sink's metadata
    * log away (see compactPartitionedParquet's scaladoc). */
  def runEventsToPartitionedParquet(spark: SparkSession, dir: String,
                                    outPath: String, checkpointPath: String,
                                    parallelism: Option[Int] = None): Unit = {
    val dated = eventStream(spark, dir)
      .withColumn("event_date", to_date(col("ts")))
    // the sink writes one file per task per leaf — `parallelism` models a
    // real ingest's task count (each trigger then drops up to that many
    // files into every date leaf it touches: the small-file genesis that
    // compactPartitionedParquet exists to clean up)
    val q = parallelism.fold(dated)(n => dated.repartition(n))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("event_date")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming admission — the 16th pipeline: p2's corpus-near-dup
    * rejection as a PER-ARRIVAL verdict stream, completely STATELESS.
    * Each arriving doc gets one output row (doc_id, n_corpus_dups,
    * admitted) the moment its micro-batch runs: admitted iff NO corpus doc
    * band-collides with it AND verifies at Jaccard >= the d3 threshold —
    * exactly [[graft.queries.DedupQueries.incrementalDedup]]'s `dupVsOld`
    * rule (StreamingSpec pins the equality). In-batch twin settlement
    * (cluster rep selection across a day's arrivals) inherently needs the
    * day's whole pair graph and stays in the nightly d12/p2 batch run; the
    * stream gives ingestion an immediate vs-CORPUS verdict.
    *
    * Statelessness is the design: the arrival's shingle set, minhash
    * signature and band keys are row-local expressions; the corpus
    * participates as a STATIC bkey → postings-array map (grouped from the
    * same persisted (doc_id, bkey) index a batch ingest appends to —
    * [[graft.queries.DedupQueries.bandKeyCols]] is spec-pinned
    * byte-identical to the index's key format); and instead of
    * explode + join + re-aggregate (a stateful streaming aggregation), the
    * NumBands keys become NumBands stream-static LEFT JOINS — one row in,
    * one row out — with the Jaccard verify run by codegen'd higher-order
    * functions over the concatenated postings.
    *
    * Corpus freshness is the caller's dial, made explicit by the two
    * entry points. THIS overload derives the map from a docs frame and
    * materializes it ONCE (checkpoint) — the verdicts are frozen against
    * the corpus as of stream start (an unmaterialized derived map would
    * re-shingle the whole corpus EVERY trigger: measured 16× re-derivation
    * in the sf0.1 rehearsal). To pick up batch-ingest appends without a
    * restart, use [[admissionStreamAgainst]] with a postings frame over
    * the PERSISTED index files: Spark re-plans the static side per
    * micro-batch, so newly appended index rows show up at the next
    * trigger, at the cost of re-reading (not re-deriving) the map.
    *
    * 100 TB notes: state is ZERO; per-batch work is O(arrivals × bands)
    * join probes + O(colliding postings) verifies. The bkey map rides the
    * batch index's [[graft.queries.DedupQueries.MaxBandPop]] hot-band cap
    * (applied in [[admissionPostings]] via the shared capBandIndex kernel),
    * so each posting array is bounded at cap entries and a pathological
    * band bucket cannot grow a probe. At index sizes past broadcast range
    * the joins degrade to per-batch shuffles — still stateless; bucket the
    * index by bkey to keep them co-located. */
  def admissionStream(docs: DataFrame, corpus: DataFrame): DataFrame =
    admissionStreamAgainst(docs, graft.Checkpoints.eager(admissionPostings(corpus)))

  /** The bkey → postings-array map [[admissionStream]] probes, derived
    * from a corpus docs frame. Production materializes this next to the
    * persisted band index (one parquet write per corpus version) and
    * passes the READ-BACK frame to [[admissionStreamAgainst]].
    *
    * The [[graft.queries.DedupQueries.MaxBandPop]] hot-band cap applies
    * HERE, through the same [[graft.queries.DedupQueries.capBandIndex]]
    * kernel the batch ingest runs (r17): a corpus-saturated band is
    * excluded from the postings map at derivation, so the online verdict
    * and the nightly d12/p2 batch verdict cannot diverge on what the cap
    * traded away — and each posting array (the map's in-memory hot spot)
    * is bounded at cap entries. */
  def admissionPostings(corpus: DataFrame,
                        maxBandPop: Int = graft.queries.DedupQueries.MaxBandPop): DataFrame = {
    val D = graft.queries.DedupQueries
    D.capBandIndex(D.lshBandIndex(corpus), maxBandPop)
      .join(D.shingleSetsOf(corpus), "doc_id")
      .groupBy("bkey")
      .agg(collect_list(struct(col("doc_id").as("cid"), col("sh").as("csh"))).as("posts"))
  }

  /** VERSIONED publish/load pair for the persisted postings artifact
    * (VERDICT r14 missing #2, stream side): `appendBandIndex`-style
    * in-place parquet appends are racy for an ALWAYS-ON reader on
    * rename-less object stores — a micro-batch re-plan can list a
    * half-written append. Publish each corpus version's postings as an
    * immutable [[graft.sources.Manifests]] segment instead; the loader
    * resolves the newest COMPLETE segment set once, driver-side, so the
    * stream probes a consistent snapshot (re-create the stream to adopt a
    * later version — the freshness contract the StreamingSpec append test
    * drives). Cross-segment duplicate bkeys are exactly the
    * append-maintained shape [[admissionStreamAgainst]] re-groups. */
  def publishAdmissionPostings(postings: DataFrame, root: String): Long =
    graft.sources.Manifests.appendSegment(postings, root)

  /** The current complete postings snapshot under a versioned root. */
  def admissionPostingsVersioned(s: org.apache.spark.sql.SparkSession,
                                 root: String): DataFrame =
    graft.sources.Manifests.readSegments(s, root)

  /** [[admissionStream]] against a caller-supplied postings map — pass a
    * frame backed by persisted files to have per-micro-batch re-planning
    * pick up corpus appends without a stream restart.
    *
    * The supplied frame need NOT be bkey-unique (ADVICE r13): a postings
    * artifact maintained by per-version APPENDS naturally accumulates
    * several rows per bkey, and feeding those straight into the NumBands
    * left joins would multiply each arrival into duplicate verdict rows.
    * The map is therefore re-grouped here (posts flattened per bkey) before
    * the joins — one exchange over the tiny O(distinct bkeys) static side
    * per re-plan, which is what makes append-backed frames safe; an
    * already-unique map pays one no-op-sized shuffle. Duplicate cids inside
    * a bucket (a crashed append re-appending) stay harmless: the verdict
    * dedups matches by cid in-row. */
  def admissionStreamAgainst(docs: DataFrame, postings: DataFrame): DataFrame =
    withCorpusDupCount(docs.select("doc_id", "text"), postings)
      .select(col("doc_id"), col("n_corpus_dups"))
      .withColumn("admitted", col("n_corpus_dups") === 0)

  /** The per-arrival corpus near-dup probe factored out of
    * [[admissionStreamAgainst]] (r17) so the composed day-2 verdict stream
    * runs the SAME kernel: appends `n_corpus_dups` to `docs`' columns
    * (which must include doc_id and text, and must not collide with the
    * scratch names sh, sig, bkN, postsN, all_posts). Stateless: row-local
    * shingles/signature/band keys (NULL when the doc has <K tokens — a
    * NULL key misses every equi-join), NumBands stream-static left joins,
    * and the Jaccard verify + per-cid dedup as array ops inside the row. */
  private def withCorpusDupCount(docs: DataFrame, postings: DataFrame): DataFrame = {
    val D = graft.queries.DedupQueries
    val T = graft.text.TextFunctions
    val uniq = postings.groupBy("bkey").agg(flatten(collect_list(col("posts"))).as("posts"))
    val sh = docs
      .withColumn("sh", graft.functions.VectorFunctions
        .shingleHashes(col("text"), D.ShingleK, T.HashP))
      .withColumn("sig", T.minhashSignature(col("sh")))
    val keyed = D.bandKeyCols(col("sig"), col("sh")).zipWithIndex
      .foldLeft(sh) { case (df, (k, i)) => df.withColumn(s"bk$i", k) }
    val joined = (0 until T.NumBands).foldLeft(keyed) { (df, i) =>
      df.join(uniq.select(col("bkey").as(s"bk$i"), col("posts").as(s"posts$i")),
        Seq(s"bk$i"), "left")
    }
    // array_compact drops the bands that matched nothing (left-join NULLs)
    // without needing a typed empty-array literal
    val allPosts = flatten(array_compact(
      array((0 until T.NumBands).map(i => col(s"posts$i")): _*)))
    // distinct corpus matches: a pair colliding in several bands must count
    // once — dedup by cid INSIDE the row (array ops, still stateless)
    val matches = expr(
      s"""array_distinct(transform(filter(all_posts, o ->
         |  size(array_intersect(sh, o.csh)) / CAST(size(sh) + size(o.csh)
         |    - size(array_intersect(sh, o.csh)) AS DOUBLE) >= ${D.JaccardT}),
         |  o -> o.cid))""".stripMargin)
    val scratch = Seq("sh", "sig", "all_posts") ++
      (0 until T.NumBands).flatMap(i => Seq(s"bk$i", s"posts$i"))
    joined.withColumn("all_posts", allPosts)
      .withColumn("n_corpus_dups", size(matches).cast("int"))
      .drop(scratch: _*)
  }

  /** Day-1 artifact bundle for the ONLINE day-2 admission verdict
    * ([[day2AdmissionStream]]) — each a small static frame production
    * persists once per corpus build via [[publishDay2Artifacts]] (one
    * atomic Manifests-versioned bundle) and a restarted or fresh stream
    * re-reads via [[day2ArtifactsVersioned]]:
    *  - `benchGrams`: ONE row, the benchmark's distinct 8-gram hash set as
    *    a sorted array — benchmark corpora are tiny (eval suites), so the
    *    whole set rides one broadcast row and the exact-overlap probe
    *    needs no join;
    *  - `model`: ONE row, the frozen day-1 bigram LM as two maps g→c and
    *    pg→c1 — bounded by the MODEL vocabulary. The broadcast-map form
    *    holds to ~10⁷ entries (the pruned n-gram tables real quality
    *    gates ship) — an EXECUTABLE bound: [[day2ArtifactsFrom]] refuses
    *    past [[Day2MaxModelEntries]]; beyond it the gate runs on the
    *    TABLE-form bundle ([[Day2ShardedArtifacts]] +
    *    [[day2AdmissionShardedBatch]], r18 — the semi-join-pruned scoring
    *    online);
    *  - `thresholds`: the frozen per-lang leave-one-out p30 bar
    *    ([[graft.queries.PipelineQueries]] thFrozen — one row per lang);
    *  - `postings`: the [[admissionPostings]] bkey→posts map. */
  final case class Day2Artifacts(benchGrams: DataFrame, model: DataFrame,
                                 thresholds: DataFrame, postings: DataFrame)

  /** The executable bound behind [[Day2Artifacts]]' "model maps hold to
    * ~10⁷ entries" scaladoc (VERDICT r17 missing #3: the limit was prose,
    * not a check): [[day2ArtifactsFrom]] REFUSES to fold a bundle whose
    * cnt + pre maps exceed this many entries, pointing at the table-form
    * gate ([[day2AdmissionShardedBatch]]) and the nightly batch as the
    * scale paths. The default is the documented broadcast-row ceiling; a
    * deploy that has measured its executors' headroom passes its own. */
  val Day2MaxModelEntries: Long = 10L * 1000 * 1000

  /** [[Day2Artifacts]]' GENERAL (table) form — the frozen bigram LM as TWO
    * TABLES, (g, c) and (pg, c1), instead of one-row broadcast maps. This
    * is the form with NO vocabulary bound: the per-trigger scorer
    * ([[day2AdmissionShardedBatch]]) semi-join-prunes the tables to the
    * arrival batch's grams before the probability join, so O(batch-vocab)
    * rows move per trigger, never O(corpus-vocab) — the nightly batch's
    * own scoring shape taken online. The broadcast form is DERIVED from
    * this one ([[day2ArtifactsFrom]]) so the two forms cannot disagree on
    * a count. */
  final case class Day2ShardedArtifacts(benchGrams: DataFrame, cnt: DataFrame,
                                        pre: DataFrame, thresholds: DataFrame,
                                        postings: DataFrame)

  /** Derive the TABLE-form day-2 bundle from the day-1 frames production
    * already holds: the FULL corpus (bench membership is doc_id % 20 == 0
    * over all docs — the benchmark is external to the sample), the MODEL
    * corpus (p2's contract: the post-decontam survivor set s2 the day-1 LM
    * was trained on), the frozen per-lang thresholds, and the KEPT corpus
    * (s5, what near-dup admission dedups against). Each frame is
    * materialized once (eager checkpoint) — an unmaterialized derived
    * artifact would re-derive per micro-batch re-plan. No size bound: the
    * LM legs are distributed tables, not driver rows. */
  def day2ShardedArtifacts(corpus: DataFrame, modelCorpus: DataFrame,
                           thresholds: DataFrame,
                           keptCorpus: DataFrame): Day2ShardedArtifacts = {
    val V = graft.functions.VectorFunctions
    val T = graft.text.TextFunctions
    val bench = corpus.where(col("doc_id") % 20 === 0)
      .select(explode(V.shingleHashes(col("text"), 8, T.HashP)).as("g"))
      .distinct()
      .agg(sort_array(collect_list(col("g"))).as("bench_g"))
    val inst = graft.queries.TextQueries.bigramInstancesOf(modelCorpus)
    Day2ShardedArtifacts(
      graft.Checkpoints.eager(bench),
      graft.Checkpoints.eager(inst.groupBy("g").agg(count(lit(1)).as("c"))),
      graft.Checkpoints.eager(inst.groupBy("pg").agg(count(lit(1)).as("c1"))),
      graft.Checkpoints.eager(thresholds),
      graft.Checkpoints.eager(admissionPostings(keptCorpus)))
  }

  /** Derive [[Day2Artifacts]] (the broadcast-map form) — see
    * [[day2ArtifactsFrom]] for the bound this enforces. */
  def day2Artifacts(corpus: DataFrame, modelCorpus: DataFrame,
                    thresholds: DataFrame, keptCorpus: DataFrame,
                    maxModelEntries: Long = Day2MaxModelEntries): Day2Artifacts =
    day2ArtifactsFrom(
      day2ShardedArtifacts(corpus, modelCorpus, thresholds, keptCorpus),
      maxModelEntries)

  /** Fold the TABLE-form LM into [[Day2Artifacts]]' one-row broadcast maps
    * — the broadcast form is a VIEW of the table form, so a deploy can
    * publish one sharded bundle and run whichever gate its vocabulary
    * permits.
    *
    * Throws when the frozen LM exceeds `maxModelEntries` map entries — the
    * one-row broadcast-map form is THIS gate's scale limit
    * ([[Day2MaxModelEntries]]); past it, score arrivals through the table
    * form ([[day2AdmissionShardedBatch]] per trigger — the semi-join-pruned
    * scoring, same verdict bits) or with the nightly batch
    * ([[graft.queries.PipelineQueries]] p2). */
  def day2ArtifactsFrom(sh: Day2ShardedArtifacts,
                        maxModelEntries: Long = Day2MaxModelEntries): Day2Artifacts = {
    val cntM = sh.cnt
      .agg(map_from_entries(collect_list(struct(col("g"), col("c")))).as("cnt_m"))
    val preM = sh.pre
      .agg(map_from_entries(collect_list(struct(col("pg"), col("c1")))).as("pre_m"))
    val model = graft.Checkpoints.eager(cntM.crossJoin(preM))
    val sizes = model.select(
      coalesce(size(col("cnt_m")), lit(0)).cast("long").as("nc"),
      coalesce(size(col("pre_m")), lit(0)).cast("long").as("np")).head()
    val entries = sizes.getLong(0) + sizes.getLong(1)
    require(entries <= maxModelEntries,
      s"day2Artifacts: the frozen bigram LM carries $entries map entries, past " +
        s"the one-row broadcast bound ($maxModelEntries) — the broadcast gate's " +
        "scale limit. Take this vocabulary online through the table-form bundle " +
        "(day2AdmissionShardedBatch per trigger — the semi-join-pruned scoring), " +
        "or score with the nightly batch (graft.queries.PipelineQueries p2 / " +
        "incrementalAdmissionOf)")
    Day2Artifacts(sh.benchGrams, model, sh.thresholds, sh.postings)
  }

  /** VERSIONED publish of the WHOLE day-2 bundle (VERDICT r17 missing #1:
    * only the postings leg rode the Manifests protocol — a restart of an
    * always-on admission stream re-derived the frozen model from the day-1
    * corpus, and a concurrent corpus re-publish could tear the bundle,
    * pairing a new index with an old model): all four frames are written
    * as immutable parquet under ONE bundle directory, then a single
    * [[graft.sources.Manifests]] manifest names it — so a reader resolves
    * all-old or all-new, never a mix, on any scheme including rename-less
    * object stores.
    *
    * SNAPSHOT semantics, not append: model and thresholds are not
    * unionable, so each corpus build publishes a complete fresh bundle
    * (contrast [[publishAdmissionPostings]]'s append-maintained segment
    * root, which serves streams that track index growth WITHIN a corpus
    * version). Superseded bundle dirs stay on disk for reader grace — a
    * stream resolved against bundle n keeps reading it after n+1 publishes;
    * reap them with [[graft.sources.Manifests.vacuumSnapshots]] (retention
    * keyed on manifest history, which also reaps the crash remnant this
    * multi-write publish can strand — a bundle written but never
    * manifest-named, aged below the newest complete publish), never with
    * [[graft.sources.Manifests.vacuumSegments]] (whose
    * unreferenced-means-leaked rule is an APPEND-protocol invariant and
    * would delete every superseded snapshot immediately). Single publisher
    * per root (the Manifests discipline); returns the manifest number. */
  def publishDay2Artifacts(art: Day2Artifacts, root: String): Long = {
    val s = art.benchGrams.sparkSession
    val bundle = s"bundle-${java.util.UUID.randomUUID()}"
    val EIE = org.apache.spark.sql.SaveMode.ErrorIfExists
    art.benchGrams.write.mode(EIE).parquet(s"$root/$bundle/bench_grams")
    art.model.write.mode(EIE).parquet(s"$root/$bundle/model")
    art.thresholds.write.mode(EIE).parquet(s"$root/$bundle/thresholds")
    art.postings.write.mode(EIE).parquet(s"$root/$bundle/postings")
    graft.sources.Manifests.publish(s, root, Seq(bundle))
  }

  /** The current complete bundle under a versioned root, each frame
    * eager-checkpointed off its parquet read (the [[day2Artifacts]]
    * materialize-once contract — a restart or a fresh always-on stream
    * resolves THIS instead of re-deriving day-1 artifacts from the corpus).
    * Resolved once, driver-side: verdicts stay frozen against the resolved
    * corpus version; re-create the stream from a fresh call to adopt a
    * later publish (the [[substringArtifactsVersioned]] freshness
    * contract). */
  def day2ArtifactsVersioned(s: SparkSession, root: String): Day2Artifacts = {
    val lines = graft.sources.Manifests.resolve(s, root)
    require(lines.length == 1 && lines.head.startsWith("bundle-"),
      s"day2ArtifactsVersioned: $root resolves to $lines — not a day-2 bundle " +
        "manifest (expected exactly one bundle-<uuid> line; was this root " +
        "published by publishDay2Artifacts?)")
    val b = s"$root/${lines.head}"
    Day2Artifacts(
      graft.Checkpoints.eager(s.read.parquet(s"$b/bench_grams")),
      graft.Checkpoints.eager(s.read.parquet(s"$b/model")),
      graft.Checkpoints.eager(s.read.parquet(s"$b/thresholds")),
      graft.Checkpoints.eager(s.read.parquet(s"$b/postings")))
  }

  /** Versioned publish of the TABLE-form day-2 bundle — the same
    * one-manifest snapshot protocol as [[publishDay2Artifacts]] (all five
    * legs under one bundle dir, a reader resolves all-old or all-new,
    * superseded bundles reaped by [[graft.sources.Manifests
    * .vacuumSnapshots]]), with the LM written as plain parquet TABLES: the
    * legs that outgrow the broadcast form stay scannable and
    * semi-join-prunable at rest instead of riding one driver row. */
  def publishDay2ShardedArtifacts(art: Day2ShardedArtifacts, root: String): Long = {
    val s = art.benchGrams.sparkSession
    val bundle = s"bundle-${java.util.UUID.randomUUID()}"
    val EIE = org.apache.spark.sql.SaveMode.ErrorIfExists
    art.benchGrams.write.mode(EIE).parquet(s"$root/$bundle/bench_grams")
    art.cnt.write.mode(EIE).parquet(s"$root/$bundle/cnt")
    art.pre.write.mode(EIE).parquet(s"$root/$bundle/pre")
    art.thresholds.write.mode(EIE).parquet(s"$root/$bundle/thresholds")
    art.postings.write.mode(EIE).parquet(s"$root/$bundle/postings")
    graft.sources.Manifests.publish(s, root, Seq(bundle))
  }

  /** The current complete TABLE-form bundle under a versioned root.
    * bench/thresholds/postings are eager-checkpointed as in
    * [[day2ArtifactsVersioned]]; cnt/pre are LEFT AS RAW PARQUET READS on
    * purpose — they are the legs with no size bound, and the per-trigger
    * scorer wants its semi-join prune to reach the parquet scan, not a
    * materialized copy. Same resolve-once freshness contract as the
    * broadcast loader. */
  def day2ShardedArtifactsVersioned(s: SparkSession,
                                    root: String): Day2ShardedArtifacts = {
    val lines = graft.sources.Manifests.resolve(s, root)
    require(lines.length == 1 && lines.head.startsWith("bundle-"),
      s"day2ShardedArtifactsVersioned: $root resolves to $lines — not a day-2 " +
        "bundle manifest (expected exactly one bundle-<uuid> line; was this " +
        "root published by publishDay2ShardedArtifacts?)")
    val b = s"$root/${lines.head}"
    Day2ShardedArtifacts(
      graft.Checkpoints.eager(s.read.parquet(s"$b/bench_grams")),
      s.read.parquet(s"$b/cnt"),
      s.read.parquet(s"$b/pre"),
      graft.Checkpoints.eager(s.read.parquet(s"$b/thresholds")),
      graft.Checkpoints.eager(s.read.parquet(s"$b/postings")))
  }

  /** p2's WHOLE day-2 admission as a PER-ARRIVAL verdict stream — the
    * composed online twin of [[graft.queries.PipelineQueries
    * .incrementalAdmissionOf]]: each arriving doc gets its
    * (doc_id, admit_reason, admitted) row the moment its micro-batch runs,
    * scored against the SAME frozen day-1 artifacts the nightly batch
    * reads, with the same bit constants:
    *
    *  - bit 1 (Bit2Decontam): not a bench member and no 8-gram overlap
    *    with the benchmark set — exact, via one broadcast row
    *    (`arrays_overlap` over the row-local gram hashes);
    *  - bit 2 (Bit2Quality): the FROZEN bigram-LM score vs the per-lang
    *    LOO p30 bar — the batch's join-then-fold replayed row-locally:
    *    per-instance p = c(g)/c1(pg) map lookups (absent → 0, the
    *    harsh-OOV rule), summed by the SAME SortedTermSum expression the
    *    batch aggregates with, so the fold order is bit-identical; a
    *    no-bigram doc or a lang with no threshold fails (no model, no
    *    admission);
    *  - bit 3 (Bit2Admitted): zero corpus near-dups via the factored
    *    [[withCorpusDupCount]] probe — the CORPUS-ONLY dupVsOld rule.
    *    THE DOCUMENTED DIVERGENCE: in-batch cluster settlement (min-id
    *    representatives among a day's arrivals, cluster-transitive
    *    contamination) inherently needs the day's whole pair graph and
    *    stays in the nightly batch — a stateless stream admits BOTH
    *    members of an in-batch near-dup pair online and the nightly run
    *    settles them (the [[admissionStream]] contract, now composed);
    *  - bit 4 (Bit2Mixture): the row-local per-source keep rate.
    *
    * Bits are monotone by construction (a doc failing bit k has all later
    * bits 0). Stateless end to end: broadcast-row cross joins, map
    * lookups, stream-static left joins — no streaming aggregation, no
    * state store rows at any trigger. */
  def day2AdmissionStream(docs: DataFrame, art: Day2Artifacts): DataFrame = {
    val V = graft.functions.VectorFunctions
    val T = graft.text.TextFunctions
    val scored = withCorpusDupCount(
        docs.select("doc_id", "lang", "source", "text"), art.postings)
      .crossJoin(art.benchGrams)
      .crossJoin(art.model)
      .join(broadcast(art.thresholds), Seq("lang"), "left")
      .withColumn("u", V.shingleHashesAll(col("text"), 1, T.HashP))
      .withColumn("bg", V.shingleHashesAll(col("text"), 2, T.HashP))
      // avg_p is NULL (never NaN) for a doc with no scorable bigram —
      // [[day2VerdictOf]]'s coalesce turns that into a failed quality bit,
      // the batch's no-bscore-row rule
      .withColumn("avg_p", when(size(col("bg")) >= 1,
        V.sortedTermSum(expr(
          """transform(bg, (x, i) -> struct(x AS g,
            |  coalesce(CAST(element_at(cnt_m, x) AS DOUBLE)
            |    / CAST(element_at(pre_m, u[i]) AS DOUBLE), 0.0D) AS t))""".stripMargin))
          / size(col("bg"))))
    day2VerdictOf(scored)
  }

  /** Verdict assembly SHARED by the broadcast-model stream
    * ([[day2AdmissionStream]]) and the table-model per-trigger scorer
    * ([[day2AdmissionShardedBatch]]) so the two scale forms cannot drift:
    * expects doc_id, text, source (the mixture rate reads it), bench_g
    * (the one-row benchmark gram set), avg_p (NULL = no scorable
    * bigrams), p30 (NULL = lang has no day-1 threshold), n_corpus_dups.
    * Bit constants are p2's; the bitmap is monotone by construction. */
  private def day2VerdictOf(scored: DataFrame): DataFrame = {
    val V = graft.functions.VectorFunctions
    val T = graft.text.TextFunctions
    val P = graft.queries.PipelineQueries
    // coalesce false (ADVICE r17): a NULL-text arrival has NULL gram
    // hashes, so a bare arrays_overlap is NULL and the decontam bit would
    // read 0 — while the batch (whose g8 explode emits nothing for the doc,
    // so the left_anti keeps it) GRANTS the bit. No overlap evidence = no
    // contamination, in both engines.
    val k1 = (col("doc_id") % 20 =!= 0) &&
      !coalesce(
        arrays_overlap(V.shingleHashes(col("text"), 8, T.HashP), col("bench_g")),
        lit(false))
    val k2 = k1 && coalesce(col("avg_p") >= col("p30"), lit(false))
    val k3 = k2 && col("n_corpus_dups") === 0
    val k4 = k3 && graft.queries.CurationQueries.mixPred
    scored.select(col("doc_id"),
        (when(k1, P.Bit2Decontam).otherwise(0) + when(k2, P.Bit2Quality).otherwise(0) +
          when(k3, P.Bit2Admitted).otherwise(0) + when(k4, P.Bit2Mixture).otherwise(0))
          .cast("int").as("admit_reason"))
      .withColumn("admitted", col("admit_reason") === P.AdmittedAll)
  }

  /** The day-2 admission verdict PAST the broadcast bound —
    * [[day2AdmissionStream]]'s twin for vocabularies [[day2ArtifactsFrom]]
    * REFUSES ([[Day2MaxModelEntries]]): score ONE arrival batch (a
    * micro-batch inside foreachBatch, or a day's batch) against the
    * TABLE-form bundle. Bits 1/3/4 are the stream's own expressions (the
    * shared [[day2VerdictOf]] assembly); bit 2 replays the nightly batch's
    * semi-join-pruned scoring verbatim — prune the cnt/pre tables to the
    * batch's distinct grams (O(batch-vocab) rows shuffle per trigger, and
    * against a [[day2ShardedArtifactsVersioned]] bundle the prune reaches
    * the parquet scan), join probabilities per instance, fold per doc with
    * the SAME SortedTermSum the batch and the broadcast stream use — so
    * all three scale forms are bit-identical where they overlap
    * (spec-pinned, including the stream's in-batch-twin divergence, which
    * this per-batch scorer shares: the probe is corpus-only).
    *
    * Run it online via foreachBatch ([[runDay2AdmissionShardedOnce]]):
    * per-trigger batch-engine scoring IS the scale path — the per-trigger
    * plan may shuffle (the bit-2 fold), but NO STREAMING STATE exists
    * between triggers, and the model size is bounded only by storage. */
  def day2AdmissionShardedBatch(arrivals: DataFrame,
                                art: Day2ShardedArtifacts): DataFrame = {
    val V = graft.functions.VectorFunctions
    val binst = graft.queries.TextQueries.bigramInstancesOf(
      arrivals.select("doc_id", "text"))
    val cnt = art.cnt.join(binst.select("g").distinct(), Seq("g"), "left_semi")
    val pre = art.pre.join(binst.select("pg").distinct(), Seq("pg"), "left_semi")
    // unseen bigram → no cnt row → coalesce 0 (harsh-OOV; c1 is never null
    // when c isn't — the batch kernel's invariant: a seen bigram has a seen
    // prefix)
    val bp = binst.join(cnt, Seq("g"), "left").join(pre, Seq("pg"), "left")
      .select(col("doc_id"), col("g"),
        coalesce(col("c").cast("double") / col("c1").cast("double"), lit(0.0)).as("p"))
    val bscore = bp.groupBy("doc_id").agg(
      (V.sortedTermSum(collect_list(struct(col("g").as("g"), col("p").as("t"))))
        / count(lit(1))).as("avg_p"))
    val scored = withCorpusDupCount(
        arrivals.select("doc_id", "lang", "source", "text"), art.postings)
      .crossJoin(art.benchGrams)
      .join(broadcast(art.thresholds), Seq("lang"), "left")
      .join(bscore, Seq("doc_id"), "left")
    day2VerdictOf(scored)
  }

  /** Drive [[day2AdmissionShardedBatch]] as the ONLINE gate (AvailableNow,
    * foreachBatch, parquet sink): each trigger's arrivals are scored by
    * the batch engine against the resolved bundle and their verdict rows
    * land under `outDir/batch_id=<id>`. foreachBatch is what makes the
    * unbounded model safe online — zero streaming state between triggers —
    * and the batchId-keyed OVERWRITE makes the sink IDEMPOTENT: foreachBatch
    * invocation is at-least-once across restarts, so a replayed committed
    * batch rewrites its own directory instead of appending duplicate
    * verdict rows (exactly-once output; readers see batch_id as a partition
    * column). Returns the terminated query so callers can assert on its
    * progress. */
  def runDay2AdmissionShardedOnce(arrivals: DataFrame, art: Day2ShardedArtifacts,
                                  outDir: String,
                                  checkpointDir: String): StreamingQuery = {
    val q = arrivals.writeStream
      .foreachBatch { (mb: DataFrame, id: Long) =>
        // persist the micro-batch: the scorer's plan reads the arrivals
        // several times (the binst prune legs + the scored branch) and an
        // unpersisted foreachBatch frame re-scans the SOURCE per read —
        // observed 4× input_rows in the rehearsal before this
        val batch = mb.persist()
        try day2AdmissionShardedBatch(batch, art)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$outDir/batch_id=$id")
        finally batch.unpersist()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** The persisted probe side of the STREAMING substring twin: the corpus's
    * capped content-defined anchor postings, (h, cid, c_pos). Production
    * writes this once per corpus version (Manifests segments, like the
    * admission postings) next to [[substringTokenStore]]. The df cap is
    * counted over the CORPUS anchors; the nightly batch d16 counts over
    * corpus ∪ arrivals — identical whenever the cap is inert (every test
    * scale), the documented d16-family divergence when it is not. */
  def substringPostings(corpus: DataFrame): DataFrame = {
    val D = graft.queries.DedupQueries
    D.cappedAnchorPostings(corpus, D.SpanLen, D.AnchorStride)
      .select(col("h"), col("doc_id").as("cid"), col("pos").as("c_pos"))
  }

  /** The corpus token arrays the probe's exact LCP extension reads,
    * (cid, cws) — the second half of the persisted artifact. */
  def substringTokenStore(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id").as("cid"),
        graft.text.TextFunctions.tokens(col("text")).as("cws"))
      .where(size(col("cws")) >= graft.queries.DedupQueries.SpanLen)

  /** Versioned publish for the substring-probe artifact pair — the same
    * Manifests protocol the admission postings and band index use, so an
    * always-on probe never tears a mid-write corpus-version publish. Two
    * sub-roots (the frames have different schemas); TOKENS ARE PUBLISHED
    * FIRST so a reader resolving postings-then-tokens can only observe a
    * token store at least as new as its postings — on an append-only
    * corpus the token store is then a superset and every posting's cid
    * resolves; the converse order could strand a posting. Append the NEW
    * docs' artifacts per corpus version (segment union accumulates), the
    * band-index contract. */
  def publishSubstringArtifacts(corpus: DataFrame, root: String): Unit = {
    graft.sources.Manifests.appendSegment(substringTokenStore(corpus), s"$root/tokens")
    graft.sources.Manifests.appendSegment(substringPostings(corpus), s"$root/postings")
  }

  /** The current (postings, tokenStore) snapshot under a versioned root —
    * resolve order postings-then-tokens (see [[publishSubstringArtifacts]]).
    * Pass straight to [[substringHitStream]].
    *
    * Two read-side normalizations make the append-maintained layout safe:
    *  - the [[graft.queries.DedupQueries.MaxGramDf]] cap is RE-APPLIED over
    *    the segment UNION — each publish capped only its own segment's df,
    *    so a boilerplate gram arriving under the cap in every segment would
    *    otherwise accumulate an uncapped corpus-wide posting list, exactly
    *    the h-join fan-out the cap exists to bound (per-segment caps that
    *    already dropped a segment-hot gram stay dropped — the recap is
    *    conservative, never resurrecting);
    *  - both frames are DEDUPLICATED — publishSubstringArtifacts is two
    *    non-atomic appends, so a crash-between + retry publishes identical
    *    rows twice, and duplicate token rows would multiply every hit (the
    *    admission stream's re-group rationale).
    * Both are one pass over the artifact at stream build, resolved once. */
  def substringArtifactsVersioned(s: org.apache.spark.sql.SparkSession,
                                  root: String): (DataFrame, DataFrame) = {
    val D = graft.queries.DedupQueries
    // capPostings keys on h only — the (h, cid, c_pos) schema passes through
    val posts = D.capPostings(
      graft.sources.Manifests.readSegments(s, s"$root/postings").distinct(),
      D.MaxGramDf)
    val toks = graft.sources.Manifests.readSegments(s, s"$root/tokens")
      .dropDuplicates("cid")
    (posts, toks)
  }

  /** STREAMING substring dedup (VERDICT r14 missing #3 — the one dedup
    * modality with no online counterpart): each arriving doc is probed
    * against the persisted corpus anchor postings the moment its
    * micro-batch runs, emitting one row per maximal shared span vs a
    * corpus doc — (doc_id, corpus_id, a_pos, c_pos, span_len), positions
    * 0-based in arrival/corpus token coordinates. No emitted rows =
    * admissible; d16's exact-extension semantics per row. Arrival-arrival
    * spans settle in the nightly batch run (the admission-stream split).
    *
    * Completely STATELESS, including the duplicate-suppression that makes
    * that non-obvious: a long shared span contains ~span/stride arrival
    * anchors, every one of which hits the same corpus span and extends to
    * identical maximal bounds — the batch d16 collapses them by island
    * grouping (a shuffle) then `.distinct()` (stateful on a stream). Here
    * the arrival's full anchor-position array rides the row, so each hit
    * decides ROW-LOCALLY whether its anchor is the span's FIRST in-span
    * arrival anchor and only that one emits: every in-span arrival anchor
    * provably collides with this corpus doc on this diagonal (its gram
    * lies inside the shared span), so "first in-span" selects exactly one
    * hit per (arrival, corpus doc, span) with no cross-row state.
    *
    * CAP-ACTIVE caveat (one notch past the batch d16's own): the "every
    * in-span anchor collides" premise fails for an anchor whose gram is
    * df-capped out of the posting artifact — if the span's FIRST in-span
    * arrival anchor is such a hot gram, its hit row never exists and the
    * later anchors' rows fail the first-in-span test, so the stream
    * reports NOTHING for that span (where the capped batch run reports it
    * unsplit via rare anchors). Inert wherever the cap is (every test
    * scale); on a boilerplate-heavy production corpus the nightly batch
    * pass — the published substring-dedup norm — remains the span source
    * of truth, and the stream is its early-warning probe.
    *
    * 100 TB notes: state ZERO; per-batch work is O(arrival anchors) probe
    * rows (~tokens/stride) joined against the posting artifact, plus the
    * token-store lookup per colliding pair. The probe rows are NOT narrow:
    * each exploded anchor carries the arrival's full token array and
    * anchor-position array (the extension and the first-in-span rule need
    * them on hit rows, and a stateless one-pass stream cannot join them
    * back later). The intended regime is therefore a BROADCAST posting
    * artifact — the h-join then runs map-side and the arrays never enter a
    * shuffle, only per-row memory bandwidth. At artifact sizes past
    * broadcast range the joins degrade to per-batch shuffles that DO ship
    * the arrays (~tokens²/stride bytes for a pathological mega-doc) —
    * still stateless, but at that scale route arrivals to the nightly
    * batch d16, whose island collapse attaches arrays per-candidate, not
    * per-anchor. */
  def substringHitStream(docs: DataFrame, postings: DataFrame,
                         tokenStore: DataFrame): DataFrame = {
    val D = graft.queries.DedupQueries
    val T = graft.text.TextFunctions
    val K = D.SpanLen
    val withAnchors = docs
      .select(col("doc_id"), T.tokens(col("text")).as("ws"))
      // the anchor expression must be TOTAL, not merely guarded by a
      // .where(size >= K): Catalyst collapses the projections into the
      // downstream filter predicates, where a sub-K doc would evaluate
      // sequence(0, negative) and slice(ws, 0, ..) errors before the size
      // conjunct can short-circuit. NULL for short docs — explode drops
      // those rows, which IS the <SpanLen contract.
      .withColumn("anch", when(size(col("ws")) >= K, filter(
        transform(sequence(lit(0), size(col("ws")) - K),
          i => struct(i.as("pos"),
            T.polyHash(concat_ws(" ", slice(col("ws"), i + 1, lit(K)))).as("h"))),
        g => pmod(g.getField("h"), lit(D.AnchorStride)) === 0)))
      .withColumn("aps", transform(col("anch"), g => g.getField("pos")))
      .select(col("doc_id"), col("ws"), col("aps"), explode(col("anch")).as("a"))
      .select(col("doc_id"), col("ws"), col("aps"),
        col("a.pos").as("a_pos"), col("a.h").as("h"))
    val hit = withAnchors
      .join(postings, "h")
      // self-pairs excluded (re-ingested corpus content probing its own
      // postings — the IvfIndex.search convention); production arrivals
      // carry fresh ids so this is inert there
      .where(col("doc_id") =!= col("cid"))
      .join(tokenStore, "cid")
      .withColumn("ext_l", D.lcpTokens(
        reverse(slice(col("ws"), lit(1), col("a_pos"))),
        reverse(slice(col("cws"), lit(1), col("c_pos")))))
      .withColumn("ext_r", D.lcpTokens(
        slice(col("ws"), col("a_pos") + K + 1, size(col("ws"))),
        slice(col("cws"), col("c_pos") + K + 1, size(col("cws")))))
    hit.where(col("a_pos") === array_min(filter(col("aps"),
        p => p >= col("a_pos") - col("ext_l") && p <= col("a_pos") + col("ext_r"))))
      .select(col("doc_id"), col("cid").as("corpus_id"),
        (col("a_pos") - col("ext_l")).cast("long").as("a_pos"),
        (col("c_pos") - col("ext_l")).cast("long").as("c_pos"),
        (col("ext_l") + col("ext_r") + K).as("span_len"))
  }

  /** Run the streaming admission end-to-end (AvailableNow, memory sink):
    * `corpus` static, the documents table replayed as the arrival stream. */
  def runAdmissionOnce(spark: SparkSession, dir: String, corpus: DataFrame,
                       queryName: String = "admission"): DataFrame = {
    val q = admissionStream(documentStream(spark, dir), corpus)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Run sessionization end-to-end (AvailableNow, memory sink); returns the
    * CLOSED sessions emitted by the stream (open sessions remain in state —
    * the streaming contract). */
  def runSessionizeOnce(spark: SparkSession, dir: String, queryName: String = "sessions"): DataFrame = {
    import spark.implicits._
    val ev = eventStream(spark, dir).as[Event]
    val q = sessionize(ev)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
