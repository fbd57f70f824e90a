package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming form of the event-stream operators (SURVEY.md §2.e
  * E5, §7 risk 6): the batch pipeline in graft.ext.Jsonish upgrades to
  * `readStream` + watermark without semantic change — same `window()` /
  * `session_window()` groupings, same aggregates.
  *
  * Scale posture: watermarks bound state (late data beyond the horizon is
  * dropped, state for closed windows is evicted); the windowed aggregation
  * shuffles once on (window, key) with partial aggregation; custom session
  * state via flatMapGroupsWithState is partitioned by user key — the
  * standard 1000-executor streaming topology.
  */
object EventStream {

  /** File-stream source over a directory of event parquet files. A stream
    * source needs an explicit schema, but the testdata's `ts` physical shape
    * has varied across generations (Long nanos under nanosAsLong vs
    * TIMESTAMP_NTZ micros — see [[graft.queries.Reference.events]]), so the
    * schema is probed from the files already in the directory with one batch
    * footer read, then `ts` is normalized to TimestampType exactly like the
    * batch loader. Requires at least one file present at call time — true
    * for every staging pattern here, and the natural contract for a replay
    * source (an empty directory has no shape to promise).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val probed = spark.read.parquet(dir).schema
    graft.queries.Reference.normalizeTs(
      spark.readStream.schema(probed).parquet(dir))
  }

  /** Tumbling-window counts/sums with a watermark: the streaming twin of
    * Jsonish.tumbling. Append-mode-compatible (watermark closes windows).
    */
  def tumbling(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window counts/sums with a watermark: the streaming twin of
    * Jsonish.sliding. Each event lands in width/slide overlapping windows;
    * the watermark closes them for append mode.
    */
  def sliding(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based session windows under a watermark — `session_window` merges
    * overlapping per-key windows as events arrive.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Batch sessionization by the classic gaps-and-islands recurrence: a new
    * session starts when the gap since the user's previous event is >= `gap`
    * (exactly `session_window`'s merge rule — windows [t, t+gap) merge only
    * while they overlap), the session index is a running sum of those
    * start-flags, and one aggregate per (user, session) yields the summary.
    * `session_end` = last event + gap, matching [[sessions]]' output shape,
    * so the two forms are interchangeable (pinned in EventStreamSpec).
    *
    * Determinism: the window order is (ts, event_id) — a total order even
    * when a user has simultaneous events — so the island assignment is a
    * property of the data, not of partitioning.
    *
    * Scale: ONE shuffle. The two window functions and the final groupBy all
    * cluster on `user_id` — Catalyst reuses the window's HashPartitioning
    * for the aggregate (hash(user_id) satisfies the (user_id, session_idx)
    * clustering), so the plan is scan → exchange(user_id) → sort → window →
    * window → partial+final agg with no second exchange. State per user is
    * the sort run, not a driver-side structure.
    */
  def sessionizeBatch(events: DataFrame, gap: String = "30 minutes",
      valueAgg: Column => Column = sum(_)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapUs = gapMicros.microseconds + gapMicros.days * 86400000000L
    require(gapMicros.months == 0, "sessionizeBatch: gap must be a fixed duration")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev_us").isNull ||
          unix_micros(col("ts")) - col("__prev_us") >= gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("session_start"),
        timestamp_micros(max(unix_micros(col("ts"))) + gapUs).as("session_end"),
        count(lit(1)).as("n_events"),
        valueAgg(col("value")).as("sum_value"))
      .drop("__sid")
  }

  /** Streaming exact dedup: drop duplicate event ids as they arrive, with
    * state bounded by the watermark (`dropDuplicatesWithinWatermark` evicts
    * ids older than the horizon — without it, dedup state grows forever on
    * an unbounded stream). The streaming twin of Dedup.exactRows for the
    * training-data ingest path.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join: every `conversions` row enriched with ALL
    * `touches` rows for the same user inside the trailing window
    * (`touch.ts ∈ [conv.ts − window, conv.ts]`) — the multi-touch
    * companion to the as-of join's latest-only semantics (e90/e97), and
    * the remaining Structured Streaming join shape the library exercises:
    * stream⋈stream with an event-time range condition.
    *
    * Streaming semantics: BOTH sides carry watermarks; the range condition
    * plus the watermark bound the join state — touch rows are evicted once
    * the conversion-side watermark passes `touch.ts + window` (Spark
    * derives the state horizon from the time-range predicate; without the
    * range condition stream-stream state grows forever). On batch inputs
    * the same code is a plain equi+range join, so the streaming result is
    * pinned ≡ batch in EventStreamSpec.
    *
    * Inputs must both have `user_id` and `ts`; `touches` columns are
    * prefixed `t_` in the output (its `user_id` dropped, its ts as
    * `t_ts`).
    */
  def enrichWithinWindow(conversions: DataFrame, touches: DataFrame,
      windowSeconds: Long, watermarkDelay: String = "2 hours"): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive: $windowSeconds")
    val conv =
      if (conversions.isStreaming) conversions.withWatermark("ts", watermarkDelay)
      else conversions
    val tRenamed = touches.columns.foldLeft(touches) { (df, c) =>
      if (c == "user_id") df else df.withColumnRenamed(c, s"t_$c")
    }
    val tch =
      if (tRenamed.isStreaming) tRenamed.withWatermark("t_ts", watermarkDelay)
      else tRenamed
    conv.join(tch,
      conv("user_id") === tch("user_id") &&
        col("t_ts") >= col("ts") - expr(s"INTERVAL $windowSeconds seconds") &&
        col("t_ts") <= col("ts"),
      "inner").drop(tch("user_id"))
  }

  // ---- custom state: flatMapGroupsWithState sessionization ----

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, lastSeen: Long, n: Long, sum: Double)

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization: closes a user's session when the gap
    * between consecutive events exceeds `gapMillis`, emitting one summary
    * row per closed session. The state object is O(1) per key — at scale,
    * state store size is #active users, not #events.
    *
    * Session CLOSURE has two triggers, both required on a real stream:
    *  - a later event for the same user beyond the gap (the fold below), and
    *  - `EventTimeTimeout`: when the watermark passes `lastSeen + gapMillis`
    *    with no further event, the open session is emitted and its state
    *    evicted. Without this, an idle user's FINAL session never surfaces
    *    and their state lives forever — on a 100 TB stream that is both a
    *    correctness hole and an unbounded state store.
    *
    * On a streaming Dataset a watermark on `ts` is applied here (required
    * for event-time timeouts); `watermarkDelay` is the usual lateness bound.
    * On a batch Dataset (tests, backfills) Spark never fires timeouts — the
    * trailing open session per user is withheld, matching append-mode
    * semantics of the streaming twin before the watermark closes it.
    */
  def sessionizeStateful(events: Dataset[Event], gapMillis: Long,
      watermarkDelay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evts: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + gap: the session can no longer be
            // extended by in-watermark data — emit it and evict the state
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.n, s.sum))
          } else {
            val sorted = evts.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > gapMillis =>
                  out += SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1, sum = s.sum + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // event-time timeouts need a watermark; batch runs have none
              if (streaming) state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            out.iterator
          }
      }
  }

  final case class LatestOut(user_id: Long, event_id: Long, event_type: String,
      ts: java.sql.Timestamp)

  /** Streaming keep-latest state — the streaming twin of
    * [[graft.ops.Incremental.latestByKey]]: maintains each key's newest row
    * (by event time, `event_id` breaking ties) and emits the current value
    * ONLY when it actually changes, via `flatMapGroupsWithState` in Update
    * mode — a replay of already-absorbed events writes no state and emits
    * nothing, so sink traffic and checkpoint volume scale with real
    * changes, not with replays. Late events older than the held state are
    * absorbed silently: the state converges to the same maximum regardless
    * of arrival order (pinned against the batch operator in
    * EventStreamSpec). State is O(1) per key — a served "current state"
    * table at 100 TB is #keys, not #events.
    *
    * Ordering compares (seconds, nanos, id) — the FULL timestamp
    * precision, matching the batch operator's microsecond ordering
    * (`Timestamp.getTime` alone is millisecond-truncated and would pick a
    * different winner for sub-millisecond-apart events). The seconds
    * component uses `Math.floorDiv`: `/ 1000` truncates toward zero, which
    * for PRE-EPOCH timestamps (−1500 ms → −1 s carrying nanos 5e8) would
    * order sub-second-apart 1969 events differently from the batch winner.
    *
    * NoTimeout deliberately: current-state tables serve lookups
    * indefinitely, so state lives as long as the key; bound the key space
    * upstream if eviction is needed.
    */
  def latestStateStream(events: Dataset[Event]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    def key(o: LatestOut): (Long, Int, Long) =
      (Math.floorDiv(o.ts.getTime, 1000L), o.ts.getNanos, o.event_id)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LatestOut, LatestOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, evts: Iterator[Event], state: GroupState[LatestOut]) =>
          val prev = state.getOption
          val newest = (prev.iterator ++ evts.map(e =>
            LatestOut(userId, e.event_id, e.event_type, e.ts)))
            .maxBy(key)
          if (prev.contains(newest)) Iterator.empty
          else {
            state.update(newest)
            Iterator.single(newest)
          }
      }
  }

  /** Batch replay of [[sessionizeStateful]]'s append-mode semantics over the
    * events table, shaped for the DuckDB oracle — the one streaming-state
    * operator whose OUTPUT CONTRACT (not just its aggregates) is
    * hash-verified: strict `>` gap closure, `session_end` = last event (no
    * +gap — the fMGWS contract, unlike `session_window`), millisecond gap
    * arithmetic (`Timestamp.getTime`), and each user's trailing OPEN session
    * withheld exactly as append mode withholds it until the watermark fires
    * the event-time timeout.
    *
    * Determinism inventory: the fold sorts a user's events by ms timestamp
    * only, so every emitted field must be invariant to the arrival order of
    * same-ms events — island membership is (a 0 gap never closes), counts
    * and boundaries are, and the value sum is made exact by pre-scaling to
    * 1e-4 integer units carried in the Double field (integer-valued double
    * addition is associative below 2^53; the [[graft.queries.Reference.msum]]
    * atom applied to streaming state). Catalyst converts micros→ms with
    * `Math.floorDiv`, and DuckDB's `//` is floor division, so the ms grid
    * agrees between engines even pre-epoch.
    *
    * Scale: ONE shuffle on `user_id` into the flatMapGroupsWithState sort —
    * the same topology the streaming twin runs with a state store; the
    * replay is how you backfill a sessionized history at rest beside the
    * live stream.
    */
  def statefulReplay(events: DataFrame, gapMillis: Long = 30 * 60 * 1000L): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ds = events.select(
        col("event_id").cast("long").as("event_id"),
        col("ts"),
        col("user_id").cast("long").as("user_id"),
        col("event_type"),
        round(col("value") * 10000, 0).as("value"))
      .as[Event]
    sessionizeStateful(ds, gapMillis).toDF()
      .select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"),
        (col("sum_value").cast("long").cast("double") / 10000).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Generated DuckDB mirror of [[statefulReplay]] — gaps-and-islands on the
    * ms grid with strict `>` closure, last-event session ends, and the
    * trailing island per user excluded (the withheld open session). Keep in
    * lockstep with the Scala form.
    */
  def statefulReplaySql(table: String, gapMillis: Long = 30 * 60 * 1000L): String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms,
       |    CAST(round(value * 10000) AS BIGINT) AS units
       |  FROM $table
       |), lagged AS (
       |  SELECT user_id, event_id, ms, units,
       |    LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
       |  FROM ev
       |), isl AS (
       |  SELECT user_id, ms, units,
       |    SUM(CASE WHEN prev_ms IS NULL OR ms - prev_ms > $gapMillis
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ms, event_id
       |        ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM lagged
       |), ses AS (
       |  SELECT user_id, sid, MIN(ms) AS start_ms, MAX(ms) AS end_ms,
       |    COUNT(*) AS n_events,
       |    CAST(SUM(units) AS DOUBLE) / 10000 AS sum_value
       |  FROM isl GROUP BY user_id, sid
       |)
       |SELECT user_id,
       |  strftime(make_timestamp(start_ms * 1000), '%Y-%m-%d %H:%M:%S')
       |    AS session_start,
       |  strftime(make_timestamp(end_ms * 1000), '%Y-%m-%d %H:%M:%S')
       |    AS session_end,
       |  n_events, sum_value
       |FROM ses
       |QUALIFY sid < MAX(sid) OVER (PARTITION BY user_id)
       |ORDER BY user_id, session_start""".stripMargin

  /** Continuous-ingestion near-dup gate: every micro-batch of documents is
    * deduped against a persisted [[graft.ext.Dedup.buildMinHashStore]]
    * signature store — matches at the store's pinned MinHash parameters
    * are dropped, survivors go to `sink` AND their signatures are appended,
    * so later batches (and later docs in the SAME batch — greedy
    * lowest-id-wins) dedup against everything ingested so far. This is the
    * e115 incremental-dedup lifecycle as a stream.
    *
    * `foreachBatch` is the supported Structured Streaming shape for this
    * operator: the lookup's candidate-distinct + signature re-join would be
    * a disallowed stream-stream self-join in pure streaming form, while
    * inside `foreachBatch` the exact batch operator
    * ([[graft.ext.Dedup.minHashStoreIngest]]) runs per trigger — streaming
    * ≡ batch is pinned in EventStreamSpec.
    *
    * Restart semantics: `foreachBatch` is at-least-once, so a batch id can
    * replay after a crash. Appends are guarded by a per-batch marker dir
    * (`$store/_stream/<queryName>_<batchId>`, created AFTER the append): a
    * replayed batch recomputes and re-emits the SAME survivors (the ingest
    * step excludes same-id store matches, so a batch never flags its own
    * appended signatures) and never double-appends once the marker exists.
    * A crash between append and marker re-appends duplicate signature ROWS
    * — harmless to lookup semantics (duplicate candidates collapse in the
    * match distinct; flags are id sets) and reclaimed by the next
    * [[graft.ext.Dedup.compactMinHashStore]].
    */
  def dedupStreamWithStore(docs: DataFrame, storePath: String,
      queryName: String, minEstJaccard: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id")
      (sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(storePath),
          spark.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(
          s"$storePath/_stream/${queryName}_$batchId")
        val alreadyAppended = fs.exists(marker)
        val survivors = graft.ext.Dedup.minHashStoreIngest(spark, storePath,
          batch, textCol, idCol, minEstJaccard,
          appendSurvivors = !alreadyAppended)
        sink(survivors)
        if (!alreadyAppended) fs.mkdirs(marker): Unit
      }
      .start()

  /** Run a streaming frame to completion against the files currently in the
    * source directory, collecting results via the memory sink — the local
    * smoke-loop (spark_guide: memory format + processAllAvailable).
    */
  def runToMemory(df: DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(queryName)
  }
}
