package graft.examples

import graft.ext.TextStats
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput measurement for the streaming surface (the one
  * number the semantics specs don't give): drives the curation gate and the
  * stateful sessionizer through a MemoryStream in `batches` explicit
  * microbatches — each `addData` + `processAllAvailable()` cycle is one
  * trigger, so the measured rate INCLUDES per-batch planning/commit overhead,
  * which is what a production micro-batch pipeline actually sustains, not a
  * single-batch burst. Sinks are `noop` so sink I/O doesn't pollute the
  * number. Events are fed in timestamp order (the arrival order a watermarked
  * stream assumes); state size comes from the engine's own
  * `stateOperators` progress metrics.
  *
  * Measured paths:
  *  1. curation gate: PII scrub + Gopher/C4 quality signals over documents —
  *     stateless codegen'd projections (the streaming-safety spec's chain).
  *  2. stateful sessionizer: flatMapGroupsWithState with event-time timeout
  *     over events — O(1) state per user.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.StreamBench /root/testdata/sf0.1 20"`.
  * Results recorded per round in BASELINE.md.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // ---- 1. curation gate stream (stateless: scrub + quality signals) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val docChunks = docs.grouped(math.max(1, docs.size / batches)).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docStream = MemoryStream[(Long, String)]
    val gated = TextStats.qualityFilter(
      docStream.toDF().toDF("doc_id", "text")
        .withColumn("text", TextStats.scrubPii(col("text"))))
    val gateQ = gated.writeStream.outputMode("append").format("noop").start()
    val t0 = System.nanoTime()
    docChunks.foreach { c => docStream.addData(c); gateQ.processAllAvailable() }
    val gateSec = (System.nanoTime() - t0) / 1e9
    gateQ.stop()
    println(f"[stream] curation gate: ${docs.size} docs in ${docChunks.size} batches, " +
      f"$gateSec%.2f s = ${docs.size / gateSec}%.0f docs/s")

    // ---- 2. stateful sessionizer stream (fMGWS + event-time timeout) ----
    val events = graft.queries.Reference.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("ts"), col("event_id"))
      .as[EventStream.Event].collect().toSeq
    val evChunks = events.grouped(math.max(1, events.size / batches)).toSeq
    val evStream = MemoryStream[EventStream.Event]
    val sessions = EventStream.sessionizeStateful(evStream.toDS(),
      gapMillis = 30L * 60 * 1000)
    val sessQ = sessions.writeStream.outputMode("append").format("noop").start()
    val t1 = System.nanoTime()
    evChunks.foreach { c => evStream.addData(c); sessQ.processAllAvailable() }
    val sessSec = (System.nanoTime() - t1) / 1e9
    val state = Option(sessQ.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    val stateRows = state.map(_.numRowsTotal).sum
    val stateBytes = state.map(_.memoryUsedBytes).sum
    sessQ.stop()
    println(f"[stream] stateful sessions: ${events.size} events in ${evChunks.size} batches, " +
      f"$sessSec%.2f s = ${events.size / sessSec}%.0f events/s; " +
      f"state $stateRows rows / ${stateBytes / 1024.0}%.0f KiB")

    spark.stop()
  }
}
