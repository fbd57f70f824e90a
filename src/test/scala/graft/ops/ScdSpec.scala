package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def log = {
    import spark.implicits._
    Seq(
      // user 1: a a b a — four events, three runs; run 2 ends where run 3 starts
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 11:00:00", "a"),
      (1L, 3L, "2024-01-01 12:00:00", "b"),
      (1L, 4L, "2024-01-01 13:00:00", "a"),
      // user 2: tie timestamps — event_id breaks the order (5 before 6 → a,b)
      (2L, 6L, "2024-02-01 09:00:00", "b"),
      (2L, 5L, "2024-02-01 09:00:00", "a"))
      .toDF("user_id", "event_id", "tss", "attr")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
  }

  test("changeIntervals collapses runs with half-open chained intervals") {
    val got = Scd.changeIntervals(log, "user_id", "attr", "ts", "event_id")
      .orderBy("user_id", "run_idx").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3).toString, Option(r.getTimestamp(4)).map(_.toString),
        r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, "a", 1L, "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0"), 2L),
      (1L, "b", 2L, "2024-01-01 12:00:00.0", Some("2024-01-01 13:00:00.0"), 1L),
      (1L, "a", 3L, "2024-01-01 13:00:00.0", None, 1L),
      (2L, "a", 1L, "2024-02-01 09:00:00.0", Some("2024-02-01 09:00:00.0"), 1L),
      (2L, "b", 2L, "2024-02-01 09:00:00.0", None, 1L)))
  }

  test("null attribute values open, continue, and close runs null-safely") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", null),
      (1L, 2L, "2024-01-01 11:00:00", null),
      (1L, 3L, "2024-01-01 12:00:00", "x"),
      (1L, 4L, "2024-01-01 13:00:00", null))
      .toDF("user_id", "event_id", "tss", "attr")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Scd.changeIntervals(ev, "user_id", "attr", "ts", "event_id")
      .orderBy("run_idx").collect()
      .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(5)))
    // null,null | x | null → three runs, the leading nulls as ONE run
    assert(got.toSeq == Seq((None, 1L, 2L), (Some("x"), 2L, 1L), (None, 3L, 1L)))
  }

  test("asOfLookup resolves the interval valid at each probe instant") {
    import spark.implicits._
    val hist = Scd.changeIntervals(log, "user_id", "attr", "ts", "event_id")
    val probes = Seq(
      (1L, "2024-01-01 10:30:00"), // inside run 1 → a
      (1L, "2024-01-01 12:00:00"), // exactly at run-2 start (half-open) → b
      (1L, "2024-01-01 23:00:00"), // after last run start → current run a
      (1L, "2023-12-31 00:00:00"), // before history → dropped
      (9L, "2024-01-01 10:30:00")) // unknown key → dropped
      .toDF("user_id", "tss")
      .withColumn("probe_ts", to_timestamp(col("tss"))).drop("tss")
    val got = Scd.asOfLookup(probes, hist, "user_id", "probe_ts")
      .select("probe_ts", "attr").collect()
      .map(r => r.getTimestamp(0).toString -> r.getString(1)).toMap
    assert(got == Map(
      "2024-01-01 10:30:00.0" -> "a",
      "2024-01-01 12:00:00.0" -> "b",
      "2024-01-01 23:00:00.0" -> "a"))
  }

  test("changeIntervals is repartition-stable and plans ONE exchange") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Scd.changeIntervals(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "run_idx").collect().toSeq
    val b = Scd.changeIntervals(ev.repartition(7), "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "run_idx").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // every event lands in exactly one interval
    assert(a.map(_.getLong(5)).sum == ev.count())
    // lag + island sum + run aggregate + lead all cluster on hash(user_id):
    // a second exchange would become the bottleneck at scale
    val plan = Scd.changeIntervals(ev, "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
