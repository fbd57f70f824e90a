package graft.ext

import graft.SparkTestSession
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = {
    import spark.implicits._
    Seq(
      // u1 completes all three inside the window
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      // u2 clicks BEFORE viewing — order violated, stays at stage 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3 completes but the purchase lands past the window → stage 2
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:10:00"), "click"),
      (3L, ts("2024-01-03 00:10:00"), "purchase"),
      // u4 never enters (no view)
      (4L, ts("2024-01-01 12:00:00"), "purchase"),
      // u5: first-touch anchor — SECOND view would convert, but the funnel
      // anchors at the FIRST view, whose window the click misses
      (5L, ts("2024-01-01 00:00:00"), "view"),
      (5L, ts("2024-01-05 00:00:00"), "view"),
      (5L, ts("2024-01-05 00:30:00"), "click"))
      .toDF("user_id", "ts", "event_type")
  }

  private val steps = Seq("view", "click", "purchase")

  test("funnel stages honor order, window anchor, and first-touch semantics") {
    val out = Funnel.funnel(events, steps, window = "48 hours").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1))
  }

  test("completion times are the earliest qualifying chain") {
    val r1 = Funnel.funnel(events, steps, window = "48 hours")
      .where(col("user_id") === 1L).head()
    assert(r1.getTimestamp(2) == ts("2024-01-01 10:00:00"))
    assert(r1.getTimestamp(3) == ts("2024-01-01 10:30:00"))
    assert(r1.getTimestamp(4) == ts("2024-01-01 11:00:00"))
    // u3's t_3 is null — purchase fell outside the anchored window
    val r3 = Funnel.funnel(events, steps, window = "48 hours")
      .where(col("user_id") === 3L).head()
    assert(r3.getTimestamp(3) != null && r3.isNullAt(4))
  }

  test("counts emits the shrinking per-step user totals") {
    val c = Funnel.counts(events, steps, window = "48 hours").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(c == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("a funnel needs at least two steps") {
    intercept[IllegalArgumentException](Funnel.funnel(events, Seq("view")))
  }

  test("retention buckets users by first-seen day and dedups multi-event days") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 09:00:00")), // day 0 twice
      (1L, ts("2024-01-03 08:00:00")), //                                  day 2
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-02 01:00:00")), // days 0,1
      (3L, ts("2024-01-02 12:00:00"))) //                                  later cohort
      .toDF("user_id", "ts")
    val out = Funnel.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // u1 (once, despite 2 events) + u2
      ("2024-01-01", 1L) -> 1L, // u2
      ("2024-01-01", 2L) -> 1L, // u1
      ("2024-01-02", 0L) -> 1L)) // u3's own cohort
  }

  test("retention offset cap drops activity past the horizon") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")),
      (1L, ts("2024-03-01 08:00:00"))) // offset 60
      .toDF("user_id", "ts")
    assert(Funnel.retention(ev, maxOffsetDays = 30).count() == 1)
    assert(Funnel.retention(ev, maxOffsetDays = 90).count() == 2)
  }

  test("activeUsers: hand-computed dau/wau, zero-filled gaps, window invariants") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 09:00:00")), // dup day
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 08:00:00")),
      (3L, ts("2024-01-10 08:00:00"))) // 6-day gap before this
      .toDF("user_id", "ts")
    val got = Funnel.activeUsers(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == 10) // full spine Jan 1..10, gaps included
    assert(got("2024-01-01") == ((2L, 2L))) // u1 deduped within the day
    assert(got("2024-01-02") == ((0L, 2L))) // zero-event day, window holds
    assert(got("2024-01-03") == ((1L, 2L)))
    // Jan 7 still covered by Jan 1 (offset 6) + Jan 3 activity
    assert(got("2024-01-07") == ((0L, 2L)))
    // Jan 8: Jan 1 aged out, Jan 3's u1 remains
    assert(got("2024-01-08") == ((0L, 1L)))
    assert(got("2024-01-10") == ((1L, 1L)))
    // invariants on real events: wau >= dau everywhere, wau <= trailing dau sum
    val real = Funnel.activeUsers(
      graft.queries.Reference.events(spark, "/root/testdata/sf0.001"))
    assert(real.where(col("wau") < col("dau")).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("ds")).rowsBetween(-6, 0)
    assert(real.withColumn("cap", sum(col("dau")).over(w))
      .where(col("wau") > col("cap")).count() == 0)
  }

  test("activeUsersApprox (HLL twin): exact on sparse sets, bounded error on real events") {
    import spark.implicits._
    // tiny corpus: DataSketches HLL is EXACT in its sparse regime, so the
    // sketch twin must reproduce the hand-computed activeUsers table
    // including the zero-filled gap days
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 08:00:00")),
      (3L, ts("2024-01-10 08:00:00")))
      .toDF("user_id", "ts")
    val exact = Funnel.activeUsers(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val approx = Funnel.activeUsersApprox(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(approx == exact)
    // real events: identical spine, relative error within the lgK=14 bound
    // (rse ~0.81%; 3% leaves headroom for union jitter) on every day
    val real = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val e = Funnel.activeUsers(real).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val a = Funnel.activeUsersApprox(real).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a.keySet == e.keySet, "approx spine differs from exact spine")
    def ok(approxV: Long, exactV: Long): Boolean =
      if (exactV == 0L) approxV == 0L
      else math.abs(approxV - exactV).toDouble / exactV <= 0.03
    e.foreach { case (ds, (dau, wau)) =>
      assert(ok(a(ds)._1, dau), s"$ds dau: approx ${a(ds)._1} vs exact $dau")
      assert(ok(a(ds)._2, wau), s"$ds wau: approx ${a(ds)._2} vs exact $wau")
    }
  }

  test("daily sketch table: mergeable, round-trips through parquet, incremental append ≡ full recompute") {
    import spark.implicits._
    val real = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    // 1. mergeability (late data): sketching two halves of the stream and
    //    unioning per day must estimate exactly like sketching it whole
    val whole = Funnel.activeUsersFromSketches(Funnel.dailyUserSketches(real))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val halves = Funnel.dailyUserSketches(real.where(col("event_id") % 2 === 0))
      .unionAll(Funnel.dailyUserSketches(real.where(col("event_id") % 2 =!= 0)))
    val merged = Funnel.activeUsersFromSketches(halves)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == whole)
    // 2. the incremental shape: a stored sketch table + ONE new day's
    //    sketch (the daily job's delta) reproduces the full-recompute curve
    val dir = java.nio.file.Files.createTempDirectory("graft_sk").toString
    val lastDay = real.agg(max(to_date(col("ts")))).head().getDate(0)
    val history = real.where(to_date(col("ts")) < lit(lastDay))
    val delta = real.where(to_date(col("ts")) === lit(lastDay))
    Funnel.dailyUserSketches(history).write.parquet(s"$dir/sk")
    Funnel.dailyUserSketches(delta).write.mode("append").parquet(s"$dir/sk")
    val incr = Funnel.activeUsersFromSketches(spark.read.parquet(s"$dir/sk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(incr == whole,
      "sketch-table append + re-derive diverged from full recompute")
  }

  test("transitionMatrix counts adjacent pairs per user with row-stochastic probs") {
    import spark.implicits._
    // u1: a→b→a ; u2: a→b — pairs: a→b ×2, b→a ×1; no cross-user pair
    val ev = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 11:00:00", "b"),
      (1L, 3L, "2024-01-01 12:00:00", "a"),
      (2L, 4L, "2024-01-02 10:00:00", "a"),
      (2L, 5L, "2024-01-02 11:00:00", "b"))
      .toDF("user_id", "event_id", "tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Funnel.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // P(to | from) conditions on OUTGOING pairs: b's only exit is b→a
    assert(got == Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0))))
    // rows sum to 1 over outgoing mass on real data
    val real = Funnel.transitionMatrix(
      graft.queries.Reference.events(spark, "/root/testdata/sf0.001"))
    val sums = real.groupBy("from_type")
      .agg(org.apache.spark.sql.functions.sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 0.01), sums.mkString(","))
  }

  test("associationRules computes hand-checked support/confidence/lift on baskets") {
    import spark.implicits._
    // baskets: u1{a,b,c} u2{a,b} u3{a} u4{b,c} — N=4; a:3 b:3 c:2;
    // {a,b}:2 {a,c}:1 {b,c}:2. Repeat (u1,a) event must not inflate counts.
    val ev = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"),
      (4L, "b"), (4L, "c"))
      .toDF("user_id", "event_type")
    val got = Funnel.associationRules(ev, minBoth = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // a→b: n=2, support 2/4=0.5, confidence 2/3=0.6667, lift 2·4/(3·3)=0.8889
    assert(got(("a", "b")) == ((2L, 0.5, 0.6667, 0.8889)))
    assert(got(("b", "a")) == ((2L, 0.5, 0.6667, 0.8889)))
    // b→c: n=2, conf 2/3, lift 2·4/(3·2)=1.3333 (positively associated)
    assert(got(("b", "c")) == ((2L, 0.5, 0.6667, 1.3333)))
    assert(got(("c", "b")) == ((2L, 0.5, 1.0, 1.3333)))
    // a→c: n=1, conf 1/3=0.3333, lift 4/(3·2)=0.6667
    assert(got(("a", "c")) == ((1L, 0.25, 0.3333, 0.6667)))
    assert(got.size == 6)
    // minBoth prunes the n=1 pairs
    val pruned = Funnel.associationRules(ev, minBoth = 2).collect()
    assert(pruned.length == 4 && pruned.forall(_.getLong(2) >= 2L))
  }

  test("associationRules is repartition-stable on real events") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Funnel.associationRules(ev).collect()
    val b = Funnel.associationRules(ev.repartition(17)).collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  private def attrEvents(rows: Seq[(Long, String, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("tss"))).drop("tss")
  }

  test("lastTouchAttribution credits the latest in-window touch per conversion") {
    val ev = attrEvents(Seq(
      // user 1: view ch=5, then click ch=7 — the LATER click wins
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0, """{"k": 5}"""),
      (2L, "2024-01-01 11:00:00", 1L, "click", 0.0, """{"k": 7}"""),
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 10.5, """{"k": 99}"""),
      // user 2: only touch is older than 48 h → unattributed (−1)
      (4L, "2024-01-01 00:00:00", 2L, "view", 0.0, """{"k": 3}"""),
      (5L, "2024-01-03 00:00:01", 2L, "purchase", 20.0, """{"k": 99}"""),
      // user 3: organic purchase, no touches at all → −1
      (6L, "2024-01-02 09:00:00", 3L, "purchase", 7.25, """{"k": 99}"""),
      // user 4: two touches at the SAME instant — max event_id (41) wins
      (40L, "2024-01-02 08:00:00", 4L, "view", 0.0, """{"k": 1}"""),
      (41L, "2024-01-02 08:00:00", 4L, "view", 0.0, """{"k": 2}"""),
      (42L, "2024-01-02 08:30:00", 4L, "purchase", 5.0, """{"k": 99}""")))
    val got = Funnel.lastTouchAttribution(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      -1L -> ((2L, 27.25)), // out-of-window + organic
      2L -> ((1L, 5.0)),    // same-ts tie → channel of max event_id
      7L -> ((1L, 10.5))))  // latest touch, not first
  }

  test("lastTouchAttribution window boundary is inclusive at exactly 48 h") {
    val ev = attrEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0, """{"k": 4}"""),
      (2L, "2024-01-03 00:00:00", 1L, "purchase", 1.0, """{"k": 9}"""), // = 48 h
      (3L, "2024-01-01 00:00:00", 2L, "view", 0.0, """{"k": 6}"""),
      (4L, "2024-01-03 00:00:01", 2L, "purchase", 1.0, """{"k": 9}"""))) // 48 h + 1 s
    val got = Funnel.lastTouchAttribution(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(4L -> 1L, -1L -> 1L))
  }

  private val H = 3600000000L // 1 hour in µs

  test("maxConcurrency: sweep-line peaks, carry-through, and flat hours") {
    import spark.implicits._
    val iv = Seq(
      ((1.1 * H).toLong, (2.2 * H).toLong),
      ((1.2 * H).toLong, (1.3 * H).toLong),
      ((1.25 * H).toLong, (3.5 * H).toLong),
      (5L * H, (5.1 * H).toLong)).toDF("s_us", "e_us")
    val got = Funnel.maxConcurrency(iv, "s_us", "e_us", bucketUs = H)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "1970-01-01 01:00:00" -> 3L, // three overlapping starts
      "1970-01-01 02:00:00" -> 2L, // only closings: peak = carried level
      "1970-01-01 03:00:00" -> 1L,
      "1970-01-01 04:00:00" -> 0L, // zero-boundary hour still reported
      "1970-01-01 05:00:00" -> 1L))
  }

  test("maxConcurrency: back-to-back half-open intervals never stack") {
    import spark.implicits._
    val iv = Seq((1L * H, 2L * H), (2L * H, 3L * H)).toDF("s_us", "e_us")
    val got = Funnel.maxConcurrency(iv, "s_us", "e_us", bucketUs = H)
      .collect().map(_.getLong(1))
    assert(got.max == 1L, got.mkString(","))
  }

  test("maxConcurrency matches an in-memory sweep on real sessions") {
    import org.apache.spark.sql.functions.unix_micros
    val sess = graft.streaming.EventStream.sessionizeBatch(
        graft.queries.Reference.events(spark, "/root/testdata/sf0.001"))
      .select(unix_micros(col("session_start")).as("s_us"),
        unix_micros(col("session_end")).as("e_us"))
    val rows = sess.collect().map(r => (r.getLong(0), r.getLong(1)))
    // third voice: single-threaded sweep with per-hour maxima
    val bounds = rows.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy(identity)
    val b0 = bounds.map(_._1 / H).min
    val b1 = bounds.map(_._1 / H).max
    var level = 0L
    val maxima = scala.collection.mutable.Map[Long, Long]()
    var bi = 0
    for (bucket <- b0 to b1) {
      var m = level // level at bucket start
      while (bi < bounds.length && bounds(bi)._1 / H == bucket) {
        level += bounds(bi)._2
        m = math.max(m, level)
        bi += 1
      }
      maxima(bucket) = m
    }
    val want = maxima.toSeq.sortBy(_._1).map(_._2)
    val got = Funnel.maxConcurrency(sess, "s_us", "e_us", bucketUs = H)
      .collect().map(_.getLong(1)).toSeq
    assert(got == want, s"buckets ${got.length} vs ${want.length}")
    // repartition stability
    val again = Funnel.maxConcurrency(sess.repartition(7), "s_us", "e_us",
      bucketUs = H).collect().map(_.getLong(1)).toSeq
    assert(again == got)
  }

  test("timeToConvert computes per-channel delta percentiles, excludes unattributed") {
    val ev = attrEvents(Seq(
      // channel 5: three conversions at 60 s, 120 s, 600 s after the touch
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0, """{"k": 5}"""),
      (2L, "2024-01-01 10:01:00", 1L, "purchase", 1.0, """{"k": 9}"""),
      (3L, "2024-01-02 10:00:00", 2L, "click", 0.0, """{"k": 5}"""),
      (4L, "2024-01-02 10:02:00", 2L, "purchase", 1.0, """{"k": 9}"""),
      (5L, "2024-01-03 10:00:00", 3L, "view", 0.0, """{"k": 5}"""),
      (6L, "2024-01-03 10:10:00", 3L, "purchase", 1.0, """{"k": 9}"""),
      // organic purchase: no touch → excluded entirely
      (7L, "2024-01-04 12:00:00", 4L, "purchase", 1.0, """{"k": 9}""")))
    val got = Funnel.timeToConvert(ev).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    // exact percentile over (60, 120, 600): p50 = 120, p90 = 504
    assert(r.getDouble(2) == 120.0, r.toString)
    assert(r.getDouble(3) == 504.0, r.toString)
  }

  test("timeToConvert is repartition-stable and consistent with attribution") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Funnel.timeToConvert(ev).collect().toSeq
    val b = Funnel.timeToConvert(ev.repartition(13)).collect().toSeq
    assert(a == b && a.nonEmpty)
    // attributed-conversion totals agree with lastTouchAttribution's
    // non-organic buckets, channel by channel
    val attr = Funnel.lastTouchAttribution(ev).collect()
      .filter(_.getLong(0) >= 0).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ttc = a.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ttc == attr)
    // deltas are within the window
    a.foreach(r => assert(r.getDouble(2) >= 0 && r.getDouble(3) <= 48 * 3600))
  }

  test("lastTouchAttribution is repartition-stable on real events") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Funnel.lastTouchAttribution(ev).collect().toSeq
    val b = Funnel.lastTouchAttribution(ev.repartition(17)).collect().toSeq
    assert(a.nonEmpty && a == b)
    // every purchase is counted exactly once across channels
    val purchases = ev.where(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(a.map(_.getLong(1)).sum == purchases)
  }
}
