package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a source that IS the whole corpus diverges by exactly zero") {
    val docs = Seq(("only", "a b c a b a"), ("only", "c c b")).toDF("source", "text")
    val got = Drift.sourceTokenKl(docs, sourceCol = "source").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("only", 9L, 0.0)))
  }

  test("sourceTokenKl matches a hand-computed two-source divergence") {
    // src A: 3×x 1×y; src B: 1×x 3×y; corpus: 4×x 4×y (N=8)
    val docs = Seq(("A", "x x x y"), ("B", "x y y y")).toDF("source", "text")
    val got = Drift.sourceTokenKl(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def term(c: Long, nS: Long, ct: Long, nC: Long): Double =
      BigDecimal(c.toDouble * math.log(c.toDouble * nC / (nS.toDouble * ct)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fx(d: Double): Long = math.round(d * 1000000)
    val klA = BigDecimal((fx(term(3, 4, 4, 8)) + fx(term(1, 4, 4, 8))).toDouble
      / 1000000 / 4.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("A") == ((4L, klA)), s"got ${got("A")} want ($klA)")
    // symmetric mixture: B's divergence equals A's
    assert(got("B") == ((4L, klA)))
    assert(klA > 0)
  }

  test("psi: zero on identical halves, hand value on a planted shift") {
    // period A (day 1) and period B (day 2) with IDENTICAL bucket counts
    def ev(day: Int, v: Double, n: Int) = (1 to n).map(i =>
      (f"2024-01-0$day%d 10:$i%02d:00", v))
    val same = (ev(1, 5.0, 8) ++ ev(1, 25.0, 2) ++ ev(2, 5.0, 8) ++ ev(2, 25.0, 2))
      .toDF("tss", "value")
      .select(to_timestamp(col("tss")).as("ts"), col("value"))
    val r0 = Drift.psi(same, splitTs = "2024-01-02 00:00:00", bucketWidth = 10.0).head()
    assert((r0.getLong(0), r0.getLong(1), r0.getLong(2), r0.getDouble(3)) ==
      ((10L, 10L, 2L, 0.0)))
    // planted shift: A = 8/2 across buckets 0/2, B = 2/8 — hand PSI with
    // the 1e-6 epsilon and the 6dp + 1e-6 fixed-point conventions
    val shift = (ev(1, 5.0, 8) ++ ev(1, 25.0, 2) ++ ev(2, 5.0, 2) ++ ev(2, 25.0, 8))
      .toDF("tss", "value")
      .select(to_timestamp(col("tss")).as("ts"), col("value"))
    val r1 = Drift.psi(shift, splitTs = "2024-01-02 00:00:00", bucketWidth = 10.0).head()
    def term(pa: Double, pb: Double): Long = math.round(
      BigDecimal((pa - pb) * math.log((pa + 1e-6) / (pb + 1e-6)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000000)
    val want = BigDecimal((term(0.8, 0.2) + term(0.2, 0.8)).toDouble / 1000000)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(3) == want, s"got ${r1.getDouble(3)} want $want")
    assert(r1.getDouble(3) > 0.25, "a hard flip should cross the 'investigate' bar")
    // one-sided bucket stays finite (epsilon smoothing)
    val oneSided = (ev(1, 5.0, 5) ++ ev(2, 5.0, 4) ++ ev(2, 95.0, 1))
      .toDF("tss", "value")
      .select(to_timestamp(col("tss")).as("ts"), col("value"))
    val r2 = Drift.psi(oneSided, splitTs = "2024-01-02 00:00:00", bucketWidth = 10.0).head()
    assert(!r2.getDouble(3).isNaN && !r2.getDouble(3).isInfinite)
    assert(r2.getLong(2) == 2L)
  }

  test("dailyAnomalies flags a planted spike and withholds scores without history") {
    // 14 calm days of 10 events, then a 30-event spike on day 15
    val rows = (1 to 14).flatMap { d =>
      (1 to 10).map(i => (f"2024-03-$d%02d 12:${i}%02d:00", "click"))
    } ++ (1 to 30).map(i => (f"2024-03-15 12:${i}%02d:00", "click"))
    val ev = rows.toDF("tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.dailyAnomalies(ev, lookback = 14, minPrior = 7).collect()
      .map(r => (r.getString(0), r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double])))
    // first 7 days: no score (insufficient history)
    assert(got.take(7).forall(_._3.isEmpty), got.mkString(", "))
    // calm days 8-14 with a constant history: zero variance -> null, not ±inf
    assert(got.slice(7, 14).forall(_._3.isEmpty), got.mkString(", "))
    // the spike day has 14 prior days of exactly 10 -> still zero variance
    // history; perturb instead with one 12-event day in the middle
    val rows2 = rows ++ (11 to 12).map(i => (f"2024-03-05 13:$i%02d:00", "click"))
    val ev2 = rows2.toDF("tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got2 = Drift.dailyAnomalies(ev2, lookback = 14, minPrior = 7).collect()
      .map(r => (r.getString(0), r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSeq
    val spike = got2.find(_._1 == "2024-03-15").get
    assert(spike._2 == 30 && spike._3.exists(_ > 3.0), spike.toString)
  }

  test("dailyAnomalies is repartition-stable on real events") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Drift.dailyAnomalies(ev).collect().toSeq
    val b = Drift.dailyAnomalies(ev.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("fillDailyGaps zero-fills interior holes per series, never pads the edges") {
    import spark.implicits._
    val ev = Seq(
      ("click", "2024-03-01 10:00:00"), ("click", "2024-03-01 11:00:00"),
      ("click", "2024-03-04 09:00:00"), // 2nd+3rd missing → zero-filled
      ("view", "2024-03-02 08:00:00")) // single-day series: no padding
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.fillDailyGaps(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("click", "2024-03-01", 2L), ("click", "2024-03-02", 0L),
      ("click", "2024-03-03", 0L), ("click", "2024-03-04", 1L),
      ("view", "2024-03-02", 1L)))
  }

  test("fillDailyGaps on real events is contiguous and count-preserving") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val filled = Drift.fillDailyGaps(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(filled.map(_._3).sum == ev.count())
    // per series: exactly (last − first + 1) days, each day present once
    filled.groupBy(_._1).foreach { case (_, rows) =>
      val days = rows.map(_._2).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last))
      assert(days.length == span + 1 && days.distinct.length == days.length)
    }
  }

  test("rollingDailyMedian smooths over zero-filled days and shrugs off a spike") {
    import spark.implicits._
    // days 1-7 of 10 events, day 8 missing (zero-filled), day 9 a 90-spike
    val rows = (1 to 7).flatMap(d =>
      (1 to 10).map(i => (f"2024-03-$d%02d 12:${i}%02d:00", "click"))) ++
      (1 to 90).map(i => (f"2024-03-09 ${12 + i / 60}%02d:${i % 60}%02d:00", "click"))
    val ev = rows.toDF("tss", "event_type")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.rollingDailyMedian(ev, window = 7).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got("2024-03-08") == ((0L, 10.0)))   // zero day present, median holds
    assert(got("2024-03-09")._1 == 90L)
    assert(got("2024-03-09")._2 == 10.0, got.toString) // spike ≠ median shift
    // head of the series: shrinking frame, median of what exists
    assert(got("2024-03-01") == ((10L, 10.0)))
  }

  test("sourceJsd: 0 on identical distributions, ln 2 on disjoint vocabularies") {
    import spark.implicits._
    // a and b share one distribution; c is vocabulary-disjoint from both
    val docs = Seq(
      ("a", "x x y"), ("a", "x y y"),
      ("b", "x y x y"), ("b", "x y"),
      ("c", "q q r")).toDF("source", "text")
    val got = Drift.sourceJsd(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (na, nb, jsdAb) = got(("a", "b"))
    assert(na == 6L && nb == 6L && jsdAb == 0.0) // both are uniform {x,y}
    assert(math.abs(got(("a", "c"))._3 - math.log(2.0)) < 1e-4)
    assert(math.abs(got(("b", "c"))._3 - math.log(2.0)) < 1e-4)
  }

  test("sourceJsd is symmetric in content and repartition-stable on real documents") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.sourceJsd(docs).collect().toSeq
    val b = Drift.sourceJsd(docs.repartition(7)).collect().toSeq
    assert(a == b)
    val srcs = docs.select("source").distinct().count()
    assert(a.size == srcs * (srcs - 1) / 2)
    assert(a.forall(r => r.getDouble(4) >= 0.0 && r.getDouble(4) <= math.log(2.0) + 1e-9))
    // relabeling the two sources (swapping which is 'a') leaves the value
    val swapped = Drift.sourceJsd(docs.withColumn("source",
      when(col("source") === "src0", "zzz0").otherwise(col("source"))))
      .collect().map(r => r.getDouble(4)).sorted.toSeq
    assert(swapped == a.map(_.getDouble(4)).sorted.toSeq)
  }

  test("mixturePlan: alpha=1 is proportional; alpha<1 upweights small sources") {
    import spark.implicits._
    // source a: 9 tokens, source b: 1 token
    val docs = Seq(("a", "t t t t t t t t t"), ("b", "t")).toDF("source", "text")
    val prop = Drift.mixturePlan(docs, budgetTokens = 1000L, alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(prop("a") == ((9L, 0.9, 900L, 100.0)))
    assert(prop("b") == ((1L, 0.1, 100L, 100.0))) // proportional ⇒ equal epochs
    val temp = Drift.mixturePlan(docs, budgetTokens = 1000L, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // sqrt weighting: 3/(3+1) and 1/(3+1)
    assert(math.abs(temp("a") - 0.75) < 1e-6 && math.abs(temp("b") - 0.25) < 1e-6)
    intercept[IllegalArgumentException](Drift.mixturePlan(docs, 0L))
    intercept[IllegalArgumentException](Drift.mixturePlan(docs, 10L, alpha = 1.5))
  }

  test("mixturePlan weights sum to ~1 and is repartition-stable on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.mixturePlan(docs, budgetTokens = 5000000L).collect().toSeq
    val b = Drift.mixturePlan(docs.repartition(7), budgetTokens = 5000000L)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(math.abs(a.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    assert(math.abs(a.map(_.getLong(3)).sum - 5000000L) < a.size * 1L + 1000)
  }

  test("sourceTokenKl is repartition-stable on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.sourceTokenKl(docs).collect().toSeq
    val b = Drift.sourceTokenKl(docs.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getDouble(2) >= 0.0))
  }

  test("acf matches the hand-computed alternating series and nulls a constant one") {
    // "alt" spans 03-02..03-04, so the zero-filled grid is 2,0,2:
    // T=3, S=4; y = n·T−S = 2,−4,2; d = 24; num_1 = y2y1+y3y2 = −16
    // → r1 = round(−16/24, 4) = −0.6667; num_2 = y3y1 = 4 → r2 = 0.1667
    // (the exact-integer form of the textbook estimator). "flat": constant
    // 2/day → zero variance, d = 0 → null at every lag.
    val rows =
      Seq(("alt", "2024-03-02"), ("alt", "2024-03-02"),
          ("alt", "2024-03-04"), ("alt", "2024-03-04")) ++
      (1 to 4).flatMap(d => Seq.fill(2)(("flat", f"2024-03-0$d")))
    val ev = rows.toDF("event_type", "ds")
      .withColumn("ts", to_timestamp(concat(col("ds"), lit(" 12:00:00"))))
      .drop("ds")
    val got = Drift.acf(ev, maxLag = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSeq
    assert(got == Seq(
      ("alt", 1, 3L, Some(-0.6667)), ("alt", 2, 3L, Some(0.1667)),
      ("flat", 1, 4L, None), ("flat", 2, 4L, None)), got.mkString(", "))
  }

  test("acf lag beyond the series length yields null, not a crash") {
    val ev = Seq(("s", "2024-03-01 10:00:00"), ("s", "2024-03-02 10:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    // 2-day grid 1,1: y = 0,0 → d = 0 → null at every lag, including lag 3
    // where no pair exists at all (num is a SUM over zero rows → null·… null).
    val got = Drift.acf(ev, maxLag = 3).collect()
      .map(r => (r.getInt(1), Option(r.get(3))))
    assert(got.toSeq == Seq((1, None), (2, None), (3, None)))
    intercept[IllegalArgumentException](Drift.acf(ev, maxLag = 0))
  }

  test("vocabOverlap: hand Jaccard/containment with disjoint pairs densified") {
    val docs = Seq(("A", "x y z"), ("B", "y z w"), ("C", "q"))
      .toDF("source", "text")
    val got = Drift.vocabOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == Seq(
      ("A", "B", 3L, 3L, 2L, 0.5, 0.666667),
      ("A", "C", 3L, 1L, 0L, 0.0, 0.0),
      ("B", "C", 3L, 1L, 0L, 0.0, 0.0)), got.mkString(", "))
  }

  test("vocabOverlap is relabel-symmetric and repartition-stable on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.vocabOverlap(docs).collect().toSeq
    val b = Drift.vocabOverlap(docs.repartition(7)).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall { r =>
      val (j, c) = (r.getDouble(5), r.getDouble(6))
      j >= 0.0 && j <= c && c <= 1.0 // jaccard ≤ containment always
    })
  }

  test("logOddsTerms surfaces each source's over-represented token (hand case)") {
    // A: x x y — x appears only in A; B: y y y z — z only in B but y is
    // B's bulk. Hand z for (A, x): δ = ln((2+1)·5 / ((3−2+1)·1)) = ln 7.5,
    // σ² = 1/3 + 1, z = 1.745; for (B, y): δ = ln(4·3/(2·2)) = ln 3,
    // σ² = 1/4 + 1/2, z = 1.2686.
    val docs = Seq(("A", "x x y"), ("B", "y y y z")).toDF("source", "text")
    val got = Drift.logOddsTerms(docs, topK = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("A", "x", 2L, 1.745, 1L), ("B", "y", 3L, 1.2686, 1L)),
      got.mkString(", "))
    intercept[IllegalArgumentException](Drift.logOddsTerms(docs, topK = 0))
  }

  test("logOddsTerms is repartition-stable and caps at topK on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.logOddsTerms(docs, topK = 5).collect().toSeq
    val b = Drift.logOddsTerms(docs.repartition(7), topK = 5).collect().toSeq
    assert(a == b && a.nonEmpty)
    val bySrc = a.groupBy(_.getString(0))
    assert(bySrc.values.forall(rs => rs.size <= 5 &&
      rs.map(_.getLong(4)).sorted == (1L to rs.size).toSeq))
  }

  test("changePoint locates a planted level shift with exact before/after means") {
    // "shift": 1,1,1,9,9,9 per day → T=6, S=30; gap = |cumx·6 − t·30| peaks
    // at t=3 (72) — the last old-regime day; strength = 72/180 = 0.4;
    // means 1.0 / 9.0. "mono": single day → gap 0, strength 0, after null.
    val rows =
      (1 to 6).flatMap { d =>
        val k = if (d <= 3) 1 else 9
        (1 to k).map(i => ("shift", f"2024-03-0$d 10:$i%02d:00"))
      } :+ (("mono", "2024-03-01 10:00:00"))
    val ev = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.changePoint(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      ("mono", "2024-03-01", 1L, 0.0, 1.0, None),
      ("shift", "2024-03-03", 6L, 0.4, 1.0, Some(9.0))), got.mkString(", "))
  }

  test("changePoint on a uniform series ties to the earliest day") {
    // constant 2/day over 4 days: every gap is 0 → argmax tie → day 1;
    // mean_before = mean_after = 2
    val ev = (1 to 4).flatMap(d =>
      Seq.fill(2)(("flat", f"2024-03-0$d 10:00:00")))
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val r = Drift.changePoint(ev).collect().head
    assert((r.getString(1), r.getDouble(3), r.getDouble(4),
      r.get(5).asInstanceOf[Double]) == (("2024-03-01", 0.0, 2.0, 2.0)))
  }

  test("changePoint is repartition-stable on real events") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Drift.changePoint(ev).collect().toSeq
    val b = Drift.changePoint(ev.repartition(7)).collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0))
  }

  test("crossCorr finds the planted one-day lead with hand-exact values") {
    // B spikes on day 2, A on day 3 (B leads A by 1). Spine days 1-4:
    // ya = −4,−4,12,−4; yb = −4,12,−4,−4; da = db = 192;
    // r₊₁ = 176/192 = 0.9167, r₀ = −64/192 = −0.3333, r₋₁ = −80/192 = −0.4167.
    val rows =
      (1 to 4).flatMap { d =>
        val ka = if (d == 3) 5 else 1
        val kb = if (d == 2) 5 else 1
        (1 to ka).map(i => ("A", f"2024-03-0$d 10:$i%02d:00")) ++
          (1 to kb).map(i => ("B", f"2024-03-0$d 11:$i%02d:00"))
      }
    val ev = rows.toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.crossCorr(ev, "A", "B", maxLag = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (-1, 4L, Some(-0.4167)), (0, 4L, Some(-0.3333)), (1, 4L, Some(0.9167))),
      got.mkString(", "))
  }

  test("crossCorr: absent series → all-null ccf; empty input → zero rows") {
    val ev = Seq(("A", "2024-03-01 10:00:00"), ("A", "2024-03-02 10:00:00"),
      ("A", "2024-03-02 11:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.crossCorr(ev, "A", "ZZZ", maxLag = 2).collect()
    assert(got.length == 5 && got.forall(r => r.isNullAt(2)))
    assert(got.forall(_.getLong(1) == 2L))
    val none = Drift.crossCorr(ev, "X", "ZZZ", maxLag = 2).collect()
    assert(none.isEmpty)
    intercept[IllegalArgumentException](Drift.crossCorr(ev, "A", "B", maxLag = 0))
  }

  test("crossCorr is repartition-stable on real events and bounded") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Drift.crossCorr(ev, "click", "purchase").collect().toSeq
    val b = Drift.crossCorr(ev.repartition(7), "click", "purchase").collect().toSeq
    assert(a == b && a.size == 15)
    val vals = a.flatMap(r => Option(r.get(2)).map(_.asInstanceOf[Double]))
    assert(vals.nonEmpty && vals.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("acf is repartition-stable on real events and bounded in [-1, 1]") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Drift.acf(ev).collect().toSeq
    val b = Drift.acf(ev.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    val scores = a.flatMap(r => Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(scores.nonEmpty && scores.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("ewmaDaily: hand weights over zero-filled days with adjusted head") {
    import spark.implicits._
    // click days: [4, 0(fill), 0(fill), 2] — window 2 → weights (2, 1)
    val ev = Seq(
      ("click", "2024-03-01 10:00:00"), ("click", "2024-03-01 11:00:00"),
      ("click", "2024-03-01 12:00:00"), ("click", "2024-03-01 13:00:00"),
      ("click", "2024-03-04 09:00:00"), ("click", "2024-03-04 10:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val got = Drift.ewmaDaily(ev, window = 2).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 4L, 4.0),     // head: only its own weight → plain n
      ("2024-03-02", 0L, 1.3333),  // (0·2 + 4·1) / 3
      ("2024-03-03", 0L, 0.0),
      ("2024-03-04", 2L, 1.3333)))
  }

  test("ewmaDaily: window 1 is the identity; a constant series stays constant") {
    import spark.implicits._
    val ev = Seq(
      ("a", "2024-03-01 10:00:00"), ("a", "2024-03-02 10:00:00"),
      ("a", "2024-03-03 10:00:00"))
      .toDF("event_type", "tss")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val w1 = Drift.ewmaDaily(ev, window = 1).collect()
    assert(w1.forall(r => r.getDouble(3) == r.getLong(2).toDouble))
    // window 3 on the constant series: adjusted head keeps ewma ≡ 1
    val w3 = Drift.ewmaDaily(ev, window = 3).collect()
    assert(w3.length == 3 && w3.forall(_.getDouble(3) == 1.0))
  }

  test("ewmaDaily is repartition-stable on real events") {
    val ev = graft.queries.Reference.events(spark, "/root/testdata/sf0.001")
    val a = Drift.ewmaDaily(ev).collect().toSeq
    val b = Drift.ewmaDaily(ev.repartition(11)).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("sourceEntropy: uniform = ln k, single-type = 0, template < diverse") {
    import spark.implicits._
    val docs = Seq(
      // uniform over 4 types → H = ln 4, norm = 1
      ("u", "alpha beta gamma delta"),
      // one type repeated → H = 0, norm null
      ("mono", "spam spam spam spam spam"),
      // skewed: one dominant type among 3
      ("skew", "the the the the the the the the cat dog")).toDF("source", "text")
    val got = Drift.sourceEntropy(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    val ln4 = BigDecimal(math.log(4.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("u") == ((4L, 4L, ln4, Some(1.0))))
    assert(got("mono") == ((5L, 1L, 0.0, None)))
    val (nTok, nTyp, h, norm) = got("skew")
    assert(nTok == 10L && nTyp == 3L)
    // H for (8,1,1)/10 = ln10 − (8·ln8)/10 ≈ 0.6390
    val want = BigDecimal(math.log(10.0) -
        (8 * math.round(math.log(8.0) * 1e6) / 1e6) / 10.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h == want, s"$h vs $want")
    assert(norm.exists(v => v > 0 && v < 1))
    assert(got("u")._3 > got("skew")._3) // diversity orders as expected
  }

  test("sourceEntropy is case-normalizing and repartition-stable on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.sourceEntropy(docs).collect().toSeq
    val b = Drift.sourceEntropy(docs.repartition(13)).collect().toSeq
    assert(a.nonEmpty && a == b)
    assert(a.forall(r => r.getDouble(3) >= 0.0))
    import spark.implicits._
    val cased = Seq(("s", "Word word WORD")).toDF("source", "text")
    val r = Drift.sourceEntropy(cased).collect().head
    assert(r.getLong(2) == 1L && r.getDouble(3) == 0.0)
  }
}
