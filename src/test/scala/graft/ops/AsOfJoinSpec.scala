package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward attaches the latest right payload at or before each left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:01:00"), 101.0),
      (1L, ts("2024-01-01 09:00:00"), 99.0), // before any quote
      (2L, ts("2024-01-01 10:00:30"), 50.0))
      .toDF("sym", "trade_ts", "trade_px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:05"), 11.0), // exactly at a trade ts -> matches
      (1L, ts("2024-01-01 10:02:00"), 12.0), // after all trades
      (2L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("sym", "quote_ts", "bid")
    val got = AsOfJoin.asofBackward(trades, quotes,
        key = "sym", leftTime = "trade_ts", rightTime = "quote_ts",
        payloadCols = Seq("bid"))
      .select(col("sym"), col("trade_px"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 100.0)).contains(11.0)) // equal-time quote matches
    assert(got((1L, 101.0)).contains(11.0)) // latest before 10:01
    assert(got((1L, 99.0)).isEmpty) // nothing before 09:00
    assert(got((2L, 50.0)).contains(20.0))
  }

  test("asofForward attaches the earliest right payload at or after each left time") {
    import spark.implicits._
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:01:00"), 101.0),
      (1L, ts("2024-01-01 11:00:00"), 102.0), // after every quote
      (2L, ts("2024-01-01 09:59:00"), 50.0))
      .toDF("sym", "trade_ts", "trade_px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:05"), 11.0), // exactly at a trade ts -> matches
      (1L, ts("2024-01-01 10:02:00"), 12.0),
      (2L, ts("2024-01-01 10:00:00"), 20.0))
      .toDF("sym", "quote_ts", "bid")
    val got = AsOfJoin.asofForward(trades, quotes,
        key = "sym", leftTime = "trade_ts", rightTime = "quote_ts",
        payloadCols = Seq("bid"))
      .select(col("sym"), col("trade_px"), col("bid"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)) -> Option(r.get(2))).toMap
    assert(got((1L, 100.0)).contains(11.0)) // equal-time quote matches forward too
    assert(got((1L, 101.0)).contains(12.0)) // next quote after 10:01
    assert(got((1L, 102.0)).isEmpty)        // nothing after 11:00
    assert(got((2L, 50.0)).contains(20.0))
    // forward tolerance: the 10:02 quote is 60s after the 10:01 trade
    val tight = AsOfJoin.asofForward(trades, quotes, "sym", "trade_ts", "quote_ts",
        Seq("bid"), toleranceSeconds = Some(30))
      .select(col("trade_px"), col("bid"))
      .collect().map(r => r.getDouble(0) -> Option(r.get(1))).toMap
    assert(tight(101.0).isEmpty && tight(100.0).contains(11.0))
  }

  test("tolerance voids stale matches") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "lt", "v")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("k", "rt", "p")
    val fresh = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("p"),
      toleranceSeconds = Some(3 * 3600)).head()
    val stale = AsOfJoin.asofBackward(l, r, "k", "lt", "rt", Seq("p"),
      toleranceSeconds = Some(3600)).head()
    assert(fresh.getAs[Any]("p") == 7.0)
    assert(stale.getAs[Any]("p") == null)
  }

  test("rangeJoinBinned equals the naive theta join") {
    import spark.implicits._
    val points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "x")
    val intervals = Seq(
      (10L, 0L, 100L), (11L, 50L, 60L), (12L, 500L, 1000L), (13L, 990L, 995L))
      .toDF("iid", "lo", "hi")
    val naive = points.crossJoin(intervals)
      .where(col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid")
    val binned = AsOfJoin.rangeJoinBinned(points, intervals, "x", "lo", "hi", binWidth = 64)
      .select("pid", "iid")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
  }

  test("intervalOverlapBinned equals the naive theta join, exactly once per pair") {
    import spark.implicits._
    // spans crossing many bins, nested, touching, and disjoint intervals
    val left = Seq(
      (1L, 0L, 1000L), (2L, 100L, 110L), (3L, 500L, 505L), (4L, 2000L, 2100L))
      .toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 50L, 600L), (11L, 990L, 1500L), (12L, 1000L, 1100L),
      (13L, 109L, 2050L), (14L, 3000L, 3001L))
      .toDF("rid", "rs", "re")
    val naive = left.crossJoin(right)
      .where(col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid")
    for (w <- Seq(16L, 64L, 1024L)) {
      val binned = AsOfJoin.intervalOverlapBinned(
        left, right, "ls", "le", "rs", "re", binWidth = w).select("lid", "rid")
      // exceptAll both ways + count: same MULTISET, so a pair crossing
      // several shared bins was emitted exactly once
      assert(binned.count() == naive.count(), s"binWidth=$w")
      assert(binned.exceptAll(naive).count() == 0, s"binWidth=$w")
      assert(naive.exceptAll(binned).count() == 0, s"binWidth=$w")
    }
    // half-open: touching intervals [0,1000) and [1000,1100) do NOT overlap
    assert(naive.where(col("lid") === 1L && col("rid") === 12L).count() == 0)
    // column-collision guard
    intercept[IllegalArgumentException] {
      AsOfJoin.intervalOverlapBinned(left, left, "ls", "le", "ls", "le", 16L)
    }
  }
}
