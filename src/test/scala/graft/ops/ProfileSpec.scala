package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("profile computes per-column counts, nulls, distincts, min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, Some(1.0), None),
      (3L, None, Some("a")),
      (4L, Some(2.5), Some("a"))
    ).toDF("id", "x", "s")

    val p = Profile.profile(df, Seq("id", "s", "x")).collect()
    assert(p.map(_.getString(0)).toSeq == Seq("id", "s", "x")) // ordered

    val byName = p.map(r => r.getString(0) -> r).toMap
    val id = byName("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 0 && id.getLong(3) == 4)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 4.0)
    assert(id.getString(6) == "1" && id.getString(7) == "4")

    val x = byName("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.5)

    val s = byName("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric: no numeric min/max
    assert(s.getString(6) == "a" && s.getString(7) == "b")
  }

  test("profile is ONE aggregation job (single scan), and the approx form skips Expand") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 7)).toDF("a", "b")
    val exact = Profile.profile(df, Seq("a", "b"))
    val plan = exact.queryExecution.executedPlan.toString
    // exact multi-distinct plans one Expand feeding one aggregate chain —
    // the input is scanned once no matter how many columns are profiled
    assert(plan.contains("Expand"))
    assert("LocalTableScan|Scan".r.findAllIn(plan).size >= 1)

    val approx = Profile.profile(df, Seq("a", "b"), exactDistinct = false)
    val aplan = approx.queryExecution.executedPlan.toString
    assert(!aplan.contains("Expand"), "approx profile should not Expand")
    // approx distinct still lands within HLL++ default error (~5%)
    val row = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(row("a") - 100L) <= 5 && math.abs(row("b") - 7L) <= 1)
  }

  test("histogram bins span [min,max], keep zero bins, and bound the edges") {
    import spark.implicits._
    // 0..10 over 5 bins of width 2: value 10 (the max) joins the last bin
    val df = ((0 to 10).map(_.toDouble) :+ 4.5).toDF("v")
    val got = Profile.histogram(df, "v", bins = 5).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, 0.0, 2.0, 2L), (1, 2.0, 4.0, 2L), (2, 4.0, 6.0, 3L),
      (3, 6.0, 8.0, 2L), (4, 8.0, 10.0, 3L)))
    // a hole in the data still yields its bin, with n = 0
    val sparse = Seq(0.0, 10.0).toDF("v")
    val s = Profile.histogram(sparse, "v", bins = 5).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(s == Map(0 -> 1L, 1 -> 0L, 2 -> 0L, 3 -> 0L, 4 -> 1L))
    // degenerate range: everything in bin 0
    val const = Seq(7.0, 7.0, 7.0).toDF("v")
    val c = Profile.histogram(const, "v", bins = 4).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(c(0) == 3L && c.values.sum == 3L)
    intercept[IllegalArgumentException](Profile.histogram(df, "v", 0))
  }

  test("profile refuses unknown columns") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("a", "b")
    val e = intercept[IllegalArgumentException](Profile.profile(df, Seq("a", "nope")))
    assert(e.getMessage.contains("nope"))
  }
}
