package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("winsorize clips exactly to the 4dp-rounded percentile bounds") {
    import spark.implicits._
    // values 1..100 → p05 = 5.95, p95 = 95.05 under the interpolated
    // (continuous) definition: pos = p·(n−1), lo + frac·(hi−lo)
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Normalize.winsorize(df, "v", pLow = 0.05, pHigh = 0.95)
      .orderBy("v").collect().map(r => r.getDouble(0) -> r.getDouble(1))
    assert(out.length == 100)
    assert(out.filter(_._1 <= 5).forall(_._2 == 5.95), out.take(8).mkString(","))
    assert(out.filter(_._1 >= 96).forall(_._2 == 95.05))
    // interior values pass through untouched
    assert(out.filter(p => p._1 > 5.95 && p._1 < 95.05).forall(p => p._1 == p._2))
  }

  test("nulls pass through and row count is preserved") {
    import spark.implicits._
    val df = Seq[Option[Double]](Some(1.0), None, Some(50.0), Some(1e12))
      .toDF("v")
    val out = Normalize.winsorize(df, "v", pLow = 0.0, pHigh = 0.5)
    assert(out.count() == 4)
    assert(out.where(col("v").isNull).select(col("v_w")).collect()
      .forall(_.isNullAt(0)))
    // the 1e12 outlier lands on the median bound (p50 of [1, 50, 1e12] = 50)
    assert(out.where(col("v") === 1e12).head().getDouble(1) == 50.0)
  }

  test("approx bounds track exact bounds on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ex = Normalize.clipBounds(li, "l_extendedprice", 0.05, 0.95).head()
    val ap = Normalize.clipBounds(li, "l_extendedprice", 0.05, 0.95, exact = false).head()
    // GK sketch at default accuracy: rank error ≤ 1e-4 of n — bounds land
    // within a fraction of a percent of the exact percentile on this column
    assert(math.abs(ex.getDouble(0) - ap.getDouble(0)) / ex.getDouble(0) < 0.01,
      s"exact=$ex approx=$ap")
    assert(math.abs(ex.getDouble(1) - ap.getDouble(1)) / ex.getDouble(1) < 0.01)
  }

  test("quantileBuckets assigns quartiles with upper-bucket ties and null passthrough") {
    import spark.implicits._
    // 1..8 → cuts at p25/p50/p75 of the continuous definition:
    // 2.75, 4.5, 6.25 → buckets {1,2}=0 {3,4}=1 {5,6}=2 {7,8}=3
    val df = ((1 to 8).map(i => Some(i.toDouble)) :+ None).toDF("v")
    val got = Normalize.quantileBuckets(df, "v", k = 4).collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]) ->
        Option(r.get(1)).map(_.asInstanceOf[Int])).toMap
    assert(got(Some(1.0)) == Some(0) && got(Some(2.0)) == Some(0))
    assert(got(Some(3.0)) == Some(1) && got(Some(4.0)) == Some(1))
    assert(got(Some(5.0)) == Some(2) && got(Some(6.0)) == Some(2))
    assert(got(Some(7.0)) == Some(3) && got(Some(8.0)) == Some(3))
    assert(got(None).isEmpty)
    // a value exactly AT a cut lands in the upper bucket
    val tied = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val t2 = Normalize.quantileBuckets(tied, "v", k = 2).collect()
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    // p50 of 1..4 = 2.5 → {1,2}=0, {3,4}=1
    assert(t2 == Map(1.0 -> 0, 2.0 -> 0, 3.0 -> 1, 4.0 -> 1))
    intercept[IllegalArgumentException](Normalize.quantileBuckets(tied, "v", 1))
  }

  test("invalid probability ranges are refused") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException](Normalize.winsorize(df, "v", 0.9, 0.1))
    intercept[IllegalArgumentException](Normalize.winsorize(df, "v", -0.1, 0.5))
  }

  test("zScoreBy normalizes within each group and guards degenerate cases") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),       // mean 2, popσ = √(2/3)
      ("b", 10.0), ("b", 30.0),                 // mean 20, popσ = 10
      ("c", 5.0), ("c", 5.0))                   // zero variance → null z
      .toDF("g", "v")
      .unionByName(Seq(("d", Option.empty[Double])).toDF("g", "v"))
    val got = Normalize.zScoreBy(df, "v", "g").collect()
      .map(r => (r.getString(0), Option(r.get(1)).map(_.asInstanceOf[Double])) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    def want(x: Double, m: Double, sd: Double): Double =
      BigDecimal((x - m) / sd).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sdA = math.sqrt(2.0 / 3.0)
    assert(got(("a", Some(1.0))) == Some(want(1.0, 2.0, sdA)))
    assert(got(("a", Some(2.0))) == Some(0.0))
    assert(got(("b", Some(10.0))) == Some(-1.0))
    assert(got(("b", Some(30.0))) == Some(1.0))
    assert(got(("c", Some(5.0))).isEmpty)  // zero variance
    assert(got(("d", None)).isEmpty)       // null value
    // per-group means: the z of each group sums to ~0
    val grouped = Normalize.zScoreBy(df, "v", "g")
    val sums = grouped.groupBy("g")
      .agg(org.apache.spark.sql.functions.sum("v_z")).collect()
      .flatMap(r => Option(r.get(1)).map(v => math.abs(v.asInstanceOf[Double])))
    assert(sums.forall(_ < 1e-3))
  }

  test("zScoreBy is repartition-stable on real lineitem") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Normalize.zScoreBy(df, "l_extendedprice", "l_returnflag")
        .select("l_orderkey", "l_linenumber", "l_extendedprice_z")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice_z")
        .collect().toSeq
    assert(run(li) == run(li.repartition(7)) && run(li).nonEmpty)
  }

  test("madOutliers flags exactly the planted far points") {
    import spark.implicits._
    // 20 values near 10 (median 10, mad small) + two far outliers
    val base = (1 to 20).map(i => 10.0 + (i % 5 - 2) * 0.1) // 9.8..10.2
    val df = (base ++ Seq(100.0, -50.0)).toDF("v")
    val r = Normalize.madOutliers(df, "v").head()
    assert(r.getLong(0) == 22L)
    assert(r.getDouble(1) == 10.0)          // median
    assert(r.getDouble(2) == 0.1)           // mad
    assert(r.getLong(3) == 2L, r.toString)  // the two planted points
    // degenerate: >50% identical → mad 0, every deviating row flags
    val deg = (Seq.fill(10)(5.0) ++ Seq(5.1, 6.0)).toDF("v")
    val d = Normalize.madOutliers(deg, "v").head()
    assert(d.getDouble(2) == 0.0 && d.getLong(3) == 2L)
    intercept[IllegalArgumentException](Normalize.madOutliers(df, "v", k = 0))
  }
}
