package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates (HLL distinct, quantile sketches): no DuckDB
  * oracle (different sketch algorithms give different estimates), so the
  * contract tested here is error-bounded agreement with the exact answer.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct lands within its standard-error bound") {
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }
}
