package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("groupedTopK equals the window-sort formulation on real data") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("g"), col("o_orderkey").as("id"),
        col("o_totalprice").as("score"))
    val viaAgg = TopK.groupedTopK(o, "g", "id", "score", 3)
      .select("g", "id", "rank")
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = o.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("g", "id", "rank")
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
  }

  test("heap discipline: ties break to the lower id, k caps the output") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 9.0),
      (2L, 20L, 1.0))
      .toDF("g", "id", "score")
    val got = TopK.groupedTopK(df, "g", "id", "score", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSet == Set((1L, 13L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }
}
