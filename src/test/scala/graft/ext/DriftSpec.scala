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

  test("sourceTokenKl is repartition-stable on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Drift.sourceTokenKl(docs).collect().toSeq
    val b = Drift.sourceTokenKl(docs.repartition(7)).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(_.getDouble(2) >= 0.0))
  }
}
