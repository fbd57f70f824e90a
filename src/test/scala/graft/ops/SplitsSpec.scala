package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SplitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("splitByHash is deterministic and partitioning-independent") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("doc_id")
    val a = Splits.splitByHash(ids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // same ids, different partitioning and row order → identical assignment
    val b = Splits.splitByHash(ids.repartition(7).orderBy(rand(42))).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(a == b)
    assert(a.values.forall { case (bk, _) => bk >= 0 && bk < 100 })
    // bucket→split boundaries honored exactly
    a.values.foreach { case (bk, s) =>
      val expect = if (bk < 80) "train" else if (bk < 90) "val" else "test"
      assert(s == expect, s"bucket $bk -> $s")
    }
  }

  test("splitByHash distribution tracks the requested percentages") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("doc_id")
    val counts = Splits.splitByHash(ids).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000.0) / 10000 < 0.02, counts.toString)
    assert(math.abs(counts("val") - 1000.0) / 10000 < 0.01, counts.toString)
    assert(math.abs(counts("test") - 1000.0) / 10000 < 0.01, counts.toString)
  }

  test("salt rotates the assignment without changing the distribution shape") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("doc_id")
    val plain = Splits.splitByHash(ids).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val salted = Splits.splitByHash(ids, salt = "exp42").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // a different salt must move a substantial fraction of ids between splits
    val moved = plain.count { case (id, s) => salted(id) != s }
    assert(moved > 200, s"only $moved ids moved")
    assert(Splits.splitByHash(ids, salt = "exp42").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap == salted)
  }

  test("splitByHash rejects invalid percentages") {
    import spark.implicits._
    val ids = Seq(1L).toDF("doc_id")
    intercept[IllegalArgumentException](Splits.splitByHash(ids, trainPct = 0))
    intercept[IllegalArgumentException](Splits.splitByHash(ids, trainPct = 95, valPct = 10))
  }
}
