package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def oldDf = Seq(
    (1L, "alpha", 10), (2L, "beta", 20), (3L, "gamma", 30), (4L, "delta", 40))
    .toDF("id", "name", "score")

  test("diffByKey classifies added/removed/changed and drops unchanged") {
    val newDf = Seq(
      (1L, "alpha", 10),   // unchanged
      (2L, "beta", 99),    // changed
      (4L, "DELTA", 40),   // changed
      (5L, "epsilon", 50)) // added; id 3 removed
      .toDF("id", "name", "score")
    val got = Diff.diffByKey(oldDf, newDf, Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed"), (3L, "removed"), (4L, "changed"),
      (5L, "added")))
    val all = Diff.diffByKey(oldDf, newDf, Seq("id"), includeUnchanged = true)
    assert(all.where(col("status") === "unchanged").count() == 1)
    val s = Diff.diffSummary(all).collect().head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == ((1L, 1L, 2L, 1L)))
  }

  test("diffByKey compares shared columns order-insensitively and ignores extras") {
    // new side: reordered schema + an extra column not present in old
    val newDf = Seq((1L, 10, "alpha", "x"), (2L, 20, "CHANGED", "y"))
      .toDF("id", "score", "name", "extra")
    val got = Diff.diffByKey(oldDf.where(col("id") <= 2), newDf, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "changed")))
  }

  test("diffByKey handles null compare values") {
    val o = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, None: Option[String]))
      .toDF("id", "name")
    val n = Seq((1L, None: Option[String]), (2L, None: Option[String]), (3L, Some("c")))
      .toDF("id", "name")
    val got = Diff.diffByKey(o, n, Seq("id"), includeUnchanged = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "changed"), (2L, "unchanged"), (3L, "changed")))
  }

  test("diff shuffles fingerprints, not row bodies, and is repartition-stable") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newDocs = docs.where(col("doc_id") % 3 =!= 0)
    val a = Diff.diffByKey(docs, newDocs, Seq("doc_id")).collect()
    val b = Diff.diffByKey(docs.repartition(7), newDocs.repartition(5),
      Seq("doc_id")).collect()
    assert(a.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ==
      b.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
    assert(a.forall(_.getString(1) == "removed") && a.nonEmpty)
    // the exchanges must carry (key, 8-byte hash) — if a text column reaches
    // a shuffle, the at-scale payload contract is broken
    val plan = Diff.diffByKey(docs, newDocs, Seq("doc_id"))
      .queryExecution.executedPlan.toString
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    assert(exchangeLines.forall(!_.contains("text")), s"row bodies in shuffle:\n$plan")
  }
}
