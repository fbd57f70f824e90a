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

  private def mixFrame = {
    import spark.implicits._
    (0L until 4000L).map(i => (i, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"))
      .toDF("doc_id", "src")
  }

  test("capPerGroupTop: two-phase salted cap equals the single-window form exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // lengths collide on purpose (i % 7) so the (orderCol desc, id asc)
    // tie-break is exercised across lanes
    val docs = (0L until 3000L)
      .map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", i % 7))
      .toDF("doc_id", "src", "len")
    val got = Splits.capPerGroupTop(docs, "src", k = 25, orderCol = "len",
        salts = 8)
      .select("src", "rank", "doc_id", "len")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("len").desc, col("doc_id"))
    val want = docs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 25).select("src", "rank", "doc_id", "len")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(got.toSeq == want.toSeq)
    // stable under repartition/reorder; k larger than any group keeps all
    val again = Splits.capPerGroupTop(docs.repartition(11).orderBy(rand(5)),
        "src", k = 25, orderCol = "len", salts = 8)
      .select("src", "rank", "doc_id", "len")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(again.toSeq == got.toSeq)
    assert(Splits.capPerGroupTop(docs, "src", k = 5000, orderCol = "len").count() == 3000)
    intercept[IllegalArgumentException](
      Splits.capPerGroupTop(docs, "src", 0, "len"))
  }

  test("stratifiedSampleByHash tracks per-stratum percentages, default 0 drops absent strata") {
    val out = Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 50, "de" -> 10))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 en rows at 50% and 1000 de rows at 10%; fr absent from the map → dropped
    assert(math.abs(out("en") - 500.0) / 1000 < 0.05, out.toString)
    assert(math.abs(out.getOrElse("de", 0L) - 100.0) / 1000 < 0.04, out.toString)
    assert(!out.contains("fr"), out.toString)
  }

  test("stratifiedSampleByHash is monotone: raising a weight only adds rows") {
    val small = Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 20, "de" -> 5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 60, "de" -> 30))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big), s"${(small -- big).size} rows swapped out when weights rose")
  }

  test("stratifiedSampleByHash is deterministic under repartitioning and independent of the split salt") {
    import org.apache.spark.sql.functions.rand
    val a = Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 30, "de" -> 30, "fr" -> 30))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.stratifiedSampleByHash(
        mixFrame.repartition(7).orderBy(rand(7)), "src", Map("en" -> 30, "de" -> 30, "fr" -> 30))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the 'mix' salt decorrelates sampling from the train/val/test bucket:
    // sampled ids must not be the low-bucket prefix of the split assignment
    val splitBuckets = Splits.splitByHash(mixFrame).select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lowPrefix = a.forall(id => splitBuckets(id) < 30)
    assert(!lowPrefix, "sample nested inside the split's low buckets — salts are correlated")
  }

  test("capPerGroup bounds every group, keeps small groups whole, grows monotonically") {
    val capped = Splits.capPerGroup(mixFrame, "src", k = 100)
    val sizes = capped.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en/de have 1000 rows (capped to 100); fr has 2000 (capped to 100)
    assert(sizes.values.forall(_ == 100L), sizes.toString)
    // under-cap groups pass through untouched
    assert(Splits.capPerGroup(mixFrame, "src", k = 5000).count() == 4000)
    // monotone: the k=100 keep-set is inside the k=200 keep-set
    val small = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Splits.capPerGroup(mixFrame, "src", k = 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    // deterministic under repartitioning
    import org.apache.spark.sql.functions.rand
    val again = Splits.capPerGroup(mixFrame.repartition(7).orderBy(rand(3)), "src", k = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == small)
    intercept[IllegalArgumentException](Splits.capPerGroup(mixFrame, "src", 0))
  }

  test("stratifiedSampleByHash rejects out-of-range percentages") {
    intercept[IllegalArgumentException](
      Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 101)))
    intercept[IllegalArgumentException](
      Splits.stratifiedSampleByHash(mixFrame, "src", Map("en" -> 50), defaultPct = -1))
  }

  test("weightedSampleK favors heavy rows, excludes non-positive weights, stays stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.rand
    // 500 light rows (w=1) + 50 heavy rows (w=1000) + degenerate weights
    val rows = (0L until 500L).map(i => (i, 1.0)) ++
      (500L until 550L).map(i => (i, 1000.0)) ++
      Seq((900L, 0.0), (901L, -3.0))
    val df = rows.toDF("doc_id", "w")
    val got = Splits.weightedSampleK(df, k = 50, weightCol = "w")
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    // zero/negative weights can never be selected
    assert(!ids.contains(900L) && !ids.contains(901L))
    // heavy rows are 1000× likelier: they dominate a k=50 draw from 550
    assert(ids.count(_ >= 500L) > 40, s"heavy picked ${ids.count(_ >= 500L)}")
    // deterministic under repartitioning and row order
    val again = Splits.weightedSampleK(df.repartition(7).orderBy(rand(5)),
      k = 50, weightCol = "w").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // a different salt rotates the selection
    val rotated = Splits.weightedSampleK(df, k = 50, weightCol = "w",
      salt = "other").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rotated != ids)
    intercept[IllegalArgumentException](Splits.weightedSampleK(df, 0, "w"))
  }

  test("sampleExactK is exact-size, nested, repartition-stable, and heap-planned") {
    import spark.implicits._
    import org.apache.spark.sql.functions.rand
    val ids = (0L until 5000L).toDF("doc_id")
    val s100 = Splits.sampleExactK(ids, 100)
    assert(s100.count() == 100)
    val set100 = s100.select("doc_id").collect().map(_.getLong(0)).toSet
    // monotone nesting: the 100-sample is a prefix of the 150-sample
    val set150 = Splits.sampleExactK(ids, 150).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(set100.subsetOf(set150) && set150.size == 150)
    // membership is a property of the data, not the partitioning
    val again = Splits.sampleExactK(ids.repartition(7).orderBy(rand(11)), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == set100)
    // the plan is a per-partition k-heap (TakeOrderedAndProject), never a
    // global sort — the property that keeps this runnable on 100 TB
    val plan = Splits.sampleExactK(ids, 100).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    intercept[IllegalArgumentException](Splits.sampleExactK(ids, 0))
    intercept[IllegalArgumentException](Splits.sampleExactK(ids, 200, maxK = 100))
    // null ids are excluded — they would otherwise sort FIRST (null key)
    // with partition-dependent order among themselves
    val withNulls = ids.select(
      org.apache.spark.sql.functions.when($"doc_id" < 10, null)
        .otherwise($"doc_id").as("doc_id"))
    val s = Splits.sampleExactK(withNulls, 100).select("doc_id").collect()
    assert(s.forall(!_.isNullAt(0)) && s.length == 100)
  }
}
