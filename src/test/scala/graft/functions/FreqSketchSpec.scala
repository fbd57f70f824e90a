package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // skewed corpus: item "t<i>" appears (101-i) times, i = 1..100
  private def corpus = {
    import spark.implicits._
    (1 to 100).flatMap(i => Seq.fill(101 - i)(s"t$i")).toDF("w")
  }

  test("capacity >= distinct: counts are exact and repartition-stable") {
    val exact = corpus.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(corpus, corpus.repartition(13), corpus.orderBy(rand(7))).foreach { d =>
      val got = FreqSketch.heavyHitters(d, "w", capacity = 128).collect()
      assert(got.length == 100)
      got.foreach { r =>
        assert(r.getLong(1) == exact(r.getString(0)), r.getString(0))
        assert(r.getLong(2) == 0L) // exact regime: zero error budget
      }
    }
    // output is totally ordered: est desc, then item
    val rows = FreqSketch.heavyHitters(corpus, "w", 128).collect()
      .map(r => (r.getLong(1), r.getString(0)))
    assert(rows.sameElements(rows.sortBy { case (est, it) => (-est, it) }))
  }

  test("capacity < distinct: MG guarantee holds under adversarial partitioning") {
    import spark.implicits._
    // two genuine heavy hitters above N/(cap+1), plus a 100-item tail
    val skewed = (Seq.fill(3000)("big") ++ Seq.fill(1500)("mid") ++
      (1 to 100).flatMap(i => Seq.fill(20)(s"t$i"))).toDF("w")
    val n = skewed.count() // 6500
    val cap = 9
    val exact = skewed.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(skewed, skewed.repartition(17), skewed.orderBy(col("w").desc)).foreach { d =>
      val got = FreqSketch.heavyHitters(d, "w", cap).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got.size <= cap)
      val bound = got.headOption.map(_._3).getOrElse(0L)
      assert(bound <= n / (cap + 1))
      got.foreach { case (item, est, b) =>
        assert(est <= exact(item), s"$item overcounted")
        assert(exact(item) - est <= b, s"$item undercount exceeds reported bound")
        assert(b == bound) // single global budget
      }
      // every item with true frequency > N/(cap+1) MUST survive
      val mustSurvive = exact.filter(_._2 > n / (cap + 1)).keySet
      val surviving = got.map(_._1).toSet
      assert(mustSurvive.subsetOf(surviving),
        s"missing heavy hitters: ${mustSurvive -- surviving}")
    }
  }

  test("partial sketches merge: plan shows partial+final objecthash aggregation") {
    val df = FreqSketch.heavyHitters(corpus.repartition(8), "w", 16)
    val plan = df.queryExecution.executedPlan.toString
    // typed Aggregator over objects → ObjectHashAggregate, two phases
    assert(plan.contains("ObjectHashAggregate"))
    assert(df.collect().nonEmpty)
  }
}
