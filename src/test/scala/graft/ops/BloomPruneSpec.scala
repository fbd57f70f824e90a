package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // big fact keyed 0..9999; small side keeps 2% of the key space
  private def bigSmall = {
    import spark.implicits._
    val big = (0L until 10000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = (0L until 10000L by 50L).map(i => (i, i * 2)).toDF("sk", "weight")
    (big, small)
  }

  test("prunedJoin result equals the plain inner join") {
    val (big, small) = bigSmall
    val pruned = BloomPrune.prunedJoin(big, "k", small, "sk", expectedItems = 200)
      .select("k", "payload", "weight").collect().map(_.toSeq).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "weight").collect().map(_.toSeq).toSet
    assert(pruned == plain)
    assert(pruned.size == 200)
  }

  test("left_semi variant matches, outer joins are refused") {
    val (big, small) = bigSmall
    val semi = BloomPrune.prunedJoin(big, "k", small, "sk", 200, joinType = "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(semi == (0L until 10000L by 50L).toSet)
    intercept[IllegalArgumentException](
      BloomPrune.prunedJoin(big, "k", small, "sk", 200, joinType = "left_outer"))
  }

  test("prunedJoin works when both sides use the SAME key column name") {
    import spark.implicits._
    val big = (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "payload")
    val small = (0L until 1000L by 100L).toDF("k")
    val got = BloomPrune.prunedJoin(big, "k", small, "k", expectedItems = 10)
      .select(big("k"), col("payload")).collect().map(_.getLong(0)).toSet
    assert(got == (0L until 1000L by 100L).toSet)
  }

  test("the bloom pre-filter actually prunes the big side before the join") {
    val (big, small) = bigSmall
    val bloom = BloomPrune.bloomOf(small, "sk", expectedItems = 200)
    val kept = big.where(BloomPrune.mightContain(bloom, col("k"))).count()
    // 200 true keys + fp on the other 9800 at ~3%: far below the full 10000
    assert(kept >= 200 && kept < 1500, s"kept $kept of 10000")
  }

  test("a materialized bloom is reusable across frames (cross-query filter)") {
    import spark.implicits._
    val (_, small) = bigSmall
    val bloom = BloomPrune.bloomOf(small, "sk", expectedItems = 200)
    // a different frame, later "pipeline run": same bytes still probe
    val increment = (9000L until 11000L).toDF("k")
    val kept = increment.where(BloomPrune.mightContain(bloom, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert((9000L until 10000L by 50L).toSet.subsetOf(kept))
    // keys past the build range survive only as rare false positives
    assert(kept.count(_ >= 10000L) < 200)
  }

  test("null keys never pass the probe (equi-join parity)") {
    import spark.implicits._
    val (_, small) = bigSmall
    val bloom = BloomPrune.bloomOf(small, "sk", expectedItems = 200)
    val withNulls = Seq(Some(0L), None, Some(50L), None).toDF("k")
    val kept = withNulls.where(BloomPrune.mightContain(bloom, col("k"))).count()
    assert(kept == 2)
  }

  test("bloomOf rejects nonsense sizing") {
    val (_, small) = bigSmall
    intercept[IllegalArgumentException](BloomPrune.bloomOf(small, "sk", 0))
    intercept[IllegalArgumentException](BloomPrune.bloomOf(small, "sk", 10, fpp = 1.5))
  }
}
