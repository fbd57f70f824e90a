package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Three well-separated direction clusters in R^4, each with a base
    * vector, an exact copy, and a slight perturbation (cosine ≈ 0.999);
    * plus one orthogonal outlier.
    */
  private def planted = {
    import spark.implicits._
    Seq(
      (10L, Seq(1.0, 0.0, 0.0, 0.0)),
      (11L, Seq(1.0, 0.0, 0.0, 0.0)),   // exact copy of 10
      (12L, Seq(1.0, 0.02, 0.0, 0.0)),  // near copy of 10
      (20L, Seq(0.0, 1.0, 0.0, 0.0)),
      (21L, Seq(0.0, 1.0, 0.0, 0.0)),   // exact copy of 20
      (30L, Seq(0.0, 0.0, 1.0, 0.0)),
      (31L, Seq(0.0, 0.0, 1.0, 0.02)),  // near copy of 30
      (99L, Seq(0.5, 0.5, 0.5, 0.5))    // equidistant outlier
    ).toDF("vec_id", "embedding")
  }

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("nClusters=1 is exhaustive: pairs == brute-force all-pairs at the threshold") {
    val got = collectPairs(Similarity.semDedupPairs(planted, nClusters = 1, minCosine = 0.99))
    val brute = collectPairs(
      Similarity.allPairsTopK(planted, k = 10)
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .where(col("cosine") >= 0.99))
    assert(got == brute)
    // the planted structure itself
    assert(got.map(p => (p._1, p._2)) ==
      Set((10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L), (30L, 31L)))
  }

  test("clustered pairs are a subset of exhaustive pairs and keep exact copies") {
    val exhaustive = collectPairs(Similarity.semDedupPairs(planted, nClusters = 1, minCosine = 0.99))
    val clustered = collectPairs(Similarity.semDedupPairs(planted, nClusters = 3, minCosine = 0.99))
    assert(clustered.subsetOf(exhaustive))
    // exact copies always share a cell — they can never be lost to clustering
    assert(clustered.exists(p => p._1 == 10L && p._2 == 11L && p._3 == 1.0))
    assert(clustered.exists(p => p._1 == 20L && p._2 == 21L && p._3 == 1.0))
  }

  test("semDedupRows keeps the min id per duplicate group") {
    val rows = Similarity.semDedupRows(planted, nClusters = 1, minCosine = 0.99)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // {10,11,12} -> 10, {20,21} -> 20, {30,31} -> 30, 99 untouched
    assert(rows == Set(10L, 20L, 30L, 99L))
  }

  test("rerun on the same frame is identical (seeded k-means)") {
    val a = collectPairs(Similarity.semDedupPairs(planted, nClusters = 3, minCosine = 0.99))
    val b = collectPairs(Similarity.semDedupPairs(planted, nClusters = 3, minCosine = 0.99))
    assert(a == b)
  }

  test("empty input yields an empty pair frame, not a failed fit") {
    val empty = planted.where(lit(false))
    assert(Similarity.semDedupPairs(empty).count() == 0)
  }

  test("doubled real embeddings: exactly one cosine-1.0 pair per vector (the e31 contract)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val doubled = e.unionAll(e.withColumn("vec_id", col("vec_id") + 100000L))
    val n = e.count()
    val got = Similarity.semDedupPairs(doubled, nClusters = 16, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == n)
    assert(got.forall(p => p._2 == p._1 + 100000L && p._3 == 1.0))
  }
}
