package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f)),
      (4L, Array(0.7f, 0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
  }

  test("cosine column matches hand computation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).head().getDouble(0)
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with id tiebreak and excludes the query") {
    val got = Similarity.bruteForceTopK(emb, queryId = 0L, k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 4L, 2L)) // 0.9939 > 0.7071 > 0.0
  }

  test("allPairsTopK returns k neighbors per id, best first") {
    val got = Similarity.allPairsTopK(emb, k = 2)
    assert(got.groupBy("id_a").count().collect().forall(_.getLong(1) == 2))
    val row0 = got.where(col("id_a") === 0 && col("rank") === 1).head()
    assert(row0.getLong(1) == 1L)
  }

  test("ivfTopK recalls the exact top-k on the real embeddings table") {
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(real, queryId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(real, queryId = 0L, k = 5,
        nClusters = 8, nProbes = 4)
      .collect().map(_.getLong(0)).toSet
    // probing half the cells should recall most of the true top-5
    assert(approx.intersect(exact).size >= 3,
      s"IVF recall too low: $approx vs exact $exact")
  }

  test("lshTopK approximates the exact top-k on clustered vectors") {
    val got = Similarity.lshTopK(spark, emb, queryId = 0L, k = 2, numHashTables = 8)
      .collect().map(_.getLong(0)).toSet
    // with 8 tables on 5 vectors the near neighbors should surface
    assert(got.contains(1L), s"nearest vector missing from $got")
  }
}
