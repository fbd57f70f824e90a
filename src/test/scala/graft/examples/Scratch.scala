package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for operator tuning. Current experiment:
  * e31 semdedup with fixed vs √n-adaptive nClusters at rehearsal scale.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count())

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val doubled = e.unionAll(e.withColumn("vec_id", col("vec_id") + 100000L))
    val n = doubled.count()
    val kAdaptive = math.max(16, math.sqrt(n.toDouble).toInt)
    println(s"[scratch] n=$n kAdaptive=$kAdaptive")
    for (_ <- 1 to 2) {
      time("e31 k=16      ")(noop(
        graft.ext.Similarity.semDedupPairs(doubled, nClusters = 16, minCosine = 0.95)))
      time(s"e31 k=$kAdaptive adaptive")(noop(
        graft.ext.Similarity.semDedupPairs(doubled, nClusters = kAdaptive, minCosine = 0.95)))
    }
    spark.stop()
  }
}
