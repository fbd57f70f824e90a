package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for operator tuning. Current experiment:
  * single-row-group testdata files force one-task scans — measure how much
  * a post-scan round-robin repartition buys the compute-heavy declared
  * queries under the driver's file layout.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // warmup
    noop(spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count())

    def docs(rep: Boolean) = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      if (rep) d.repartition(32) else d
    }
    def li(rep: Boolean) = {
      val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
      if (rep) d.repartition(32) else d
    }
    for (rep <- Seq(false, true, false, true)) {
      val tag = if (rep) "rep32" else "asis "
      time(s"e83 simhash_md5 $tag")(noop(
        docs(rep).select(col("doc_id"),
          coalesce(graft.ext.Dedup.simhashMd5(col("text")), lit(0L)))))
      time(s"e12 repetition  $tag")(noop(
        graft.ext.TextStats.repetitionStats(docs(rep))))
      time(s"e41 corr_matrix $tag")(noop(
        graft.ops.Stats.corrMatrix(li(rep),
          Seq("l_quantity" -> "l_extendedprice",
            "l_extendedprice" -> "l_discount",
            "l_quantity" -> "l_discount"))))
    }
    spark.stop()
  }
}
