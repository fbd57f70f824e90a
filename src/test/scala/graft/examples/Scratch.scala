package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for operator tuning. Current experiment:
  * why the Curate sf1 mixture-ledger stage (mixturePlan + sourceJsd over a
  * 600-doc pinned frame) measured 99 s.
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val capped = graft.ops.Splits.capPerGroup(docs, "lang", k = 120)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[scratch] capped: ${capped.count()} docs")
    for (i <- 1 to 2) {
      time(s"mixturePlan  #$i")(
        graft.ext.Drift.mixturePlan(capped, budgetTokens = 1000000L,
          sourceCol = "lang").collect())
      time(s"sourceJsd    #$i")(
        graft.ext.Drift.sourceJsd(capped)
          .agg(max(col("jsd_nats"))).head().getDouble(0))
    }
    spark.stop()
  }
}
