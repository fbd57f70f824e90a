package graft.examples

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profile of minhashNearDupNative at bench scale. */
object E09Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
    val doubled = d.unionAll(d.withColumn("doc_id", col("doc_id") + 100000L))
    doubled.cache(); println("[prof] docs=" + doubled.count())
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    // stage 1: signatures + banding only
    val sigs = doubled.select(col("doc_id").as("id"),
        graft.functions.MinHash.minhashSig(col("text"), 3, 16).as("sig"))
      .where(element_at(col("sig"), 1) =!= Long.MaxValue)
    time("signatures")(sigs.count())
    val bandKeys = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", (0 until 4).map(r =>
          element_at(col("sig"), b * 4 + r + 1)): _*)).as("key"))
    }
    val banded = sigs.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
    val ids0 = banded.groupBy(col("bk"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val pairs = ids0
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .distinct()
    time("candidate pairs")(pairs.count())
    // full operator, 3 reps
    for (rep <- 1 to 3)
      time(s"rep$rep full e09")(Dedup.minhashNearDupNative(doubled, minJaccard = 0.7).count())
    spark.stop()
  }
}
