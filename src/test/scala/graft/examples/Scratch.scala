package graft.examples

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for operator tuning. */
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
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val doubled = d.unionAll(d.withColumn("doc_id", col("doc_id") + 100000L))
    println("[scratch] docs=" + doubled.count())
    println("[scratch] token stats: " + d.select(
      avg(size(split(col("text"), "\\s+"))), max(size(split(col("text"), "\\s+")))).head())

    val sh = doubled.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingles+count")(sh.write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignature(col("sh"), 16)
    val sigDf = sh.select(col("doc_id") +: sig.zipWithIndex.map { case (c, i) => c.as(s"m$i") }: _*)
    time("signatures")(sigDf.write.format("noop").mode("overwrite").save())

    val bandKeys = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws(",", sig.slice(b * 4, (b + 1) * 4): _*)).as("key"))
    }
    val banded = sh.select(col("doc_id"), col("sh"), explode(array(bandKeys: _*)).as("bk"))
    val a = banded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("bk"))
    val b = banded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("bk"))
    val joined = a.join(b, Seq("bk")).where(col("id_a") < col("id_b"))
    println("[scratch] candidate band-pairs=" + time("join-count")(joined.count()))
    println("[scratch] distinct candidate pairs=" +
      time("distinct-count")(joined.select("id_a", "id_b").distinct().count()))
    val full = time("full e09")(Dedup.minhashNearDupNative(doubled, minJaccard = 0.7).count())
    println("[scratch] final pairs=" + full)
    spark.stop()
  }
}
