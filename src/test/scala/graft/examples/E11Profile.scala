package graft.examples

import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness: naive full-inverted-index n-gram Jaccard vs the
  * rare-first prefix-filtered operator, interleaved reps in one JVM so
  * co-tenant drift hits both arms.
  */
object E11Profile {
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

    def naive(docs: DataFrame, t: Double): DataFrame = {
      val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      val inv = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
      val a = inv.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("g"))
      val b = inv.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("g"))
      a.join(b, Seq("g")).where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"), first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
        .select(col("id_a"), col("id_b"),
          (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
        .where(col("jaccard") >= t)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // rare-first candidate count (instrumented copy of the operator's stages)
    val t = 0.8
    val sh = doubled.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
    val prefLen = greatest((col("n_sh") - ceil(lit(t) * col("n_sh")) + 1).cast("int"), lit(1))
    val full = sh.where(col("n_sh") > 0).select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("df"), col("g"))
    val inv = full.withColumn("df", count(lit(1)).over(wdf))
      .withColumn("rn", row_number().over(wdoc))
      .where(col("rn") <= prefLen).select(col("id"), col("n_sh"), col("g"))
    val cands = inv.select(col("id").as("id_a"), col("n_sh").as("n_a"), col("g"))
      .join(inv.select(col("id").as("id_b"), col("n_sh").as("n_b"), col("g")), Seq("g"))
      .where(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")) >= lit(t) * greatest(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b")).distinct()
    time("rare-first distinct candidates")(cands.count())

    // variant: one shuffle — groupBy posting list per shingle, explode pairs
    // within the bucket, then count common per pair (no string-keyed join)
    def bucketed(docs2: org.apache.spark.sql.DataFrame, t2: Double): org.apache.spark.sql.DataFrame = {
      val sh2 = docs2.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("id"), col("sh"), size(col("sh")).as("n_sh"))
      val inv2 = sh2.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
      val buckets = inv2.groupBy(col("g"))
        .agg(collect_list(struct(col("id"), col("n_sh"))).as("members"))
        .where(size(col("members")) > 1)
      buckets
        .select(explode(col("members")).as("a"), col("members"))
        .select(col("a"), explode(col("members")).as("b"))
        .where(col("a.id") < col("b.id") &&
          least(col("a.n_sh"), col("b.n_sh")) >= lit(t2) * greatest(col("a.n_sh"), col("b.n_sh")))
        .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .agg(count(lit(1)).as("common"), first(col("a.n_sh")).as("n_a"), first(col("b.n_sh")).as("n_b"))
        .select(col("id_a"), col("id_b"),
          (col("common").cast("double") / (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
        .where(col("jaccard") >= t2)
    }
    for (rep <- 1 to 3) {
      time(s"rep$rep join-based ")(Dedup.ngramJaccardPairs(doubled, minJaccard = 0.8).count())
      time(s"rep$rep bucketed  ")(bucketed(doubled, 0.8).count())
    }
    spark.stop()
  }
}
