package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_BENCH_RUNS=k repeats the whole suite k times and reports
    // the per-query MEDIAN (plus min) — the documented 5× co-tenant variance
    // makes any single-run number unusable as a regression signal, so the
    // default is 3 (median-of-3 is the official record, no env var needed).
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts shape varies across testdata generations (nanos vs NTZ
      // micros); nanosAsLong covers the nanos case and Reference.events
      // normalizes every shape to a µs TimestampType column.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: initialize parquet reader, codegen, and shuffle machinery so
    // the first measured query doesn't absorb session startup (~3s).
    spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    // noop sink (not .count()): forces full materialization of every output
    // column — count() lets Catalyst prune projections and would under-time
    // compute-heavy queries.
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val timings = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val failures = scala.collection.mutable.Map.empty[String, Int]
    // whole-suite passes (not back-to-back repeats of one query) so a
    // co-tenant load spike hits different queries in different runs.
    // A run that throws is a FAILURE, not a sample: its time-to-failure never
    // enters the medians (a consistently-crashing query must not report a
    // fast, meaningless timing) — it is counted in the "failures" field.
    for (_ <- 1 to runs; (name, fn) <- names) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        timings(name) = timings.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failures(name) = failures.getOrElse(name, 0) + 1
      }
    }
    val succeeded = names.filter { case (k, _) => timings.contains(k) }
    def jsonMap(f: Vector[Double] => Double): String =
      succeeded.map { case (k, _) => s"\"" + k + "\":" + f(timings(k)) }.mkString("{", ",", "}")
    val qs = jsonMap(median)
    val qsMin = jsonMap(_.min)
    val fails = failures.toSeq.sortBy(_._1)
      .map { case (k, n) => s"\"" + k + "\":" + n }.mkString("{", ",", "}")
    val total = succeeded.map { case (k, _) => median(timings(k)) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"queries_min":$qsMin,"failures":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
