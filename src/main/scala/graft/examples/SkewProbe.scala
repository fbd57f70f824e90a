package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical skew-join probe (VERDICT r8 item 3): joins the fact table to a
  * 1000-key dimension through a 90%-hot synthetic key — the canonical
  * straggler shape (one reducer owns 90% of the shuffle) — three ways:
  *
  *  - `smj_noskew`: plain sort-merge join with AQE's skew handling OFF —
  *    the straggler baseline a naive plan ships to a 1000-executor cluster;
  *  - `smj_aqe`: AQE `skewJoin` ON (runtime partition splitting) — what the
  *    engine's default conf gives you;
  *  - `salted`: `Layout.saltedJoin` (explicit salt 32) — the static fix for
  *    skew AQE can't reach (aggregations, or joins below its thresholds).
  *
  * Broadcast is disabled for the probe: a 1000-row dimension would
  * broadcast and no shuffle skew would exist to measure — the probe models
  * the BIG-dim case where the join must shuffle. AQE's thresholds are
  * lowered to engage splitting at local bench sizes (at 100 TB the defaults
  * engage on their own).
  *
  * Prints one JSON line: `{"rows":…,"hot_frac":…,"smj_noskew":s,"smj_aqe":s,
  * "salted":s}`. Run:
  *   `sbt "runMain graft.examples.SkewProbe /tmp/sf1"`
  */
object SkewProbe {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the probe measures SHUFFLE skew: broadcast would erase it
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // engage AQE splitting at local sizes (defaults: 256MB/5x aim at
      // cluster-scale partitions and would ignore this probe's skew)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of fact rows land on key 0; the rest spread over 1..999
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(pmod(col("l_orderkey"), lit(100)) < 90, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(1000))).as("k"),
        col("l_extendedprice").as("v"))
    val dim = spark.range(0, 1000).select(
      col("id").as("k"), (col("id") * 7).as("w"))
    val rows = fact.count()

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def joined = fact.join(dim, Seq("k")).select(col("k"), col("v") + col("w"))

    // warmup: touch both inputs through the full read path
    run(fact.limit(1000).join(dim, Seq("k")))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val tNoSkew = time(run(joined))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val tAqe = time(run(joined))
    val tSalted = time(run(
      graft.ops.Layout.saltedJoin(fact, dim, "k", salt = 32)
        .select(col("k"), col("v") + col("w"))))

    println(s"""{"rows":$rows,"hot_frac":0.9,"smj_noskew":$tNoSkew,"smj_aqe":$tAqe,"salted":$tSalted}""")
    spark.stop()
  }
}
