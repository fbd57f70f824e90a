package graft.examples

import graft.ext.{Funnel, Percentiles}
import graft.ops.{Profile, Stats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-vs-approx measurement harness for the documented at-scale sketch
  * switches: each operator's exact oracle form and its sketch twin run on
  * the SAME input, reporting wall-clock speedup and the observed worst-case
  * error. This converts the "at 100 TB flip the `exact=false` switch"
  * scaladoc claims into executed numbers — results are recorded per round in
  * BASELINE.md (the r9 verdict's top item).
  *
  * Operators measured:
  *  - DAU/WAU: [[Funnel.activeUsers]] (exact distinct) vs
  *    [[Funnel.activeUsersApprox]] (DataSketches HLL per day + window union)
  *  - percentiles: [[Percentiles.exact]] (single-task buffer) vs
  *    [[Percentiles.approx]] (mergeable GK/KLL sketch, accuracy 10000)
  *  - profile: [[Profile.profile]] exact distincts (one Expand shuffle) vs
  *    HLL++ `approx_count_distinct` (no Expand)
  *  - correlation: [[Stats.corrMatrix]] exact DECIMAL(38) fixed-point
  *    moments vs codegen'd double moments
  *
  * Timings are min-of-`runs` with the cache cleared between runs (several
  * operators persist bounded intermediates); errors are data properties and
  * identical across runs.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.ApproxBench /tmp/sf1 3"`
  */
object ApproxBench {

  private def timeMin(spark: SparkSession, runs: Int)(f: => Unit): Double = {
    var best = Double.MaxValue
    (1 to runs).foreach { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  private def relErr(approx: Double, exact: Double): Double =
    if (exact == 0.0) math.abs(approx) else math.abs(approx - exact) / math.abs(exact)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-approx-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    val events = graft.queries.Reference.events(spark, sfDir)
    val lineitem = t("lineitem")
    val orders = t("orders")
    println(s"[approx] sfDir=$sfDir runs=$runs (timings are min-of-$runs, cache cleared per run)")

    // ---- DAU/WAU: exact distinct vs HLL sketch union -----------------------
    val exAu = Funnel.activeUsers(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val apAu = Funnel.activeUsersApprox(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val auErr = exAu.flatMap { case (ds, (dau, wau)) =>
      Seq(relErr(apAu(ds)._1.toDouble, dau.toDouble),
        relErr(apAu(ds)._2.toDouble, wau.toDouble))
    }.max
    val exAuT = timeMin(spark, runs)(Funnel.activeUsers(events).collect())
    val apAuT = timeMin(spark, runs)(Funnel.activeUsersApprox(events).collect())
    report("activeUsers (DAU/WAU)", exAuT, apAuT, auErr)

    // ---- percentiles: exact single-task buffer vs GK sketch ----------------
    val pcts = Seq("l_quantity" -> Seq(0.5, 0.9, 0.99),
      "l_extendedprice" -> Seq(0.25, 0.75, 0.99))
    def pctVals(df: DataFrame): Seq[Double] = {
      val r = df.head()
      pcts.indices.flatMap(i => r.getSeq[Double](i))
    }
    val exPv = pctVals(Percentiles.exact(lineitem, pcts))
    val apPv = pctVals(Percentiles.approx(lineitem, pcts))
    val pErr = exPv.zip(apPv).map { case (e, a) => relErr(a, e) }.max
    val exPT = timeMin(spark, runs)(Percentiles.exact(lineitem, pcts).collect())
    val apPT = timeMin(spark, runs)(Percentiles.approx(lineitem, pcts).collect())
    report("percentiles (lineitem)", exPT, apPT, pErr)

    // ---- profile: exact distincts (Expand) vs HLL++ ------------------------
    val pCols = Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    def distincts(exact: Boolean): Map[String, Long] =
      Profile.profile(orders, pCols, exactDistinct = exact).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    val exD = distincts(exact = true)
    val apD = distincts(exact = false)
    val dErr = pCols.map(c => relErr(apD(c).toDouble, exD(c).toDouble)).max
    val exDT = timeMin(spark, runs)(
      Profile.profile(orders, pCols, exactDistinct = true).collect())
    val apDT = timeMin(spark, runs)(
      Profile.profile(orders, pCols, exactDistinct = false).collect())
    report("profile distincts (orders)", exDT, apDT, dErr)

    // ---- correlation: exact INT128 fixed-point vs double moments -----------
    val cPairs = Seq("l_quantity" -> "l_extendedprice",
      "l_extendedprice" -> "l_discount", "l_quantity" -> "l_discount")
    def corrs(exact: Boolean): Map[(String, String), Double] =
      Stats.corrMatrix(lineitem, cPairs, exact = exact).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val exC = corrs(exact = true)
    val apC = corrs(exact = false)
    // corr lives in [-1, 1]: absolute error is the meaningful scale
    val cErr = cPairs.map(p => math.abs(exC(p) - apC(p))).max
    val exCT = timeMin(spark, runs)(
      Stats.corrMatrix(lineitem, cPairs, exact = true).collect())
    val apCT = timeMin(spark, runs)(
      Stats.corrMatrix(lineitem, cPairs, exact = false).collect())
    report("corrMatrix (lineitem)", exCT, apCT, cErr, absolute = true)

    spark.stop()
  }

  private def report(name: String, exactS: Double, approxS: Double,
      maxErr: Double, absolute: Boolean = false): Unit = {
    val kind = if (absolute) "max_abs_err" else "max_rel_err"
    println(f"[approx] $name%-28s exact ${exactS}%7.2f s  approx ${approxS}%7.2f s  " +
      f"speedup ${exactS / approxS}%5.2fx  $kind ${maxErr}%.6f")
  }
}
