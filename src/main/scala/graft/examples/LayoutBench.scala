package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured adoption of the date-partitioned fact layout (VERDICT r10
  * item 7): LayoutSpec PROVES the prune is physical (a q28-shaped predicate
  * opens only the 1996 directory); this binary turns the proof into the
  * number a 100 TB operator actually plans around — the scan-time delta of
  * the bench's date-filtered join legs against a `writePartitioned` copy of
  * the fact tables.
  *
  * Layout: `orders` partitioned by derived `o_year = year(o_orderdate)`,
  * `lineitem` by `l_shipyear = year(l_shipdate)` — the incremental-landing
  * layout a daily pipeline produces for free. Three query shapes:
  *
  *  - '''q03 shape''' (single-fact date filter): `l_shipdate ≥ 1998-01-01`
  *    touches 1-2 of 7 ship-year partitions — the direct prune win.
  *  - '''q28 shape''' (TPC-H Q5 join, one-year orders window): the
  *    partitioned variant adds the `o_year = 1996` predicate the layout
  *    derives from the date range (at 100 TB this derivation is the job of
  *    a small analysis rule or a generated partition column; here it is
  *    explicit) — orders scan drops to one directory before its exchange.
  *  - '''q29 shape''' (no date filter — the honest CONTROL): groups by
  *    `year(o_orderdate)` over ALL years, so no prune applies; this leg
  *    measures what the partitioned layout COSTS when it cannot help
  *    (more, smaller files + partition-discovery overhead).
  *
  * Both variants run the same predicates on the same rows (the partition
  * column is derived, never replaces the data column), so row counts match
  * by construction and the delta is pure scan/prune behavior.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.examples.LayoutBench /tmp/sf1 5"`.
  * Results recorded per round in BASELINE.md.
  */
object LayoutBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val runs = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-layout-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_layout_bench").toString
    val ordersFlat = spark.read.parquet(s"$sfDir/orders.parquet")
    val liFlat = spark.read.parquet(s"$sfDir/lineitem.parquet")
    graft.ops.Layout.writePartitioned(
      ordersFlat.withColumn("o_year", year(col("o_orderdate"))), s"$base/orders", "o_year")
    graft.ops.Layout.writePartitioned(
      liFlat.withColumn("l_shipyear", year(col("l_shipdate"))), s"$base/lineitem", "l_shipyear")
    val ordersPart = spark.read.parquet(s"$base/orders")
    val liPart = spark.read.parquet(s"$base/lineitem")
    println(s"[layout] partitioned copies written under $base")

    def q03Shape(li: DataFrame, partitioned: Boolean): DataFrame = {
      val src = if (partitioned) li.where(col("l_shipyear") >= 1998) else li
      src.where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
    }
    def q28Shape(ord: DataFrame, partitioned: Boolean): DataFrame = {
      val li = liFlat // orders carries the date filter in this shape
      val cst = spark.read.parquet(s"$sfDir/customer.parquet")
      val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      val reg = spark.read.parquet(s"$sfDir/region.parquet")
      val o = if (partitioned) ord.where(col("o_year") === 1996) else ord
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cst, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(19,4)")).as("revenue"))
    }
    def q29Shape(li: DataFrame, ord: DataFrame): DataFrame = {
      val prt = spark.read.parquet(s"$sfDir/part.parquet")
        .where(col("p_name").contains("widget"))
      val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      li.join(prt, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_lines"))
    }

    val legs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q03_shape (lineitem date filter)",
        () => q03Shape(liFlat, partitioned = false),
        () => q03Shape(liPart, partitioned = true)),
      ("q28_shape (Q5 join, 1-year window)",
        () => q28Shape(ordersFlat, partitioned = false),
        () => q28Shape(ordersPart, partitioned = true)),
      ("q29_shape (no date filter - control)",
        () => q29Shape(liFlat, ordersFlat),
        () => q29Shape(liPart, ordersPart)))

    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()

    legs.foreach { case (name, flat, part) =>
      // sanity: identical row counts — the partition predicate must be a
      // derived-column restatement, never a semantic change
      val (nf, np) = (flat().count(), part().count())
      require(nf == np, s"$name: flat $nf rows != partitioned $np rows")
      def time(f: () => DataFrame): Double = {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // interleave A/B so a co-tenant spike hits both variants equally
      val samples = (1 to runs).map(_ => (time(flat), time(part)))
      val (mf, mp) = (median(samples.map(_._1)), median(samples.map(_._2)))
      println(f"[layout] $name%-38s flat ${mf}%6.2f s  partitioned ${mp}%6.2f s  " +
        f"(x${mf / mp}%.2f, $nf%d rows)")
    }
    spark.stop()
  }
}
