package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("ORC round-trip preserves rows and gets predicate pushdown") {
    val out = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Formats.writeOrc(l, s"$out/li")
    val back = Formats.readOrc(spark, s"$out/li")
    assert(back.count() == l.count())
    val filtered = back.where(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_returnflag"), plan.take(500))
    assert(filtered.count() == l.where(col("l_returnflag") === "R").count())
  }

  test("JSON-lines round-trip with explicit schema") {
    val out = java.nio.file.Files.createTempDirectory("graft_json").toString
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    Formats.writeJsonLines(o, s"$out/orders")
    val back = Formats.readJsonLines(spark, s"$out/orders", Some(o.schema))
    assert(back.count() == o.count())
    assert(back.schema == o.schema)
    val a = o.agg(sum("o_totalprice")).head().getDouble(0)
    val b = back.agg(sum("o_totalprice")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }
}
