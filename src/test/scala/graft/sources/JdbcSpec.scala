package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC sink/source against embedded Derby (ships with Spark) — a real
  * driver + database, no network.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  test("writeReplace + read round-trips a frame (to_sql if_exists=replace)") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "x")
    Jdbc.writeReplace(df, url, "t1")
    // replace semantics: second write overwrites, not appends
    Jdbc.writeReplace(df, url, "t1")
    val back = Jdbc.read(spark, url, "t1")
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
  }

  test("writeAppend accumulates rows") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    Jdbc.writeReplace(df, url, "t2")
    Jdbc.writeAppend(df, url, "t2")
    assert(Jdbc.read(spark, url, "t2").count() == 2)
  }

  test("partitioned read fans out over the id range") {
    import spark.implicits._
    val df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("v"))
    Jdbc.writeReplace(df, url, "t3")
    val back = Jdbc.readPartitioned(spark, url, "t3", "id", 0, 100, 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("v")).head().getLong(0) == df.agg(sum("v")).head().getLong(0))
  }
}
