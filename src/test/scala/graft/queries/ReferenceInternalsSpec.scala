package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReferenceInternalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("msum is exact and order-independent, including negatives") {
    import spark.implicits._
    val df = Seq(1.23, -4.56, 1000000.07, -0.0001, 0.00005).toDF("x")
    val got = df.agg(Reference.msum(col("x"))).head().getDouble(0)
    // fixed-point at 1e-4: 0.00005 rounds to 0.0001 (half away from zero)
    assert(got == 1.23 - 4.56 + 1000000.07 - 0.0001 + 0.0001)
    // reversed input order → identical bits
    val rev = df.orderBy(col("x")).agg(Reference.msum(col("x"))).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(rev))
  }

  test("events loader converts Long-nanos ts to microsecond timestamps") {
    val ev = Reference.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val r = ev.orderBy(col("event_id")).select(col("ts").cast("string")).head().getString(0)
    // known first event at sf0.001 (see FIXTURES): 2024-01-01 00:09:58.778549
    assert(r.startsWith("2024-01-01 00:09:58.778"), r)
  }

  test("BitOps column shifts agree with the Int-shift builtins") {
    import spark.implicits._
    val df = Seq((0xdeadbeefcafeL, 7), (-42L, 3), (1L, 63)).toDF("x", "s")
    df.collect() // materialize
    val rows = Seq((0xdeadbeefcafeL, 7), (-42L, 3), (1L, 63))
    rows.foreach { case (x, s) =>
      val got = Seq((x, s)).toDF("x", "s")
        .select(
          graft.functions.BitOps.shiftRight(col("x"), col("s")).as("r"),
          graft.functions.BitOps.shiftLeft(col("x"), col("s")).as("l"),
          shiftright(col("x"), s).as("r2"), shiftleft(col("x"), s).as("l2"))
        .head()
      assert(got.getLong(0) == got.getLong(2))
      assert(got.getLong(1) == got.getLong(3))
    }
  }
}
