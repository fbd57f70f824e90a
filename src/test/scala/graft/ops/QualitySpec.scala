package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("keyUniqueness separates clean keys from duplicated ones") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (2L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    val r = Quality.keyUniqueness(df, Seq("k")).head()
    // 5 rows over 3 keys; key 2 carries 3 duplicated rows
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 3L, 3L, 1L)))
    // a clean key reports zeros
    val clean = Quality.keyUniqueness(df.dropDuplicates("k"), Seq("k")).head()
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L)
  }

  test("orphanCount counts child keys missing from the parent") {
    import spark.implicits._
    val child = Seq(10L, 10L, 20L, 99L).toDF("ck")
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val r = Quality.orphanCount(child, parent, "ck", "pk").head()
    assert((r.getLong(0), r.getLong(1)) == ((4L, 1L)))
    // a NULL child key is ALWAYS an orphan — even a null parent key cannot
    // be referenced (the documented gate semantic)
    val nc = Seq(Some(10L), None).toDF("ck")
    val np = Seq(Some(10L), None).toDF("pk")
    val rn = Quality.orphanCount(nc, np, "ck", "pk").head()
    assert((rn.getLong(0), rn.getLong(1)) == ((2L, 1L)))
  }

  test("nullRates reports per-column null fractions from one pass") {
    import spark.implicits._
    val df = Seq((Some(1), Some("x")), (None, Some("y")), (None, None),
      (Some(4), Some("z"))).toDF("a", "b")
    val got = Quality.nullRates(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("a" -> ((2L, 0.5)), "b" -> ((1L, 0.25))))
  }
}
