package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches the textbook values DuckDB's jaro_winkler_similarity produces") {
    // reference values probed from duckdb (the e57 oracle engine)
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964,
      ("dwayne", "duane") -> 0.8400000000000001,
      ("aaa", "aab") -> 0.8222222222222222,
      ("abc", "abc") -> 1.0,
      // below the 0.7 boost threshold the prefix bonus must NOT apply
      ("ab", "ax") -> 0.6666666666666666,
      ("abcdef", "abzzzz") -> 0.5555555555555555,
      // empties score 0 (including both-empty — the DuckDB convention)
      ("", "") -> 0.0,
      ("a", "") -> 0.0,
      ("ABCDE", "abcde") -> 0.0)
    cases.foreach { case ((a, b), want) =>
      assert(jw(a, b) == want, s"jw($a, $b)")
      assert(jw(b, a) == want, s"jw($b, $a) (symmetry)")
    }
  }

  test("operates on UTF-8 bytes, the portable cross-engine unit") {
    // 'é'(C3A9) vs 'è'(C3A8): 3 bytes, 2 matches → jaro 7/9, prefix 2
    assert(jw("aé", "aè") == 0.8222222222222222)
  }

  test("jaroWinklerPairs blocks by first char and length band, scores once per pair") {
    import spark.implicits._
    val names = Seq("martha", "marhta", "dixon", "dwayne", "duane", "zz")
      .toDF("name")
    val got = graft.ext.Dedup.jaroWinklerPairs(names, "name", minJw = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // only martha/marhta clears 0.9; dwayne/duane (0.84) is blocked-in but
    // under threshold; dixon/duane share 'd' but score low
    assert(got.toSeq == Seq(("marhta", "martha", 0.9611)))
    // the length band EXCLUDES a high-JW pair with distant lengths:
    // 'aaaaaa' vs 'aaaaaaaaaa' (len 6 vs 10) never meets at band 2
    val lens = Seq("aaaaaa", "aaaaaaaaaa").toDF("name")
    assert(graft.ext.Dedup.jaroWinklerPairs(lens, "name", minJw = 0.5).isEmpty)
    assert(graft.ext.Dedup.jaroWinklerPairs(lens, "name", minJw = 0.5,
      lenBand = 4).count() == 1)
  }

  test("SQL registration and Column API agree inside codegen") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", ""))
      .toDF("a", "b")
    val viaCol = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val viaSql = df.selectExpr("jaro_winkler(a, b)")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaCol == viaSql)
    assert(viaCol == Seq(0.9611111111111111, 0.8133333333333332, 0.0))
    // null propagates
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
  }
}
