package graft.ingest

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SchemaInferenceSpec extends AnyFunSuite {
  import SchemaInference._

  test("integer narrowing uses the 2^30 safety margin, not 2^31 (helper_utils.py:105-110)") {
    assert(inferLong(Seq(0L, 100L, -5L)) == "int")
    assert(inferLong(Seq((1L << 30) - 1)) == "int")
    assert(inferLong(Seq(1L << 30)) == "bigint") // boundary value is EXCLUDED from int
    assert(inferLong(Seq(-(1L << 30))) == "bigint")
    assert(inferLong(Seq(1L << 40)) == "bigint")
    // property: widening never truncates — any sample set typed "int" fits int32
    val rnd = new scala.util.Random(7)
    Seq.fill(200)(Seq.fill(5)(rnd.nextLong() % (1L << 34))).foreach { xs =>
      if (inferLong(xs) == "int") assert(xs.forall(x => x.isValidInt))
    }
  }

  test("string rules: timestamp detection, varchar sizing, text overflow, nosql string") {
    assert(inferString(Seq("2020-01-01", "1999-12-31"), NoSql) == "timestamp")
    assert(inferString(Seq("2020-01-01 12:30:00"), Sql) == "timestamp")
    assert(inferString(Seq("abc", "defgh"), NoSql) == "string")
    // varchar(maxLen+10) when maxLen+5 < 255 (helper_utils.py:118-121)
    assert(inferString(Seq("abc", "defgh"), Sql) == "varchar(15)")
    assert(inferString(Seq("x" * 249), Sql) == "varchar(259)")
    assert(inferString(Seq("x" * 250), Sql) == "text")
    // mixed parseable/unparseable is NOT a timestamp
    assert(inferString(Seq("2020-01-01", "hello"), Sql) == "varchar(20)")
  }

  test("tableStructure on a DataFrame maps spark types through the heuristics") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(
      (1, 5L, 1.5, "abc", "2020-01-01"),
      (2, 1L << 35, 2.5, "de", "2021-06-30"))
      .toDF("small_i", "big_i", "d", "s", "dateish")
    val types = tableStructure(df).toMap
    assert(types("small_i") == "int")
    assert(types("big_i") == "bigint")
    assert(types("d") == "double")
    assert(types("s") == "string")
    assert(types("dateish") == "timestamp")
  }

  test("createTableStatement emits sanitized DDL") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a key!", "name")
    val ddl = createTableStatement(df, "db1", "t1")
    assert(ddl == "CREATE TABLE db1.t1 (a_key_ int, name string)")
  }
}
