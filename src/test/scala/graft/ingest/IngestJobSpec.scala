package graft.ingest

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class IngestJobSpec extends AnyFunSuite {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_ingest").toString

  test("csvDirToParquet converts every csv with sanitized names and inferred schema") {
    val spark = SparkTestSession.spark
    val in = tmpDir(); val out = tmpDir()
    Files.writeString(java.nio.file.Paths.get(s"$in/My Data-1.csv"),
      "col name-1!,n val,when\nalpha,1,2020-01-01\nbeta,2147483648,2021-02-03\n")
    Files.writeString(java.nio.file.Paths.get(s"$in/other.txt"), "ignored")

    val schemas = IngestJob.csvDirToParquet(spark, in, out)
    assert(schemas.keySet == Set("My_Data_1"))
    val df = spark.read.parquet(s"$out/My_Data_1")
    assert(df.columns.toSeq == Seq("col_name_1_", "n_val", "when"))
    assert(df.count() == 2)
    // inferSchema promoted the int32-overflowing column to long
    assert(df.schema("n_val").dataType == org.apache.spark.sql.types.LongType)
  }

  test("preprocess drops all-null columns and rewrites headers (pandas-path rule)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq(("a", Option.empty[String], 1), ("b", None, 2))
      .toDF(" keep me ", "all-null", "n")
    val got = IngestJob.preprocess(df)
    assert(got.columns.toSeq == Seq("keep_me", "n"))
    assert(got.count() == 2)
  }
}
