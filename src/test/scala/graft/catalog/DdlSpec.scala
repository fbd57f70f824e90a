package graft.catalog

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DdlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("database lifecycle + external parquet table registration + existence probe") {
    val db = "graft_ddl_spec"
    Ddl.recreateDatabase(spark, db)
    assert(!Ddl.tableExists(spark, db, "lineitem"))
    val registered = Ddl.registerDir(spark, db, "/root/testdata/sf0.001")
    assert(registered.contains("lineitem") && registered.contains("events"))
    assert(Ddl.tableExists(spark, db, "lineitem"))
    // the registered table is queryable through the catalog with SQL —
    // the reference's Presto role served by spark.sql
    val n = spark.sql(s"SELECT count(*) AS n FROM `$db`.`lineitem`").head().getLong(0)
    assert(n > 0)
    // get_table_shape counterpart: (rows, cols)
    assert(Ddl.tableShape(spark, s"`$db`.`lineitem`") == (n, 11))
    Ddl.dropDatabaseCascade(spark, db)
    assert(!spark.catalog.databaseExists(db))
  }

  test("registerDir picks up IngestJob's suffix-less parquet output directories") {
    val work = java.nio.file.Files.createTempDirectory("graft_etl").toString
    val csvDir = s"$work/csv"; new java.io.File(csvDir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$csvDir/My Table.csv"), "a,b\n1,x\n2,y\n")
    graft.ingest.IngestJob.csvDirToParquet(spark, csvDir, s"$work/pq")
    val db = "graft_etl_spec"
    Ddl.recreateDatabase(spark, db)
    // the full Main_File.py-style spine: ingest -> register -> query
    val registered = Ddl.registerDir(spark, db, s"$work/pq")
    assert(registered == Seq("My_Table"), s"got $registered")
    assert(spark.sql(s"SELECT count(*) FROM `$db`.`My_Table`").head().getLong(0) == 2)
    Ddl.dropDatabaseCascade(spark, db)
  }

}
