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
}
