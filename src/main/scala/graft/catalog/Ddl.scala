package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog / namespace lifecycle (SURVEY.md §2.a S4–S7) — the Spark-native
  * replacement for the reference's Hive-over-EMR DDL steps
  * (`aws_utils.py:148-176, 203-220`; `Main_File.py:59-65`) and the MySQL
  * existence probes (`sql_utils.py:103-139`). All thin wrappers over
  * `spark.sql` / `spark.catalog`: the session catalog replaces the external
  * metastore service.
  */
object Ddl {

  /** `DROP SCHEMA IF EXISTS … CASCADE` + `CREATE SCHEMA` (Main_File.py:59-63). */
  def recreateDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    spark.sql(s"CREATE DATABASE `$db`")
  }

  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  def dropDatabaseCascade(spark: SparkSession, db: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")

  /** Existence probe (`sql_utils.py:103-120` ran `select 1 … limit 1` and
    * mapped to a 200/404 status pair; the catalog answers directly).
    */
  def tableExists(spark: SparkSession, db: String, table: String): Boolean =
    spark.catalog.tableExists(s"`$db`.`$table`")

  /** External-table DDL over an existing Parquet directory — the Spark form
    * of `create table … stored as parquet location '…'` (aws_utils.py:203-220).
    */
  def createParquetTable(spark: SparkSession, db: String, table: String,
      location: String): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS `$db`.`$table` USING parquet LOCATION '$location'")

  /** Managed-table write: schema carried by the DataFrame (replaces the
    * reference's DDL synthesis from inferred `(col,type)` pairs — S6).
    */
  def saveAsTable(df: DataFrame, db: String, table: String): Unit =
    df.write.mode("overwrite").saveAsTable(s"`$db`.`$table`")

  /** `get_table_shape` counterpart (ipynb cell 1: COUNT(*) rows-query +
    * SELECT-*-LIMIT-1 column probe — Q2/Q11): (rows, cols). The column
    * count comes from the catalog schema, not a probe row.
    */
  def tableShape(spark: SparkSession, table: String): (Long, Int) = {
    val df = spark.table(table)
    (df.count(), df.schema.length)
  }

  /** Register every Parquet table under `sfDir` as an external table in
    * `db` — the end-to-end ETL spine of Main_File.py in one call.
    */
  def registerDir(spark: SparkSession, db: String, dir: String): Seq[String] = {
    createDatabase(spark, db)
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    // two layouts: single *.parquet files (driver testdata) and parquet
    // output DIRECTORIES as written by df.write.parquet / IngestJob (no
    // suffix — identified by the part-*.parquet files inside; a bare
    // _SUCCESS marker is NOT enough, csv/json/orc committers emit it too)
    def isParquetDir(f: java.io.File): Boolean =
      f.isDirectory && Option(f.listFiles()).getOrElse(Array.empty)
        .exists(c => c.getName.endsWith(".parquet"))
    val paths = files.filter(f => f.getName.endsWith(".parquet") || isParquetDir(f))
      .map(_.getAbsolutePath).sorted
    val names = paths.map(graft.ingest.Sanitize.fileName)
    // x.parquet and a sibling dir x/ sanitize to the same table name — the
    // second CREATE IF NOT EXISTS would silently no-op; fail loudly instead
    val dups = names.groupBy(identity).collect { case (n, g) if g.length > 1 => n }
    require(dups.isEmpty,
      s"multiple entries in $dir map to the same table name(s): ${dups.mkString(", ")}")
    paths.zip(names).map { case (p, name) =>
      createParquetTable(spark, db, name, p)
      name
    }
  }
}
