package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY.md §2.a S8) — the Spark-native replacement for
  * the reference's SQLAlchemy/pandas `to_sql(if_exists='replace')` path
  * (`sql_utils.py:141-151,180`). Row ingestion through a real JDBC driver
  * (tests run against embedded Derby, which ships with Spark).
  *
  * Scale posture: reads accept a partition spec (partitionColumn/bounds/
  * numPartitions) so a large table scan fans out across executors instead
  * of serializing through one connection — the single-connection default is
  * only right for dimension-sized tables.
  */
object Jdbc {

  /** `to_sql(if_exists='replace')`: overwrite-write a frame into a table. */
  def writeReplace(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .mode("overwrite")
      .save()

  /** Append-write (the reference's insert path). */
  def writeAppend(df: DataFrame, url: String, table: String,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .mode("append")
      .save()

  /** Single-connection read — dimension tables only. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .load()

  /** Partitioned parallel read for large tables: each executor task reads
    * one stride of `partitionColumn` ∈ [lowerBound, upperBound].
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .options(options)
      .load()
}
