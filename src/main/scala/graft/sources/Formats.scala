package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/row source-format helpers beyond CSV/Parquet (engine breadth:
  * a user switching from the reference should be able to land data in any
  * Spark-native format). ORC gets the same pushdown/pruning treatment as
  * Parquet; JSON-lines is schema-on-read (pass an explicit schema in
  * production — inference is a full extra pass).
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}
