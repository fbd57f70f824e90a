package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampling type-inference heuristics (SURVEY.md §1.2) — a pure-Scala
  * re-expression of `helper_utils.py:97-125` (`get_table_structure`) and
  * `:127-147` (`sql_create_table_statement`), unit-testable without a
  * SparkSession and scalable through `df.sample` when driven from one.
  *
  * The load-bearing quirks, kept verbatim:
  *  - integers map to `int` only when ALL sampled values lie strictly inside
  *    (−2³⁰, 2³⁰) — a deliberate 2× safety margin vs the true int32 range
  *    (`helper_utils.py:105-110`: "max for int is 2**31 but we will go with
  *    2**30"); otherwise `bigint`.
  *  - floats → `double`, unconditionally.
  *  - strings: if every non-null sample parses as a date/timestamp →
  *    `timestamp`; else `varchar(maxLen+10)` for the "sql" dialect when
  *    maxLen+5 < 255, `text` when longer, and plain `string` for the
  *    "nosql" (Hive) dialect.
  *  - inference is SAMPLED (10,000 rows with replacement,
  *    `helper_utils.py:102,132`) to bound cost — an engine feature, not a
  *    shortcut: at 100 TB a full-column scan for typing is the wrong plan.
  */
object SchemaInference {

  val SampleSize = 10000
  private val IntBound = 1L << 30

  sealed trait Dialect
  case object Sql extends Dialect
  case object NoSql extends Dialect

  /** Inferred column type from already-typed sample values (the pure core). */
  def inferLong(samples: Seq[Long]): String =
    if (samples.nonEmpty && samples.max < IntBound && samples.min > -IntBound) "int"
    else "bigint"

  private val dateFormats = Seq(
    "yyyy-MM-dd['T'][' ']HH:mm[:ss][.SSS]",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd.MM.yyyy")

  /** pd.to_datetime-style best-effort parse over common formats. */
  def parsesAsDatetime(s: String): Boolean = {
    val t = s.trim
    t.nonEmpty && dateFormats.exists { f =>
      try {
        java.time.format.DateTimeFormatter.ofPattern(f)
          .parse(t)
        true
      } catch { case _: Exception => false }
    }
  }

  /** String-column rule: timestamp if all non-null samples parse, else
    * dialect-dependent varchar/text/string.
    */
  def inferString(samples: Seq[String], dialect: Dialect): String = {
    val nonNull = samples.filter(_ != null)
    if (nonNull.nonEmpty && nonNull.forall(parsesAsDatetime)) "timestamp"
    else {
      val maxLen = if (nonNull.isEmpty) 0 else nonNull.map(_.length).max
      dialect match {
        case Sql if maxLen + 5 < 255 => s"varchar(${maxLen + 10})"
        case Sql => "text"
        case NoSql => "string"
      }
    }
  }

  /** Spark-typed column → Hive type string, applying the sampled heuristics
    * where the reference does (integer narrowing, string typing) and direct
    * mapping elsewhere.
    */
  def inferColumn(df: DataFrame, field: StructField, dialect: Dialect): String =
    field.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val vals = df.select(col(field.name).cast("long"))
          .na.drop().collect().map(_.getLong(0)).toSeq
        inferLong(vals)
      case FloatType | DoubleType | _: DecimalType => "double"
      case TimestampType | DateType => "timestamp"
      case BooleanType => "boolean"
      case StringType =>
        val vals = df.select(col(field.name))
          .na.drop().collect().map(_.getString(0)).toSeq
        inferString(vals, dialect)
      case other => other.simpleString
    }

  /** Sampled inference over a full DataFrame: 10k rows with replacement
    * (fraction = n/count, `helper_utils.py:132`), then per-column rules.
    * Returns (columnName → hive type) preserving column order.
    */
  def tableStructure(df: DataFrame, dialect: Dialect = NoSql): Seq[(String, String)] = {
    val n = df.count()
    val sampled =
      if (n == 0) df
      else df.sample(withReplacement = true, fraction = SampleSize.toDouble / n, seed = 42L)
    sampled.cache()
    try df.schema.fields.toSeq.map(f => f.name -> inferColumn(sampled, f, dialect))
    finally sampled.unpersist()
  }

  /** `sql_create_table_statement`: DDL text from the inferred structure. */
  def createTableStatement(df: DataFrame, schemaName: String, tableName: String,
      dialect: Dialect = NoSql): String = {
    val cols = tableStructure(df, dialect)
      .map { case (c, t) => s"${Sanitize.replaceInString(c)} $t" }
    s"CREATE TABLE $schemaName.$tableName (${cols.mkString(", ")})"
  }
}
