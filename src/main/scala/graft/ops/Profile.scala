package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling — the "datasheet" pass a curation pipeline runs before
  * trusting a new 100 TB drop: per-column row/null/distinct counts and
  * min/max, one output row per column. (The reference's closest analogue is
  * its table-shape probe — rows×cols, ipynb cell 1 — this is that probe
  * grown into a real data-quality summary, Deequ-style.)
  *
  * Scale shape: ONE aggregation job over the input produces every metric —
  * no per-column scans. Exact multi-column distinct counts plan as a single
  * Expand (one row per profiled column per input row) feeding one
  * partial+final hash aggregate, so the input is read once regardless of how
  * many columns are profiled. For corpora where exact distincts are not
  * worth an Expand shuffle, `exactDistinct = false` switches to
  * approx_count_distinct (HLL++, one pass, no Expand) — the 100 TB default;
  * the exact form is what the DuckDB oracle verifies.
  *
  * Numeric columns report min/max as doubles (`min_num`/`max_num`); all
  * columns report lexicographic `min_str`/`max_str` via a binary string
  * compare (identical collation in Spark and DuckDB for ASCII data). The
  * reshape from the single metrics row to one-row-per-column is a zero-cost
  * `inline(array(struct…))` over an already-1-row frame.
  */
object Profile {

  /** Profile `cols` of `df`: one row per column, totally ordered by name.
    * Output: (col_name, n_rows, n_null, n_distinct, min_num, max_num,
    * min_str, max_str).
    */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such columns: ${missing.mkString(", ")}")

    def isNum(c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[NumericType]

    // one metrics row: every aggregate for every column, names mangled
    val aggs: Seq[Column] = cols.flatMap { c =>
      val nd =
        if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        count(col(c)).as(s"${c}__nn"),
        nd.as(s"${c}__ndist"),
        (if (isNum(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"${c}__minn"),
        (if (isNum(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"${c}__maxn"),
        min(col(c).cast("string")).as(s"${c}__mins"),
        max(col(c).cast("string")).as(s"${c}__maxs"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)

    // reshape: 1 metrics row -> one row per profiled column
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__minn").as("min_num"),
        col(s"${c}__maxn").as("max_num"),
        col(s"${c}__mins").as("min_str"),
        col(s"${c}__maxs").as("max_str"))
    }
    one.select(inline(array(rows: _*))).orderBy(col("col_name"))
  }

  /** DuckDB mirror of [[profile]], GENERATED from the same column list so
    * the two sides cannot drift (the e07/e17 pattern). `numericCols` must
    * name the subset of `cols` that is numeric in the parquet schema.
    */
  def profileSql(table: String, cols: Seq[String], numericCols: Set[String]): String = {
    val per = cols.map { c =>
      val (mn, mx) =
        if (numericCols(c)) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  $mn AS min_num, $mx AS max_num,
         |  min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str
         |FROM $table""".stripMargin
    }
    per.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }
}
