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

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], EVERY bin present (zero bins densified from a
    * `sequence()` spine — a silent hole reads as "no data here" when it
    * means "bin not emitted"). Output: (bin, lo, hi, n) with lo/hi
    * 4dp-rounded bin edges; the max value lands in the last bin
    * (right-closed top edge); nulls are excluded from the count and the
    * range.
    *
    * Scale shape: one min/max aggregate (1-row broadcast), then a per-row
    * codegen'd bin assignment and a bins-bounded count shuffle — the
    * column is scanned twice but never shuffled. Bin arithmetic fixes its
    * association (`(v − min) / span · bins`, floored) so assignment is
    * IEEE-identical across engines. Degenerate range (min = max) puts
    * every row in bin 0.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"histogram needs bins > 0, got $bins")
    val mm = df.agg(
      min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    val span = col("__hi") - col("__lo")
    val bin = when(span === 0.0, lit(0))
      .otherwise(least(lit(bins - 1),
        floor((col(valueCol).cast("double") - col("__lo")) / span * bins).cast("int")))
    val counts = df.where(col(valueCol).isNotNull)
      .crossJoin(broadcast(mm))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
    val spine = mm.select(explode(sequence(lit(0), lit(bins - 1))).as("bin"),
      col("__lo"), col("__hi"))
    spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        round(col("__lo") + col("bin") * (col("__hi") - col("__lo")) / bins, 4).as("lo"),
        round(col("__lo") + (col("bin") + 1) * (col("__hi") - col("__lo")) / bins, 4).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bin"))
  }

  /** DuckDB mirror of [[histogram]] — generated, same bin association and
    * densified spine.
    */
  def histogramSql(table: String, valueCol: String, bins: Int): String =
    s"""WITH mm AS (
       |  SELECT CAST(min($valueCol) AS DOUBLE) AS lo0,
       |         CAST(max($valueCol) AS DOUBLE) AS hi0
       |  FROM $table
       |), counts AS (
       |  SELECT CASE WHEN hi0 - lo0 = 0 THEN 0
       |    ELSE LEAST($bins - 1, CAST(floor(
       |      (CAST($valueCol AS DOUBLE) - lo0) / (hi0 - lo0) * $bins) AS INTEGER))
       |    END AS bin, COUNT(*) AS n
       |  FROM $table CROSS JOIN mm
       |  WHERE $valueCol IS NOT NULL
       |  GROUP BY 1
       |), spine AS (
       |  SELECT unnest(range(0, $bins)) AS bin, lo0, hi0 FROM mm
       |)
       |SELECT CAST(s.bin AS INTEGER) AS bin,
       |  round(lo0 + s.bin * (hi0 - lo0) / $bins, 4) AS lo,
       |  round(lo0 + (s.bin + 1) * (hi0 - lo0) / $bins, 4) AS hi,
       |  COALESCE(n, 0) AS n
       |FROM spine s LEFT JOIN counts c ON s.bin = c.bin
       |ORDER BY bin""".stripMargin
}
