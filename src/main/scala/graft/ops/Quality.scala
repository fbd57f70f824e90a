package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality assertions over a new data drop — the Deequ-style checks a
  * pipeline runs BEFORE trusting 100 TB of fresh parquet: key uniqueness,
  * referential containment, null rates. Each check reduces to exact counts
  * (one aggregate or one join), so a report over a huge table is a handful
  * of count-shaped jobs, never a collect.
  *
  * [[Profile.profile]] describes a table; this JUDGES it — the outputs are
  * the numbers a gate compares against zero (dup keys, orphans) or a
  * threshold (null rate).
  */
object Quality {

  /** Key-uniqueness audit: total rows, distinct keys, rows carrying a
    * duplicated key, and the duplicated-key count — one aggregation over
    * the key-count table (which is keys-sized, the corpus is scanned once).
    * A clean primary key reports n_dup_keys = n_dup_rows = 0.
    */
  def keyUniqueness(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyUniqueness: keyCols must be non-empty")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("__n") > 1, col("__n")).otherwise(0L)).as("n_dup_rows"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_keys"))
  }

  /** Referential containment: rows of `child` whose `childKey` has no match
    * in `parent.parentKey` (orphans — a broken foreign key). One left-anti
    * join. A NULL child key ALWAYS counts as an orphan — the anti-join's
    * equality never matches null against anything, including a null parent
    * key — which is the useful gate semantic: a null FK cannot reference
    * any parent row.
    */
  def orphanCount(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_orphans"))))
  }

  /** Null-rate audit: per listed column, the null count and 4dp null rate,
    * one row per column from ONE aggregation (the Profile reshape).
    */
  def nullRates(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullRates: no columns given")
    val aggs = cols.map(c => count(col(c)).as(s"__nn_$c"))
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        when(col("__n") === 0, lit(0.0))
          .otherwise(round((col("__n") - col(s"__nn_$c")).cast("double") /
            col("__n").cast("double"), 4)).as("null_rate"))
    }
    one.select(inline(array(rows: _*))).orderBy(col("col_name"))
  }
}
