package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the batch half of the lambda
  * pattern: a standing aggregate table is kept current by MERGING each new
  * delta's partial aggregate instead of re-scanning the full history. At
  * 100 TB this is the difference between a daily job that reads one day
  * and one that reads three years.
  *
  * Correctness rests on the merge algebra: counts and sums are additive,
  * min/max are idempotent semilattice merges — so
  * `merge(agg(old), agg(delta)) ≡ agg(old ∪ delta)` exactly (integer
  * counts; float sums through the caller's fixed-point discipline). The
  * e54 oracle verifies precisely that identity: Spark computes the
  * incremental merge, DuckDB recomputes from scratch, and the hashes must
  * agree.
  */
object Incremental {

  /** Merge two aggregate states sharing `keyCols`: `addCols` merge by SUM
    * (counts, fixed-point sums), `minCols` by MIN, `maxCols` by MAX. Keys
    * present in only one side pass through (full outer union semantics —
    * sum ignores the absent side's null, min/max likewise). One shuffle on
    * the key — both inputs are AGGREGATE-sized, never raw-event-sized.
    */
  def mergeStates(oldAgg: DataFrame, deltaAgg: DataFrame, keyCols: Seq[String],
      addCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "mergeStates: keyCols must be non-empty")
    val valCols = addCols ++ minCols ++ maxCols
    require(valCols.nonEmpty, "mergeStates: no value columns to merge")
    Seq(oldAgg, deltaAgg).foreach { df =>
      (keyCols ++ valCols).foreach(c => require(df.columns.contains(c),
        s"mergeStates: column $c missing from an input"))
    }
    val aggs = addCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    oldAgg.select((keyCols ++ valCols).map(col): _*)
      .unionByName(deltaAgg.select((keyCols ++ valCols).map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Latest row per key — CDC log compaction (the merge-on-read semantic of
    * an upsert table materialized): keep each key's row with the greatest
    * (`orderCol`, `tieCol`). One shuffle (the window partition), no
    * per-key collection. Use this to collapse an append-only change log
    * into current state before joining it as a dimension.
    */
  def latestByKey(df: DataFrame, keyCol: String, orderCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    df.withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .drop("__r")
  }
}
