package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build: collapse an event log's
  * consecutive runs of an attribute value into validity intervals — the
  * change-data-capture companion to [[Diff]] (which diffs two snapshots;
  * this derives the full change history from one ordered log). The output is
  * the standard SCD2 shape: one row per (key, run) with `valid_from` /
  * `valid_to` (null = current), ready to drive point-in-time joins.
  *
  * Scale posture: ONE shuffle. The run detection (lag), the island id
  * (running sum), the per-run aggregate, and the `valid_to` lead all cluster
  * on `hash(keyCol)`, so Catalyst plans a single exchange and every later
  * step reuses its partitioning (asserted in ScdSpec). Runs are detected by
  * per-row window arithmetic — no state larger than a row, no per-key
  * collection, so a key with a billion events costs a billion *streamed*
  * rows in one task's sort, the same posture as sessionization
  * ([[graft.streaming.EventStream.sessionizeBatch]]).
  */
object Scd {

  /** Validity intervals of `attrCol` per `keyCol`, ordered by (`tsCol`,
    * `tieCol`) — the tie column makes the run boundaries deterministic when
    * timestamps collide (the e32 total-order discipline). A run ends where
    * the next event's attribute differs (null-safe: null→'a', 'a'→null, and
    * 'a'→'b' all close a run; consecutive nulls continue one).
    *
    * Output columns: keyCol, attrCol, `run_idx` (1-based per key, the total
    * order of the history), `valid_from` (run's first event ts), `valid_to`
    * (NEXT run's first event ts; null for the key's current run — the
    * half-open [from, to) convention, so point-in-time lookup is
    * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`), `n_events`.
    */
  def changeIntervals(
      df: DataFrame,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    // row_number = 1 forces the first run to index 1 even when the first
    // attribute is null (null <=> null would otherwise leave the flag 0)
    val isNewRun = row_number().over(ord) === 1 ||
      !(lag(col(attrCol), 1).over(ord) <=> col(attrCol))
    val runs = df
      .withColumn("run_idx",
        sum(when(isNewRun, 1L).otherwise(0L))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("run_idx"))
      // attr is constant within a run — min() is its deterministic witness
      .agg(min(col(attrCol)).as(attrCol),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col("run_idx"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKey))
      .select(col(keyCol), col(attrCol), col("run_idx"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }

  /** Point-in-time join: for each probe row, the attribute value that was
    * valid at its `probeTsCol` — an equi-join on the key plus the half-open
    * interval predicate. The interval side is the COLLAPSED history (runs,
    * not events), which is dimension-sized; it broadcasts by default so the
    * probe side never shuffles. Probes before the key's first run (or with
    * no key match) are dropped (inner join semantics).
    */
  def asOfLookup(
      probes: DataFrame,
      history: DataFrame,
      keyCol: String,
      probeTsCol: String,
      broadcastHistory: Boolean = true): DataFrame = {
    val h0 = history.withColumnRenamed(keyCol, "__key")
    val h = if (broadcastHistory) broadcast(h0) else h0
    probes.join(h,
      probes(keyCol) === h("__key") &&
        h("valid_from") <= probes(probeTsCol) &&
        (h("valid_to").isNull || probes(probeTsCol) < h("valid_to")))
      .drop("__key")
  }
}
