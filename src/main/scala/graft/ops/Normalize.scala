package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier-robust numeric normalization for feature/metric columns:
  * winsorization (percentile clipping) — the standard guard before feeding a
  * heavy-tailed column to anything that squares it (z-scores, regression
  * features, anomaly baselines). A mis-keyed 1e12 price otherwise owns the
  * variance.
  *
  * Scale posture: TWO jobs, no data shuffle. Job 1 computes the clip bounds
  * (an exact percentile on mid-size frames via [[graft.ext.Percentiles]], or
  * the mergeable `approx_percentile` sketch at corpus scale); the 1-row
  * bounds frame then broadcasts into a pure per-row codegen'd projection —
  * the fact table itself is never shuffled and never re-read beyond the one
  * clipping scan.
  */
object Normalize {

  /** Clip bounds of `valueCol` at probabilities (`pLow`, `pHigh`) as a
    * 1-row frame (`lo`, `hi`), 4dp-rounded — rounding makes the bounds the
    * portable fixed-point contract (the e10 discipline: Spark's exact
    * `percentile` and DuckDB's `quantile_cont` agree at 4dp; raw doubles
    * may differ in the last ulp of the interpolation).
    *
    * `exact=true` routes through [[graft.ext.Percentiles.exact]] and
    * inherits its single-task row guard; `exact=false` uses the
    * Greenwald–Khanna `approx_percentile` sketch (bounded memory, mergeable
    * — the 100 TB default, same switch as Profile's `exactDistinct`).
    */
  def clipBounds(df: DataFrame, valueCol: String, pLow: Double, pHigh: Double,
      exact: Boolean = true, knownRows: Long = -1L): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val pcts =
      if (exact)
        graft.ext.Percentiles.exact(df, Seq(valueCol -> Seq(pLow, pHigh)),
          knownRows = knownRows)
      else
        graft.ext.Percentiles.approx(df, Seq(valueCol -> Seq(pLow, pHigh)))
    pcts.select(
      round(element_at(col(s"${valueCol}_pcts"), 1), 4).as("lo"),
      round(element_at(col(s"${valueCol}_pcts"), 2), 4).as("hi"))
  }

  /** Winsorize `valueCol`: append `{valueCol}_w` = the value clipped into
    * the [pLow, pHigh] percentile bounds. Unclipped values pass through
    * bit-identical; clipped values become the 4dp-rounded bound itself.
    * Null values stay null — guarded explicitly, because `least`/`greatest`
    * SKIP nulls (a null value would otherwise be invented as the bound).
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLow: Double = 0.01, pHigh: Double = 0.99,
      exact: Boolean = true, knownRows: Long = -1L): DataFrame = {
    val bounds = clipBounds(df, valueCol, pLow, pHigh, exact, knownRows)
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("lo")), col("hi"))))
      .drop("lo", "hi")
  }
}
