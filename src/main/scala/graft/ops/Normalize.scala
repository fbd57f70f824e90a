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

  /** Quantile bucketing (feature binning / stratification key): append
    * `{valueCol}_bucket` ∈ [0, k) — the row's position among the k−1
    * interior percentile cut points (bucket = number of cuts ≤ value, so
    * ties at a cut land in the upper bucket deterministically). The same
    * two-job shape as [[winsorize]]: one percentile pass for the cuts
    * (4dp-rounded — the portable fixed-point contract), then a broadcast
    * into a per-row codegen'd sum of comparisons; the fact table never
    * shuffles. Equal cut points (heavy ties in the data) simply leave some
    * buckets empty rather than failing. Null values → null bucket.
    */
  def quantileBuckets(df: DataFrame, valueCol: String, k: Int,
      exact: Boolean = true, knownRows: Long = -1L): DataFrame = {
    require(k >= 2, s"quantileBuckets needs k >= 2 buckets, got $k")
    val probs = (1 until k).map(_.toDouble / k)
    val pcts =
      if (exact) graft.ext.Percentiles.exact(df, Seq(valueCol -> probs),
        knownRows = knownRows)
      else graft.ext.Percentiles.approx(df, Seq(valueCol -> probs))
    val cuts = pcts.select(
      (1 until k).map(i =>
        round(element_at(col(s"${valueCol}_pcts"), i), 4).as(s"__c$i")): _*)
    val bucket = (1 until k)
      .map(i => when(col(valueCol) >= col(s"__c$i"), 1).otherwise(0))
      .reduce(_ + _)
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_bucket",
        when(col(valueCol).isNull, lit(null).cast("int"))
          .otherwise(bucket.cast("int")))
      .drop((1 until k).map(i => s"__c$i"): _*)
  }

  /** DuckDB mirror of [[quantileBuckets]] — generated from the same
    * constants (probabilities, 4dp rounding, ≥-comparison sum) so the
    * bucket contract cannot drift. `table` may be any FROM-able SQL.
    */
  def quantileBucketsSql(table: String, valueCol: String, k: Int): String = {
    val cutDefs = (1 until k)
      .map(i => s"round(quantile_cont($valueCol, ${i.toDouble / k}), 4) AS c$i")
      .mkString(",\n    ")
    val sumTerms = (1 until k)
      .map(i => s"CASE WHEN $valueCol >= c$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH cuts AS (
       |  SELECT $cutDefs
       |  FROM $table
       |)
       |SELECT t.*, CASE WHEN $valueCol IS NULL THEN NULL
       |  ELSE CAST($sumTerms AS INTEGER) END AS ${valueCol}_bucket
       |FROM $table t CROSS JOIN cuts""".stripMargin
  }
}
