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
  /** Raw percentile doubles for `probs` of `valueCol` — the shared EAGER
    * core of the wrappers below (round 16): `exact=true` runs the
    * distributed grid jobs ([[graft.ext.Percentiles.exactGridValues]] —
    * identical values to Spark's `percentile`, SketchSpec pin) and
    * `exact=false` runs the mergeable `approx_percentile` sketch; either
    * way the values come back to the driver (they are O(probs) scalars)
    * and are embedded as LITERALS in the returned projection, so the fact
    * table's plan carries no broadcast/crossJoin at all and no cached
    * intermediate outlives the call. None ⇔ zero non-null values.
    */
  private def pctValues(df: DataFrame, valueCol: String, probs: Seq[Double],
      exact: Boolean, maxGridCells: Long): Option[Seq[Double]] =
    if (exact)
      graft.ext.Percentiles.exactGridValues(df, valueCol, probs, maxGridCells)
    else {
      val r = graft.ext.Percentiles.approx(df, Seq(valueCol -> probs)).head()
      if (r.isNullAt(0)) None else Some(r.getSeq[Double](0).toSeq)
    }

  /** 4dp-rounded literal columns for the percentile values: Spark's own
    * `round` applied to the literal (constant-folded), so the rounding
    * contract stays engine-exact — never a driver-side reimplementation.
    */
  private def roundedLits(vals: Option[Seq[Double]], n: Int): Seq[Column] =
    vals match {
      case Some(vs) => vs.map(v => round(lit(v), 4))
      case None => Seq.fill(n)(lit(null).cast("double"))
    }

  def clipBounds(df: DataFrame, valueCol: String, pLow: Double, pHigh: Double,
      exact: Boolean = true, knownRows: Long = -1L,
      maxGridCells: Long = 50000000L): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    // exact=true routes through the EAGER grid form (rounds 15/16):
    // identical values to Percentiles.exact (SketchSpec pin), computed by
    // the distributed prefix-sum grid at call time — knownRows is no
    // longer consulted (kept for source compatibility; the scale contract
    // is maxGridCells, the grid-size guard, exposed here since round 16)
    val Seq(lo, hi) = roundedLits(
      pctValues(df, valueCol, Seq(pLow, pHigh), exact, maxGridCells), 2)
    df.sparkSession.range(1).select(lo.as("lo"), hi.as("hi"))
  }

  /** Winsorize `valueCol`: append `{valueCol}_w` = the value clipped into
    * the [pLow, pHigh] percentile bounds. Unclipped values pass through
    * bit-identical; clipped values become the 4dp-rounded bound itself.
    * Null values stay null — guarded explicitly, because `least`/`greatest`
    * SKIP nulls (a null value would otherwise be invented as the bound).
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLow: Double = 0.01, pHigh: Double = 0.99,
      exact: Boolean = true, knownRows: Long = -1L,
      maxGridCells: Long = 50000000L): DataFrame = {
    require(0.0 <= pLow && pLow < pHigh && pHigh <= 1.0,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    // bounds as constant-folded literals (round 16): the fact table's plan
    // is a pure codegen'd projection — the broadcast/BNLJ the 1-row bounds
    // frame used to plan is gone (a non-null value implies non-null bounds,
    // so the otherwise-branch never sees a null bound)
    val Seq(lo, hi) = roundedLits(
      pctValues(df, valueCol, Seq(pLow, pHigh), exact, maxGridCells), 2)
    df.withColumn(s"${valueCol}_w",
      when(col(valueCol).isNull, lit(null))
        .otherwise(least(greatest(col(valueCol), lo), hi)))
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
      exact: Boolean = true, knownRows: Long = -1L,
      maxGridCells: Long = 50000000L): DataFrame = {
    require(k >= 2, s"quantileBuckets needs k >= 2 buckets, got $k")
    val probs = (1 until k).map(_.toDouble / k)
    // cuts as constant-folded literals (round 16) — see winsorize's note
    val cuts = roundedLits(
      pctValues(df, valueCol, probs, exact, maxGridCells), k - 1)
    val bucket = cuts
      .map(c => when(col(valueCol) >= c, 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn(s"${valueCol}_bucket",
      when(col(valueCol).isNull, lit(null).cast("int"))
        .otherwise(bucket.cast("int")))
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

  /** Per-group z-score normalization: append `{valueCol}_z` =
    * `(x − mean_g) / σ_g` (population σ), 4dp — THE feature-scaling
    * primitive for grouped data (normalize quality scores within each
    * source, latencies within each tenant) where a global z would let the
    * biggest group define "normal" for everyone.
    *
    * Shape: ONE moment aggregate reduces the corpus to |groups| rows of
    * exact 10⁴-fixed-point integers (the Stats/corrMatrix discipline —
    * mean and σ are computed once per group on doubles cast from exactly-
    * agreed atoms in a fixed association); the group frame joins back as a
    * broadcast when it fits (AQE decides), and the z itself is a
    * zero-shuffle codegen'd row projection. Null values and zero-variance
    * groups yield null z.
    */
  def zScoreBy(df: DataFrame, valueCol: String, byCol: String): DataFrame = {
    def fx(c: org.apache.spark.sql.Column) =
      round(c * 10000, 0).cast("decimal(19,0)")
    val g = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(byCol).as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(fx(col(valueCol))).as("__s"),
        sum(fx(col(valueCol)) * fx(col(valueCol)))
          .as("__ss"))
    val nd = col("__n").cast("double")
    val sd = col("__s").cast("double")
    val ssd = col("__ss").cast("double")
    val mean = sd / nd / 10000
    val variance = (nd * ssd - sd * sd) / (nd * nd) / 1e8
    val stats = g.select(col("__g"), mean.as("__m"),
      when(variance > 0.0, sqrt(variance)).as("__sd"))
    df.join(stats, df(byCol) === stats("__g"), "left")
      .withColumn(s"${valueCol}_z",
        when(col(valueCol).isNotNull && col("__sd").isNotNull,
          round((col(valueCol) - col("__m")) / col("__sd"), 4)))
      .drop("__g", "__m", "__sd")
  }

  /** DuckDB mirror of [[zScoreBy]] — generated; same fixed-point atoms,
    * same associations, same guards.
    */
  def zScoreBySql(table: String, valueCol: String, byCol: String): String = {
    val a = s"CAST(round($valueCol * 10000, 0) AS DECIMAL(19,0))"
    s"""WITH g AS (
       |  SELECT $byCol AS grp, COUNT(*) AS n,
       |    CAST(SUM($a) AS DOUBLE) AS s,
       |    CAST(SUM($a * $a) AS DOUBLE) AS ss
       |  FROM $table WHERE $valueCol IS NOT NULL GROUP BY 1
       |), st AS (
       |  SELECT grp, s / CAST(n AS DOUBLE) / 10000 AS m,
       |    CASE WHEN (CAST(n AS DOUBLE) * ss - s * s)
       |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e8 > 0
       |         THEN sqrt((CAST(n AS DOUBLE) * ss - s * s)
       |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e8)
       |    END AS sd
       |  FROM g
       |)
       |SELECT t.*,
       |  CASE WHEN $valueCol IS NOT NULL AND sd IS NOT NULL
       |       THEN round(($valueCol - m) / sd, 4) END AS ${valueCol}_z
       |FROM $table t LEFT JOIN st ON t.$byCol = st.grp""".stripMargin
  }

  /** Robust outlier report via median/MAD — the heavy-tail-safe companion
    * to z-scores (mean/σ are themselves dragged by the outliers they're
    * meant to find; the median absolute deviation is 50%-breakdown
    * robust). One row: `(n, median, mad, n_outliers)` where an outlier is
    * `|x − median| > k · mad` (k ≈ 3 is the classic Hampel cut at ~4.5σ
    * for normal data). Median and MAD are 4dp-rounded — the e10 portable
    * percentile contract — so the flag comparison is engine-exact.
    *
    * Degenerate data (≥50% of values identical → mad = 0) flags EVERY
    * deviating row, the standard MAD caveat — winsorize or widen k there.
    *
    * Two percentile passes by construction (MAD is a median OF deviations
    * from the median); `exact=false` swaps both onto the mergeable GK
    * sketch for the 100 TB path (same switch as [[winsorize]]).
    */
  def madOutliers(df: DataFrame, valueCol: String, k: Double = 3.0,
      exact: Boolean = true, knownRows: Long = -1L,
      maxGridCells: Long = 50000000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    // median and MAD as constant-folded literals (round 16): both
    // percentile passes run eagerly, the deviation scan is a pure
    // projection (no broadcast/BNLJ), and the final frame is ONE aggregate
    // over it — same rows, same dtypes as the crossJoin form (min of a
    // constant = the constant, and null on an empty scan)
    val Seq(med) = roundedLits(
      pctValues(df, valueCol, Seq(0.5), exact, maxGridCells), 1)
    val dev = df
      .where(col(valueCol).isNotNull)
      .select(med.as("__med"), abs(col(valueCol) - med).as("__dev"))
    val Seq(mad) = roundedLits(
      pctValues(dev, "__dev", Seq(0.5), exact, maxGridCells), 1)
    dev.agg(count(lit(1)).as("n"),
        min(col("__med")).as("median"),
        min(mad).as("mad"),
        sum(when(col("__dev") > lit(k) * mad, 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** DuckDB mirror of [[madOutliers]] — generated; same 4dp median/MAD
    * contract, same strict-`>` flag.
    */
  def madOutliersSql(table: String, valueCol: String, k: Double = 3.0): String =
    s"""WITH med AS (
       |  SELECT round(quantile_cont($valueCol, 0.5), 4) AS med FROM $table
       |), dev AS (
       |  SELECT med, abs($valueCol - med) AS d
       |  FROM $table CROSS JOIN med
       |  WHERE $valueCol IS NOT NULL
       |), mad AS (
       |  SELECT round(quantile_cont(d, 0.5), 4) AS mad FROM dev
       |)
       |SELECT COUNT(*) AS n, MIN(med) AS median, MIN(mad) AS mad,
       |  CAST(SUM(CASE WHEN d > $k * mad THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers
       |FROM dev CROSS JOIN mad""".stripMargin
}
