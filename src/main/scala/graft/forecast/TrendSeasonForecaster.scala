package graft.forecast

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additive trend + Fourier-seasonality forecaster with uncertainty
  * intervals and a MAPE harness (SURVEY.md §2.d F1–F4) — the capability of
  * the reference's Prophet stage (ipynb cells 13-18), re-implemented from
  * the published model (Taylor & Letham, "Forecasting at Scale", 2017):
  *
  *   y(t) = g(t) + s(t) + ε,  s(t) = Σ_k a_k cos(2πkt/P) + b_k sin(2πkt/P)
  *   for P ∈ {365.25, 7}
  *
  * g is the paper's §3.1 piecewise-linear trend: `nChangepoints` knots laid
  * over the first `changepointRange` of the observed points (Prophet's
  * default grid), each contributing a continuous hinge basis max(0, t−s_j)
  * whose coefficient is the slope CHANGE at s_j. `nChangepoints = 0` (the
  * default) degenerates to the single global line. Fit is ordinary least
  * squares over [1, t, hinges…, Fourier…] — the L2 analogue of Prophet's
  * Laplace (L1) changepoint prior; the grid and continuity construction are
  * the paper's, the sparsity prior is relaxed to ridge (documented
  * difference). Acceptance mirrors the reference's own evaluation: a MAPE
  * bound on a held-out split (0.02 on its data, PDF p.4), not coefficient
  * equality with Stan's MAP estimates (SURVEY.md §7 risk 3).
  *
  * Scale posture: the input series is an already-aggregated daily frame
  * (thousands of rows even for decades of data), so the OLS solve is a
  * driver-side O(n·p²) normal-equations pass — the distributed work is the
  * upstream aggregation (see q15_daily_series). Prediction is pushed back
  * into Spark as pure column arithmetic with the β vector inlined as
  * literals: codegen'd, executor-parallel, no UDF.
  */
object TrendSeasonForecaster {

  final case class Config(
      yearlyOrder: Int = 3,
      weeklyOrder: Int = 3,
      intervalWidth: Double = 0.95,
      nChangepoints: Int = 0,
      changepointRange: Double = 0.8)

  /** Fitted model: β over [1, t, hinge(t−s_j)…, yearly sin/cos…, weekly
    * sin/cos…] with t in days since `t0` (epoch days) and `changepoints` the
    * fitted knot offsets s_j, plus residual quantiles for intervals.
    */
  final case class Model(
      config: Config,
      t0: Long,
      beta: Array[Double],
      residLo: Double,
      residHi: Double,
      changepoints: Array[Double] = Array.empty) {

    private def designRow(tDays: Double): Array[Double] =
      Model.designRow(config, changepoints, tDays)

    def predictAt(epochDay: Long): Double = {
      val x = designRow((epochDay - t0).toDouble)
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * beta(i); i += 1 }
      s
    }

    /** Trend-only component (Prophet's `trend` output column): base line
      * plus every hinge's slope change accumulated past its knot.
      */
    def trendAt(epochDay: Long): Double = {
      val t = (epochDay - t0).toDouble
      var g = beta(0) + beta(1) * t
      var j = 0
      while (j < changepoints.length) {
        g += beta(2 + j) * math.max(0.0, t - changepoints(j)); j += 1
      }
      g
    }

    /** Spark-side prediction: adds `trend`, `yhat`, `yhat_lower`,
      * `yhat_upper` to a frame with a date column `dsCol` — β and the knots
      * inlined as literals, evaluated per-row in codegen (F3).
      */
    def transform(df: DataFrame, dsCol: String = "ds"): DataFrame = {
      val t = datediff(col(dsCol), lit(java.time.LocalDate.ofEpochDay(t0).toString)).cast("double")
      var trend: Column = lit(beta(0)) + lit(beta(1)) * t
      var i = 2
      for (s <- changepoints) {
        trend = trend + lit(beta(i)) * greatest(t - lit(s), lit(0.0)); i += 1
      }
      var yhat: Column = trend
      for (k <- 1 to config.yearlyOrder) {
        val w = 2.0 * math.Pi * k / 365.25
        yhat = yhat + lit(beta(i)) * cos(t * w); i += 1
        yhat = yhat + lit(beta(i)) * sin(t * w); i += 1
      }
      for (k <- 1 to config.weeklyOrder) {
        val w = 2.0 * math.Pi * k / 7.0
        yhat = yhat + lit(beta(i)) * cos(t * w); i += 1
        yhat = yhat + lit(beta(i)) * sin(t * w); i += 1
      }
      df.withColumn("trend", trend)
        .withColumn("yhat", yhat)
        .withColumn("yhat_lower", yhat + lit(residLo))
        .withColumn("yhat_upper", yhat + lit(residHi))
    }

    /** `make_future_dataframe(periods, freq='D')` counterpart (F2):
      * history ∪ future daily ds rows, generated distributed via
      * spark.range → date_add.
      */
    def makeFutureFrame(spark: SparkSession, historyDays: Int, periods: Int): DataFrame = {
      val start = java.time.LocalDate.ofEpochDay(t0).toString
      spark.range(0, historyDays.toLong + periods)
        .select(date_add(lit(start).cast("date"), col("id").cast("int")).as("ds"))
    }
  }

  object Model {
    private[forecast] def designRow(
        config: Config, changepoints: Array[Double], tDays: Double): Array[Double] = {
      val p = 2 + changepoints.length + 2 * config.yearlyOrder + 2 * config.weeklyOrder
      val x = new Array[Double](p)
      x(0) = 1.0; x(1) = tDays
      var i = 2
      var j = 0
      while (j < changepoints.length) {
        x(i) = math.max(0.0, tDays - changepoints(j)); i += 1; j += 1
      }
      for (k <- 1 to config.yearlyOrder) {
        val w = 2.0 * math.Pi * k * tDays / 365.25
        x(i) = math.cos(w); x(i + 1) = math.sin(w); i += 2
      }
      for (k <- 1 to config.weeklyOrder) {
        val w = 2.0 * math.Pi * k * tDays / 7.0
        x(i) = math.cos(w); x(i + 1) = math.sin(w); i += 2
      }
      x
    }
  }

  /** F1: fit on a (ds date, y double) frame. Collects the aggregated series
    * (small by construction) and solves the normal equations.
    */
  def fit(df: DataFrame, config: Config = Config(),
      dsCol: String = "ds", yCol: String = "y"): Model = {
    val rows = df.select(
        datediff(col(dsCol), lit("1970-01-01").cast("date")).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .na.drop()
      .orderBy(col("t"))
      .collect()
    require(rows.length >= 3, s"need >=3 points, got ${rows.length}")
    val t0 = rows.head.getLong(0)
    val ts = rows.map(r => (r.getLong(0) - t0).toDouble)
    val ys = rows.map(_.getDouble(1))

    // Prophet's changepoint grid (§3.1 / prophet's set_changepoints):
    // nChangepoints knots evenly over the first changepointRange of the
    // OBSERVED points (index space, so irregular sampling follows the data),
    // skipping index 0 — a hinge at t=0 is collinear with the base line.
    val cps: Array[Double] =
      if (config.nChangepoints <= 0) Array.empty
      else {
        val hi = math.max(1, math.round(config.changepointRange * (ts.length - 1)).toInt)
        // clamp to >= 1: with nChangepoints+1 > 2*hi the grid rounds to index
        // 0, whose hinge max(0, t-0) = t is collinear with the linear term
        // (singular normal equations); .distinct folds the duplicates the
        // clamp creates on such short series
        (1 to config.nChangepoints)
          .map(j => ts(math.max(1, math.round(j.toDouble * hi / (config.nChangepoints + 1)).toInt)))
          .distinct.toArray
      }

    val p = 2 + cps.length + 2 * config.yearlyOrder + 2 * config.weeklyOrder
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var n = 0
    while (n < ts.length) {
      val x = Model.designRow(config, cps, ts(n))
      var i = 0
      while (i < p) {
        xty(i) += x(i) * ys(n)
        var j = 0
        while (j < p) { xtx(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
      n += 1
    }
    // ridge epsilon keeps the solve stable when the series is shorter than
    // a full seasonal period (collinear Fourier columns)
    var d = 0
    while (d < p) { xtx(d)(d) += 1e-8; d += 1 }
    val beta = solve(xtx, xty)

    val resid = ts.indices.map { idx =>
      val x = Model.designRow(config, cps, ts(idx))
      var s = 0.0; var i = 0
      while (i < p) { s += x(i) * beta(i); i += 1 }
      ys(idx) - s
    }.sorted
    val alpha = (1.0 - config.intervalWidth) / 2.0
    def quantile(q: Double): Double =
      resid(math.min(resid.length - 1, math.max(0, (q * (resid.length - 1)).round.toInt)))
    Model(config, t0, beta, quantile(alpha), quantile(1.0 - alpha), cps)
  }

  /** Gaussian elimination with partial pivoting (p ≤ ~20 → trivial cost). */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val p = b.length
    val m = a.map(_.clone())
    val y = b.clone()
    var col0 = 0
    while (col0 < p) {
      var piv = col0
      var r = col0 + 1
      while (r < p) { if (math.abs(m(r)(col0)) > math.abs(m(piv)(col0))) piv = r; r += 1 }
      val tmp = m(col0); m(col0) = m(piv); m(piv) = tmp
      val ty = y(col0); y(col0) = y(piv); y(piv) = ty
      require(math.abs(m(col0)(col0)) > 1e-12, "singular design matrix")
      r = col0 + 1
      while (r < p) {
        val f = m(r)(col0) / m(col0)(col0)
        var c = col0
        while (c < p) { m(r)(c) -= f * m(col0)(c); c += 1 }
        y(r) -= f * y(col0)
        r += 1
      }
      col0 += 1
    }
    val beta = new Array[Double](p)
    var i = p - 1
    while (i >= 0) {
      var s = y(i)
      var j = i + 1
      while (j < p) { s -= m(i)(j) * beta(j); j += 1 }
      beta(i) = s / m(i)(i)
      i -= 1
    }
    beta
  }

  /** F4: MAPE as a distributed aggregate — `avg(abs((y-yhat)/y))`, the
    * reference's holdout metric (= 0.02 on its data).
    */
  def mape(df: DataFrame, yCol: String = "y", yhatCol: String = "yhat"): Double =
    df.where(col(yCol) =!= 0)
      .agg(avg(abs((col(yCol) - col(yhatCol)) / col(yCol))))
      .head().getDouble(0)

  /** P8: the reference's positional 83/17 train/test split (ipynb cell 13) —
    * ordered row_number window vs the fraction cut.
    *
    * The unpartitioned ORDER BY window is a SINGLE-TASK global sort — the
    * right tool for the already-aggregated series this API is documented
    * for, and a one-task straggler on anything bigger. `maxRows` makes that
    * contract explicit: the split refuses a frame above the limit instead of
    * silently funneling a fact table through one executor thread. For large
    * frames, split on the value domain instead (a `WHERE ds < cutoff` range
    * predicate prunes at the scan and never sorts).
    */
  def positionalSplit(df: DataFrame, frac: Double = 0.83,
      orderCol: String = "ds", maxRows: Long = 1000000L): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
    val n = df.count()
    require(n <= maxRows,
      s"positionalSplit sorts in ONE task (global unpartitioned window): $n rows " +
        s"exceeds maxRows=$maxRows. Aggregate the series first, or split on a " +
        s"value-range predicate over '$orderCol' instead.")
    val cut = (n * frac).toLong
    val numbered = df.withColumn("__rn", row_number().over(w))
    (numbered.where(col("__rn") <= cut).drop("__rn"),
      numbered.where(col("__rn") > cut).drop("__rn"))
  }
}
