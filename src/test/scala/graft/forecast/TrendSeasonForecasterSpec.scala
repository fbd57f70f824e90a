package graft.forecast

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrendSeasonForecasterSpec extends AnyFunSuite {

  /** Synthetic daily series: linear trend + yearly + weekly seasonality +
    * small deterministic noise — the additive structure the model assumes.
    */
  private def synthetic(nDays: Int) = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val start = java.time.LocalDate.parse("2018-01-01")
    (0 until nDays).map { i =>
      val y = 100.0 + 0.05 * i +
        10.0 * math.sin(2 * math.Pi * i / 365.25) +
        3.0 * math.cos(2 * math.Pi * i / 7.0) +
        0.5 * math.sin(i * 12.9898) // bounded pseudo-noise, deterministic
      (start.plusDays(i.toLong).toString, y)
    }.toDF("ds_s", "y").select(col("ds_s").cast("date").as("ds"), col("y"))
  }

  test("fit + holdout MAPE beats the reference's bar on its own data (0.02)") {
    val df = synthetic(365 * 3)
    val (train, test) = TrendSeasonForecaster.positionalSplit(df, 0.83)
    val model = TrendSeasonForecaster.fit(train)
    val scored = model.transform(test)
    val mape = TrendSeasonForecaster.mape(scored)
    assert(mape < 0.02, s"MAPE $mape >= 0.02")
  }

  test("interval honors its nominal 95% coverage on held-out data") {
    val df = synthetic(365 * 3)
    val (train, test) = TrendSeasonForecaster.positionalSplit(df, 0.83)
    val model = TrendSeasonForecaster.fit(train)
    val scored = model.transform(test)
    val cov = scored
      .agg(avg(when(col("y").between(col("yhat_lower"), col("yhat_upper")), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(cov > 0.80, s"coverage $cov")
  }

  test("makeFutureFrame extends the horizon like make_future_dataframe(periods=365)") {
    val df = synthetic(400)
    val model = TrendSeasonForecaster.fit(df)
    val future = model.makeFutureFrame(SparkTestSession.spark, 400, 365)
    assert(future.count() == 765)
    val scored = model.transform(future)
    assert(scored.columns.toSet
      .intersect(Set("trend", "yhat", "yhat_lower", "yhat_upper")).size == 4)
    // forecast continues the trend: last future yhat > last history yhat
    val first = scored.orderBy(col("ds")).head().getDouble(scored.columns.indexOf("yhat"))
    val last = scored.orderBy(col("ds").desc).head().getDouble(scored.columns.indexOf("yhat"))
    assert(last > first)
  }

  /** Synthetic series with a HARD trend break at day `breakAt` (the shape of
    * the reference's capacity data, which bends post-2000): slope 0.5 before,
    * 3.0 after, plus weekly seasonality.
    */
  private def brokenTrend(nDays: Int, breakAt: Int) = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val start = java.time.LocalDate.parse("2018-01-01")
    (0 until nDays).map { i =>
      val trend = if (i < breakAt) 100.0 + 0.5 * i
                  else 100.0 + 0.5 * breakAt + 3.0 * (i - breakAt)
      val y = trend + 3.0 * math.cos(2 * math.Pi * i / 7.0) +
        0.5 * math.sin(i * 12.9898)
      (start.plusDays(i.toLong).toString, y)
    }.toDF("ds_s", "y").select(col("ds_s").cast("date").as("ds"), col("y"))
  }

  test("changepoints: piecewise trend fits a broken series the global line misses") {
    val df = brokenTrend(1000, breakAt = 400)
    val (train, test) = TrendSeasonForecaster.positionalSplit(df, 0.83)
    // global line (round-1 model): demonstrably misses the break
    val flat = TrendSeasonForecaster.fit(train,
      TrendSeasonForecaster.Config(yearlyOrder = 0))
    val flatMape = TrendSeasonForecaster.mape(flat.transform(test))
    assert(flatMape > 0.02, s"global-line MAPE $flatMape unexpectedly low — test not probative")
    // piecewise trend: hits the reference's own bar on the same series
    val pw = TrendSeasonForecaster.fit(train,
      TrendSeasonForecaster.Config(yearlyOrder = 0, nChangepoints = 10))
    val pwMape = TrendSeasonForecaster.mape(pw.transform(test))
    assert(pwMape < 0.02, s"piecewise MAPE $pwMape >= 0.02 (global was $flatMape)")
    // the trend component itself bends: post-break slope ~3.0, pre-break ~0.5
    val t0 = pw.t0
    val preSlope = pw.trendAt(t0 + 200) - pw.trendAt(t0 + 199)
    val postSlope = pw.trendAt(t0 + 700) - pw.trendAt(t0 + 699)
    assert(math.abs(preSlope - 0.5) < 0.2, s"pre-break slope $preSlope")
    assert(math.abs(postSlope - 3.0) < 0.3, s"post-break slope $postSlope")
  }

  test("changepoints default to none: round-1 single-line behavior is unchanged") {
    val df = synthetic(365 * 2)
    val m = TrendSeasonForecaster.fit(df)
    assert(m.changepoints.isEmpty)
    assert(m.beta.length == 2 + 2 * 3 + 2 * 3)
  }

  test("positionalSplit refuses a frame above its single-task sort guard") {
    val df = synthetic(100)
    intercept[IllegalArgumentException] {
      TrendSeasonForecaster.positionalSplit(df, 0.83, maxRows = 50)
    }
  }

  test("trend component is the linear part (no seasonality)") {
    val df = synthetic(365 * 2)
    val model = TrendSeasonForecaster.fit(df)
    val t0 = model.t0
    // slope recovered close to the 0.05/day used in the generator
    val slope = model.trendAt(t0 + 1000) - model.trendAt(t0 + 999)
    assert(math.abs(slope - 0.05) < 0.01, s"slope $slope")
  }

  test("decompEval twin clears the same MAPE bar as the OLS model on planted trend+weekly data") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // events whose daily volume is exactly trend + day-of-week effect: the
    // additive structure BOTH models assume. 8 full train weeks (a balanced
    // dow×trend design — a partial week correlates the weekly pattern with
    // t and biases the OLS slope on BOTH models) + a 7-day holdout.
    val start = java.time.LocalDate.parse("2024-03-01")
    def dailyN(i: Int): Int = {
      val dow = ((start.plusDays(i.toLong).toEpochDay + 4) % 7).toInt
      1000 + 4 * i + (if (dow == 0 || dow == 6) -150 else 40)
    }
    val events = (0 until 63).flatMap { i =>
      val ts = java.sql.Timestamp.valueOf(start.plusDays(i.toLong).atTime(12, 0))
      Seq.fill(dailyN(i))(ts)
    }.toDF("ts")
    val cutoff = start.plusDays(56).toString
    val got = TrendSeasonForecaster.decompEval(events, cutoff).collect()
    // 7 holdout days, mape constant across rows, and the decomposition
    // nails the exactly-additive series
    assert(got.length == 7)
    val mapes = got.map(_.getAs[Double]("mape")).distinct
    assert(mapes.length == 1)
    assert(mapes.head < 0.02, s"decomp MAPE ${mapes.head} >= 0.02")
    // per-row internal consistency: ape = |y - yhat| / y at 6dp
    got.foreach { r =>
      val (y, yhat, ape) = (r.getAs[Long]("y"), r.getAs[Double]("yhat"),
        r.getAs[Double]("ape"))
      val expect = BigDecimal(math.abs(y.toDouble - yhat) / y.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(ape - expect) < 1e-12, s"ape $ape != $expect")
    }
    // the Prophet-class OLS model on the same daily series clears the same
    // bar — the two evaluation paths agree on what a good fit is
    val daily = (0 until 56)
      .map(i => (start.plusDays(i.toLong).toString, dailyN(i).toDouble))
      .toDF("ds_s", "y").select(col("ds_s").cast("date").as("ds"), col("y"))
    val m = TrendSeasonForecaster.fit(daily,
      TrendSeasonForecaster.Config(yearlyOrder = 0, weeklyOrder = 3))
    val ho = (56 until 63)
      .map(i => (start.plusDays(i.toLong).toString, dailyN(i).toDouble))
      .toDF("ds_s", "y").select(col("ds_s").cast("date").as("ds"), col("y"))
    val olsMape = TrendSeasonForecaster.mape(m.transform(ho))
    assert(olsMape < 0.02, s"OLS MAPE $olsMape >= 0.02")
  }
}
