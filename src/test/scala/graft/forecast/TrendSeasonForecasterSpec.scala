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

  test("trend component is the linear part (no seasonality)") {
    val df = synthetic(365 * 2)
    val model = TrendSeasonForecaster.fit(df)
    val t0 = model.t0
    // slope recovered close to the 0.05/day used in the generator
    val slope = model.trendAt(t0 + 1000) - model.trendAt(t0 + 999)
    assert(math.abs(slope - 0.05) < 0.01, s"slope $slope")
  }
}
