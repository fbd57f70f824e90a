package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift diagnostics for corpus mixing: how far each source's
  * token distribution sits from the corpus mixture — the signal behind
  * mixture reweighting decisions (upweight a source, cap another) and the
  * audit that a new crawl didn't shift the language of a slice.
  *
  * Determinism (Reference scaladoc rules): all counts are exact longs; each
  * KL term fixes its float association
  * `(c_st·N_c) / (N_s·c_ct)` before the ONE libm `ln`, is scaled by the
  * exact count and 1e-6-fixed-pointed, and per-source terms sum as longs —
  * the e29 discipline, so both engines produce bit-identical divergences.
  *
  * Scale: one corpus scan into a (source, token) count table — that table
  * is |sources|×|vocab| (not corpus-sized), so it is persisted and every
  * derived frame (per-token totals, per-source totals, the grand total, the
  * term join) reads the cache. The per-token totals broadcast (vocab-sized),
  * per-source totals broadcast (|sources| rows), so the term computation is
  * shuffle-free after the count pass.
  */
object Drift {

  /** KL(P_source ‖ P_corpus) in nats over unigram distributions, one row
    * per source: `(source, n_tokens, kl_nats)`. The corpus mixture includes
    * the source itself, so every source token has corpus support and the
    * divergence is finite; a source that IS the whole corpus scores 0.
    */
  def sourceTokenKl(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val tk = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val cst = docs
      .select(col(sourceCol).as("source"), explode(tk).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cct = cst.groupBy(col("w")).agg(sum(col("c")).as("ct"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val nc = cct.agg(sum(col("ct")).as("n_c"))
    cst
      .join(broadcast(cct), "w")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(nc))
      .select(col("source"), col("n_s"),
        round(col("c").cast("double") *
          log((col("c").cast("double") * col("n_c")) /
            (col("n_s").cast("double") * col("ct"))), 6).as("term"))
      .groupBy(col("source"), col("n_s"))
      .agg(round(
        sum(round(col("term") * lit(1000000), 0).cast("long")).cast("double")
          / lit(1000000) / col("n_s").cast("double"), 6).as("kl_nats"))
      .select(col("source"), col("n_s").as("n_tokens"), col("kl_nats"))
      .orderBy(col("source"))
  }

  /** Daily volume anomaly scores per event type: each (day, type) count is
    * z-scored against the trailing `lookback` OBSERVED days (a ROWS frame —
    * missing days don't pad the window), needing at least `minPrior` prior
    * days before a score is emitted; a zero-variance history yields null
    * rather than ±∞. The monitoring twin of the forecaster: no model fit,
    * just "is today's volume off its recent distribution".
    *
    * Determinism: daily counts are exact longs; trailing sum / sum-of-
    * squares stay exact under the window; mean/variance/z fix their float
    * association (`ss/cnt - mean·mean`, clamped at 0 against negative
    * epsilon) so both engines agree bit-for-bit, and z rounds at 4dp.
    *
    * Scale: the raw scan aggregates down to |days|×|types| rows in one
    * shuffle with map-side partials; the window pass then runs over that
    * tiny rollup partitioned by type. `n·n·lookback` must stay below 2^63 —
    * daily counts up to ~8·10^8 are safe.
    */
  def dailyAnomalies(events: DataFrame, lookback: Int = 14,
      minPrior: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    val mean = col("s").cast("double") / col("cnt")
    val variance = greatest(
      col("ss").cast("double") / col("cnt") - mean * mean, lit(0.0))
    daily
      .withColumn("cnt", count(col("n")).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"),
        when(col("cnt") >= minPrior, round(mean, 4)).as("mean_trailing"),
        when(col("cnt") >= minPrior && variance > 0,
          round((col("n").cast("double") - mean) / sqrt(variance), 4)).as("z"))
      .orderBy(col("day"), col("event_type"))
  }

  /** DuckDB mirror of [[dailyAnomalies]] — generated from the same
    * lookback/minPrior and the same association order.
    */
  def dailyAnomaliesSql(table: String, lookback: Int = 14,
      minPrior: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
       |  FROM $table GROUP BY 1, 2
       |), win AS (
       |  SELECT day, event_type, n,
       |    COUNT(n) OVER w AS cnt,
       |    CAST(SUM(n) OVER w AS BIGINT) AS s,
       |    CAST(SUM(n*n) OVER w AS BIGINT) AS ss
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING)
       |)
       |SELECT strftime(day, '%Y-%m-%d') AS day, event_type, n,
       |  CASE WHEN cnt >= $minPrior
       |       THEN round(CAST(s AS DOUBLE) / cnt, 4) END AS mean_trailing,
       |  CASE WHEN cnt >= $minPrior AND
       |    GREATEST(CAST(ss AS DOUBLE)/cnt -
       |      (CAST(s AS DOUBLE)/cnt)*(CAST(s AS DOUBLE)/cnt), 0.0) > 0
       |  THEN round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE)/cnt) /
       |    sqrt(GREATEST(CAST(ss AS DOUBLE)/cnt -
       |      (CAST(s AS DOUBLE)/cnt)*(CAST(s AS DOUBLE)/cnt), 0.0)), 4)
       |  END AS z
       |FROM win ORDER BY day, event_type""".stripMargin

  /** DuckDB mirror of [[sourceTokenKl]] — generated so the formula, the
    * association order, and the 1e-6 fixed-point scale cannot drift.
    */
  def sourceTokenKlSql(table: String, textCol: String = "text",
      sourceCol: String = "source"): String =
    s"""WITH toks AS (
       |  SELECT $sourceCol AS source,
       |    unnest(list_filter(string_split_regex(lower(trim($textCol)), '\\s+'),
       |      t -> length(t) > 0)) AS w
       |  FROM $table
       |), cst AS (
       |  SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2
       |), cct AS (
       |  SELECT w, CAST(SUM(c) AS BIGINT) AS ct FROM cst GROUP BY 1
       |), ns AS (
       |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM cst GROUP BY 1
       |), nc AS (
       |  SELECT CAST(SUM(ct) AS BIGINT) AS n_c FROM cct
       |), terms AS (
       |  SELECT s.source, x.n_s,
       |    round(CAST(s.c AS DOUBLE) *
       |      ln((CAST(s.c AS DOUBLE) * t.n_c) / (CAST(x.n_s AS DOUBLE) * c.ct)),
       |      6) AS term
       |  FROM cst s
       |  JOIN cct c ON s.w = c.w
       |  JOIN ns x ON s.source = x.source
       |  CROSS JOIN nc t
       |)
       |SELECT source, n_s AS n_tokens,
       |  round(CAST(SUM(CAST(round(term * 1000000) AS BIGINT)) AS DOUBLE)
       |    / 1000000 / CAST(n_s AS DOUBLE), 6) AS kl_nats
       |FROM terms GROUP BY source, n_s
       |ORDER BY source""".stripMargin

  /** Daily gap filling (time-series resampling): per-series daily counts
    * with every missing calendar day between the series' first and last
    * observation zero-filled — the step that makes [[dailyAnomalies]]'s
    * trailing frames and the forecaster's regular grid honest on sparse
    * streams (an unobserved day IS a zero-count observation, not a hole to
    * silently skip).
    *
    * Scale posture: ONE count shuffle ((series, day) — bounded by
    * series × days, never corpus-sized); the day spine explodes from the
    * |series|-row min/max frame via `sequence()` and the fill join runs on
    * the two bounded frames. Output: (series, day 'yyyy-MM-dd', n).
    */
  def fillDailyGaps(events: DataFrame, seriesCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    // persisted: the spine's min/max pass and the fill join both consume
    // this frame, and stage reuse does NOT deduplicate the two consumers
    // (measured: without the persist the plan scans events twice — the
    // same finding as Collocations' count table). Bounded at series × days.
    val daily = events
      .groupBy(col(seriesCol).as("series"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spine = daily
      .groupBy(col("series"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("series"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("series", "day"), "left")
      .select(col("series"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("series"), col("day"))
  }

  /** Rolling daily MEDIAN volume per series — the robust companion to
    * [[dailyAnomalies]]'s mean/variance z-score (one bad day poisons a
    * trailing mean for `lookback` days; it barely moves the median). Runs
    * over the ZERO-FILLED grid ([[fillDailyGaps]]) so sparse series smooth
    * over their true zero days, with a `window`-row trailing frame
    * (shrinking at the series head, the SQL frame contract). The exact
    * percentile buffers only `window` values per row — bounded, unlike the
    * corpus-percentile case. Output: (series, day, n, med), med
    * 4dp-rounded.
    */
  def rollingDailyMedian(events: DataFrame, window: Int = 7,
      seriesCol: String = "event_type", tsCol: String = "ts"): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("series")).orderBy(col("day"))
      .rowsBetween(-(window - 1), 0)
    fillDailyGaps(events, seriesCol, tsCol)
      .withColumn("med", round(expr("percentile(n, 0.5D)").over(w), 4))
      .orderBy(col("series"), col("day"))
  }

  /** DuckDB mirror of [[rollingDailyMedian]] — generated, same frame. */
  def rollingDailyMedianSql(table: String, window: Int = 7,
      seriesCol: String = "event_type", tsCol: String = "ts"): String =
    s"""WITH filled AS (${fillDailyGapsSql(table, seriesCol, tsCol)})
       |SELECT series, day, n,
       |  round(quantile_cont(n, 0.5) OVER (PARTITION BY series ORDER BY day
       |    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW), 4) AS med
       |FROM filled
       |ORDER BY series, day""".stripMargin

  /** DuckDB mirror of [[fillDailyGaps]] — generated, same spine semantics. */
  def fillDailyGapsSql(table: String, seriesCol: String = "event_type",
      tsCol: String = "ts"): String =
    s"""WITH daily AS (
       |  SELECT $seriesCol AS series, CAST($tsCol AS DATE) AS day, COUNT(*) AS n
       |  FROM $table GROUP BY 1, 2
       |), mm AS (
       |  SELECT series, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
       |), spine AS (
       |  SELECT series, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM mm
       |)
       |SELECT s.series, strftime(s.day, '%Y-%m-%d') AS day,
       |  COALESCE(d.n, 0) AS n
       |FROM spine s LEFT JOIN daily d ON s.series = d.series AND s.day = d.day
       |ORDER BY s.series, s.day""".stripMargin
}
