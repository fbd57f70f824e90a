package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile aggregates with the scale contract made explicit.
  *
  * Spark's exact `percentile` buffers EVERY value of the column in the final
  * aggregation task — exact and cheap on an aggregated or mid-size frame, a
  * guaranteed single-task OOM on a 100 TB fact table. [[exact]] therefore
  * carries a row-count guard: above `maxRows` it refuses with a pointer to
  * [[approx]], Spark's `approx_percentile` (Greenwald–Khanna style sketch,
  * bounded memory, mergeable across partitions — the at-scale default, see
  * SketchSpec for its error-bound contract against the exact answer).
  */
object Percentiles {

  /** One array-form exact `percentile` aggregate per column (ONE sort buffer
    * per column, not one per probability). Output: a single row with an
    * array column `{col}_pcts` per input column, probabilities in order.
    *
    * `maxRows` is the single-task-buffer guard described above. The count
    * that enforces it is metadata-only for a bare parquet scan; for a derived
    * frame (post-join/filter) it computes the input once — pass `knownRows`
    * (e.g. from an upstream count the pipeline already has) to skip that
    * extra pass, at the caller's own accuracy risk.
    */
  def exact(
      df: DataFrame,
      pcts: Seq[(String, Seq[Double])],
      maxRows: Long = 100000000L,
      knownRows: Long = -1L): DataFrame = {
    val n = if (knownRows >= 0) knownRows else df.count()
    require(n <= maxRows,
      s"exact percentile buffers the full column in ONE task: $n rows exceeds " +
        s"maxRows=$maxRows. Use Percentiles.approx (mergeable sketch, bounded " +
        s"memory) at this scale, or raise maxRows deliberately.")
    val aggs = pcts.map { case (c, ps) =>
      expr(s"percentile($c, array(${ps.map(p => s"${p}D").mkString(", ")}))")
        .as(s"${c}_pcts")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The approx twin: same output shape (`{col}_pcts` arrays), computed by
    * `approx_percentile` at the given accuracy (error ≤ 1/accuracy of the
    * rank). Runs with bounded executor memory at any row count.
    */
  def approx(
      df: DataFrame,
      pcts: Seq[(String, Seq[Double])],
      accuracy: Int = 10000): DataFrame = {
    val aggs = pcts.map { case (c, ps) =>
      expr(s"approx_percentile($c, array(${ps.map(p => s"${p}D").mkString(", ")}), $accuracy)")
        .as(s"${c}_pcts")
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** GROUPED exact percentiles: one row per key with the same `{col}_pcts`
    * array shape — per-stratum distribution summaries (per-source length
    * percentiles, per-tenant latency quantiles) in one aggregation job.
    *
    * The buffer guard shifts meaning: exact percentile buffers each
    * GROUP's values in its final-aggregation task, so the contract is the
    * largest group ≤ `maxGroupRows` — enforced with a cheap count-by-key
    * pre-pass (skippable via `knownMaxGroup` when the pipeline already
    * knows its skew). At corpus scale use [[approxBy]]: mergeable sketches,
    * bounded memory per group, no pre-pass.
    */
  def exactBy(
      df: DataFrame,
      keyCol: String,
      pcts: Seq[(String, Seq[Double])],
      maxGroupRows: Long = 100000000L,
      knownMaxGroup: Long = -1L): DataFrame = {
    val biggest =
      if (knownMaxGroup >= 0) knownMaxGroup
      else {
        // max over zero groups is null — an empty input passes the guard
        // (and produces an empty result) instead of NPEing in it
        val r = df.groupBy(col(keyCol)).count().agg(max("count")).head()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    require(biggest <= maxGroupRows,
      s"exactBy buffers each group in one task: largest group $biggest exceeds " +
        s"maxGroupRows=$maxGroupRows. Use Percentiles.approxBy at this scale.")
    val aggs = pcts.map { case (c, ps) =>
      expr(s"percentile($c, array(${ps.map(p => s"${p}D").mkString(", ")}))")
        .as(s"${c}_pcts")
    }
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** EXACT percentiles over the distinct-value GRID — same results as
    * [[exact]] (pinned in SketchSpec), different distributed shape: instead
    * of buffering every VALUE of the column in one final-aggregation task
    * (Spark's `percentile` — the 1.4 s single-task merge the round-15
    * StageProf measured on 600k rows, and the reason [[exact]] carries a
    * row-count guard), group by value (map-side partial aggregation), run
    * ONE single-task cumulative-count window over the GRID (bounded by
    * DISTINCT values, not rows — the `boundedGrid` discipline from
    * ops.Stats), and read each requested rank off the cumulative counts
    * with Spark's own interpolation formula:
    *
    *   position = p · (N − 1);  lower = ⌊position⌋;  higher = ⌈position⌉
    *   value(r) = min v with cum(v) ≥ r + 1
    *   result   = (higher − position)·value(lower)
    *            + (position − lower)·value(higher)     [lower == higher →
    *              value(lower)]
    *
    * — the identical doubles `PercentileBase.getPercentile` produces (same
    * operands, same order), so callers' 4dp-rounded contracts are
    * unchanged. Scale posture: heavy work (scan + per-value counts) is
    * fully parallel; the single task holds one long per DISTINCT value —
    * `maxGridCells` guards that, and the guard count doubles as the grid's
    * cache materialization. Rows with null values are excluded (percentile
    * semantics); an empty/all-null column yields a NULL array like
    * `percentile` itself.
    */
  def exactGrid(
      df: DataFrame,
      pcts: Seq[(String, Seq[Double])],
      maxGridCells: Long = 50000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxGridCells > 0, s"maxGridCells must be positive: $maxGridCells")
    val parts = pcts.map { case (c, ps) =>
      val grid = df.select(col(c).cast("double").as("v"))
        .where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cells = grid.count()
      require(cells <= maxGridCells,
        s"exactGrid: $cells distinct values of '$c' exceed maxGridCells=" +
          s"$maxGridCells (the cumulative window runs in ONE task bounded " +
          "by grid size). Use Percentiles.approx at this cardinality.")
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val g = grid
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
      val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
        val pos = lit(p) * (col("n") - 1L).cast("double")
        val lo = floor(pos)
        val hi = ceil(pos)
        Seq(
          min(when(col("cum").cast("double") >= lo + 1d, col("v"))).as(s"__vl$i"),
          min(when(col("cum").cast("double") >= hi + 1d, col("v"))).as(s"__vh$i"),
          first(pos).as(s"__p$i"), first(lo).as(s"__l$i"),
          first(hi).as(s"__h$i"))
      }
      val interp = ps.indices.map { i =>
        when(col(s"__h$i") === col(s"__l$i"), col(s"__vl$i"))
          .otherwise((col(s"__h$i") - col(s"__p$i")) * col(s"__vl$i") +
            (col(s"__p$i") - col(s"__l$i")) * col(s"__vh$i"))
      }
      g.agg(aggs.head, aggs.tail: _*)
        // zero surviving rows → the aggs are all null → NULL array, the
        // `percentile` empty-input contract
        .select(when(col("__p0").isNull, lit(null))
          .otherwise(array(interp: _*)).as(s"${c}_pcts"))
    }
    parts.reduceLeft((a, b) => a.crossJoin(broadcast(b)))
  }

  /** Grouped approx twin of [[exactBy]] — the 100 TB default. */
  def approxBy(
      df: DataFrame,
      keyCol: String,
      pcts: Seq[(String, Seq[Double])],
      accuracy: Int = 10000): DataFrame = {
    val aggs = pcts.map { case (c, ps) =>
      expr(s"approx_percentile($c, array(${ps.map(p => s"${p}D").mkString(", ")}), $accuracy)")
        .as(s"${c}_pcts")
    }
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
