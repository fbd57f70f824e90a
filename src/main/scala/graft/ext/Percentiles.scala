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
    * row-count guard), group by value (map-side partial aggregation —
    * fully parallel), range-partition the DISTINCT-VALUE grid, and turn the
    * cumulative count into a DISTRIBUTED two-pass prefix sum (round 16;
    * guide §2/§5): pass 1 collects the per-range subtotals (one long per
    * partition), pass 2 adds each partition's broadcast prefix offset to a
    * PARTITION-LOCAL running sum — no single-task window anywhere; the
    * largest task holds ~cells/parallelism grid rows. Each requested rank
    * is read off the cumulative counts with Spark's own interpolation
    * formula:
    *
    *   position = p · (N − 1);  lower = ⌊position⌋;  higher = ⌈position⌉
    *   value(r) = min v with cum(v) ≥ r + 1
    *   result   = (higher − position)·value(lower)
    *            + (position − lower)·value(higher)     [lower == higher →
    *              value(lower)]
    *
    * — the identical doubles `PercentileBase.getPercentile` produces (same
    * operands, same order), so callers' 4dp-rounded contracts are
    * unchanged.
    *
    * EAGER (round 16): the grid jobs run at CALL time and the returned
    * frame is one literal-backed row — so the per-column scratch cache
    * lives only inside this call (persist → compute → unpersist; nothing
    * outlives the call, and repeated invocations recompute from source),
    * and no crossJoin/broadcast appears in the caller's plan. `maxGridCells`
    * still guards total grid size (executor memory for the cached grid +
    * the rank aggregate); per-task state is now `cells / parallelism`.
    * Rows with null values are excluded (percentile semantics); an
    * empty/all-null column yields a NULL array like `percentile` itself.
    */
  def exactGrid(
      df: DataFrame,
      pcts: Seq[(String, Seq[Double])],
      maxGridCells: Long = 50000000L): DataFrame = {
    require(maxGridCells > 0, s"maxGridCells must be positive: $maxGridCells")
    val outCols = pcts.map { case (c, ps) =>
      exactGridValues(df, c, ps, maxGridCells) match {
        case None => lit(null).cast("array<double>").as(s"${c}_pcts")
        case Some(vs) => array(vs.map(v => lit(v)): _*).as(s"${c}_pcts")
      }
    }
    df.sparkSession.range(1).select(outCols: _*)
  }

  /** Value-level core of [[exactGrid]]: the exact percentile doubles for
    * one column (None on an empty/all-null column). Runs the distributed
    * grid jobs eagerly — see [[exactGrid]] for the shape and the exactness
    * argument. Exposed so value-level callers (ops.Normalize) can embed the
    * results as literals instead of re-joining a one-row frame.
    */
  private[graft] def exactGridValues(df: DataFrame, c: String,
      ps: Seq[Double], maxGridCells: Long = 50000000L): Option[Seq[Double]] = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    // range partitioning makes partition id a monotone function of v, so a
    // partition-local running count + the previous partitions' subtotal is
    // the GLOBAL cumulative count. pid is frozen by the persist (the
    // partitioner is built once in the RDD lineage, so even a recomputed
    // block keeps its id); unpersisted before returning — nothing escapes.
    val staged = df.select(col(c).cast("double").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .repartitionByRange(par, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cells = staged.count()
      require(cells <= maxGridCells,
        s"exactGrid: $cells distinct values of '$c' exceed maxGridCells=" +
          s"$maxGridCells (the grid is cached and rank-scanned whole). " +
          "Use Percentiles.approx at this cardinality.")
      if (cells == 0L) None
      else {
        // pass 1: per-range subtotals → driver prefix offsets (par longs)
        val subs = staged.groupBy(col("pid")).agg(sum(col("cnt")).as("t"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val offs = new Array[Long](par)
        var acc = 0L
        for (i <- 0 until par) { offs(i) = acc; acc += subs.getOrElse(i, 0L) }
        val n = acc
        // Spark's PercentileBase rank decomposition per probability
        val ranks = ps.map { q =>
          val pos = q * (n - 1).toDouble
          (pos, math.floor(pos), math.ceil(pos))
        }
        val need = ranks
          .flatMap { case (_, lo, hi) => Seq(lo.toLong + 1L, hi.toLong + 1L) }
          .distinct.sorted
        // pass 2: partition-local running sum + broadcast prefix offset =
        // global cum; value(r) = min v with cum(v) ≥ r, one conditional min
        // per needed rank in a single parallel aggregate
        val wLoc = Window.partitionBy(col("pid")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offset = element_at(array(offs.map(o => lit(o)): _*), col("pid") + 1)
        val withCum = staged.select(col("v"),
          (sum(col("cnt")).over(wLoc) + offset).as("cum"))
        val aggs = need.map(r => min(when(col("cum") >= r, col("v"))).as(s"r$r"))
        val row = withCum.agg(aggs.head, aggs.tail: _*).head()
        val byRank = need.zipWithIndex.map { case (r, i) =>
          r -> row.getDouble(i)
        }.toMap
        Some(ranks.map { case (pos, lo, hi) =>
          val vl = byRank(lo.toLong + 1L)
          if (lo == hi) vl
          else (hi - pos) * vl + (pos - lo) * byRank(hi.toLong + 1L)
        })
      }
    } finally staged.unpersist(false)
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
