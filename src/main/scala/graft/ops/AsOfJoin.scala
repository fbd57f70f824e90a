package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins, composed from primitives
  * with scale-correct shapes (builder-prompt preference (a): compose
  * existing ops when semantics allow — a custom LogicalPlan/Strategy would
  * buy nothing here, the composed plans already shuffle once).
  */
object AsOfJoin {

  /** As-of (backward) join: for every left row, attach the single right
    * row's payload with the greatest `rightTime` ≤ `leftTime` for the same
    * key — "the latest quote at or before the trade".
    *
    * Shape: union both sides tagged, ONE shuffle on the key, per-key
    * time-ordered window with `last(_, ignoreNulls)` carrying the most
    * recent right payload forward onto left rows. No range cross-product,
    * no per-row lookup; cost = sort within key partitions — the standard
    * scalable as-of formulation. Optional `toleranceSeconds` voids matches
    * older than the horizon.
    *
    * `payloadCols` must not collide with left column names.
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, payloadCols,
      toleranceSeconds, forward = false)

  /** As-of (forward) join: for every left row, attach the single right
    * row's payload with the SMALLEST `rightTime` ≥ `leftTime` for the same
    * key — "the next quote at or after the trade" (pandas merge_asof
    * direction='forward'). Same one-shuffle union+window shape as
    * [[asofBackward]], traversed in descending time.
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    asofImpl(left, right, key, leftTime, rightTime, payloadCols,
      toleranceSeconds, forward = true)

  private def asofImpl(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      payloadCols: Seq[String],
      toleranceSeconds: Option[Long],
      forward: Boolean): DataFrame = {
    require(payloadCols.forall(c => !left.columns.contains(c)),
      "payload columns must not collide with left columns")
    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val r2 = right.select(
      col(key) +: col(rightTime).as("__t") +: lit(1).as("__side") +:
        payloadCols.map(col): _*)
    // traversal order: backward walks time ascending (carry the latest
    // right seen so far), forward walks it descending (carry the earliest
    // right still ahead). Either way, right rows with __side=1 sort FIRST
    // at an equal timestamp via __side desc: a quote at exactly the trade
    // time matches in both directions.
    val w = Window.partitionBy(col(key))
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c",
        last(when(col("__side") === 1, col(c)), ignoreNulls = true).over(w))
    }.withColumn("__match_t",
      last(when(col("__side") === 1, col("__t")), ignoreNulls = true).over(w))
    val leftOnly = carried.where(col("__side") === 0)
    val gap =
      if (forward) col("__match_t").cast("long") - col("__t").cast("long")
      else col("__t").cast("long") - col("__match_t").cast("long")
    val bounded = toleranceSeconds match {
      case Some(sec) =>
        payloadCols.foldLeft(leftOnly) { (df, c) =>
          df.withColumn(s"__asof_$c", when(gap <= sec, col(s"__asof_$c")))
        }
      case None => leftOnly
    }
    payloadCols.foldLeft(bounded) { (df, c) =>
      df.drop(c).withColumnRenamed(s"__asof_$c", c)
    }.drop("__side", "__t", "__match_t")
  }

  /** Point-in-interval range join: attach every interval [startCol, endCol)
    * containing the point. Intervals are binned to fixed-width buckets
    * (explode over the covered bins) and points join their bin — an
    * equi-join shuffle instead of a cross product; the exact containment
    * predicate filters bin-mates. Pick `binWidth` ≈ the typical interval
    * length: wider bins → fewer replicas but more false bin-mates.
    */
  def rangeJoinBinned(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(startCol).cast("long") / binWidth).cast("long"),
        floor(col(endCol).cast("long") / binWidth).cast("long"))))
    p.join(iv, Seq("__bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join — the third temporal join beside as-of
    * and point-in-interval: every (left, right) pair of half-open intervals
    * with `lStart < rEnd && rStart < lEnd` (the concurrency primitive:
    * overlapping sessions, maintenance windows crossing user activity,
    * SCD2 validity × campaign flight ranges).
    *
    * Shape: both sides explode to the fixed-width bins they cover and pairs
    * meet by bin equi-join — a shuffle join, never a cross product.
    * Multi-bin double counting is eliminated WITHOUT a distinct: a
    * qualifying pair is emitted only in the FIRST bin of its overlap
    * region (`floor(max(lStart, rStart) / binWidth)`), which both rows
    * provably cover. Pick `binWidth` ≈ the typical interval length: wider
    * bins → fewer replicas but more false bin-mates.
    *
    * Column names must be disjoint between the two inputs (the join keeps
    * both sides' columns).
    */
  def intervalOverlapBinned(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalOverlapBinned: left/right column names must be disjoint")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(
          floor(col(s).cast("long") / binWidth).cast("long"),
          floor(col(e).cast("long") / binWidth).cast("long"))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === floor(
          greatest(col(lStart), col(rStart)).cast("long") / binWidth)
          .cast("long"))
      .drop("__bin")
  }
}
