package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * The reference's train/test split is positional (83/17 by row order,
  * ipynb cell 47 — [[graft.forecast.TrendSeasonForecaster.trainTestSplit]]
  * reproduces it for the forecaster). Positional splits are wrong for a
  * 100 TB corpus: row order depends on file layout, partitioning, and
  * shuffle nondeterminism, so membership changes between runs and leaks
  * across reshards. The scale-correct form is CONTENT-HASH assignment —
  * a pure per-row expression, so it is stable under reruns, repartitions,
  * and engine changes, and it needs no shuffle at all.
  */
object Splits {

  /** Hash bucket in [0, 100) for a row id: the first 4 hex chars of
    * md5(salt ∥ id) as an integer, mod 100. md5 because every engine
    * produces the same lowercase hex (the same reason the e01 oracle uses
    * it), so an assignment computed by Spark, DuckDB, or anything else
    * agrees byte-for-byte — split membership is a property of the DATA,
    * not the execution. 65536 % 100 ≠ 0 leaves buckets 0–35 with 656/65536
    * of the mass and the rest with 655/65536: a ±0.1%-of-a-percentile bias,
    * negligible against real corpus variance (use more hex digits if it
    * ever matters).
    */
  def hashBucket(idCol: org.apache.spark.sql.Column, salt: String = ""): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 4), 16, 10)
      .cast("long") % 100

  /** Deterministic train/val/test assignment: adds `bucket` (long, 0–99)
    * and `split` ('train' | 'val' | 'test') columns. `salt` rotates the
    * assignment without touching the data (e.g. per-experiment splits);
    * the same (id, salt) maps to the same split on any engine, any run,
    * any partitioning. Zero shuffle — a codegen'd per-row projection.
    */
  def splitByHash(df: DataFrame, idCol: String = "doc_id", salt: String = "",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic stratified sampling — the data-MIXING primitive: keep a
    * per-stratum percentage of rows (e.g. downweight one source/language of
    * a training corpus), selected by the same engine-portable md5 bucket as
    * [[splitByHash]]. A row survives iff `bucket < pcts(stratum)` (strata
    * absent from the map fall back to `defaultPct`), so membership is a pure
    * per-row projection: zero shuffle, stable under reruns / repartitions /
    * engine changes, and monotone in the percentage — raising a stratum's
    * weight only ADDS rows, it never swaps the sample (the property that
    * makes mixing-ratio sweeps comparable run-to-run).
    *
    * Percentages are integer percent (1% granularity — the bucket space is
    * 100 wide; use a finer bucket if sub-percent weights ever matter).
    * Keep `salt` distinct from the train/val/test split's salt: with the
    * same salt the sample would be nested inside the low buckets of the
    * split assignment instead of cutting across it independently.
    *
    * Output keeps the original schema plus the `bucket` column (auditable
    * assignment, droppable by the caller).
    */
  def stratifiedSampleByHash(
      df: DataFrame,
      stratumCol: String,
      pcts: Map[String, Int],
      idCol: String = "doc_id",
      defaultPct: Int = 0,
      salt: String = "mix"): DataFrame = {
    require((pcts.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"stratum percentages must be in [0, 100]: $pcts default=$defaultPct")
    val pctCol = pcts.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === lit(k), lit(p)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol), salt))
      .where(col("bucket") < pctCol)
  }

  /** Deterministic EXACT-SIZE uniform sample: the k rows with the smallest
    * md5(salt ∥ id), id as tie-break. The percentage forms above can't hit
    * an exact row count ("give me exactly 100k eval docs"); ranking the
    * whole corpus by the same engine-portable hash can, and keeps their
    * properties: membership is a property of the DATA (stable under reruns,
    * repartitioning, engines), and the sample NESTS monotonically — the
    * k-sample is a strict prefix of the (k+1)-sample, so growing a held-out
    * set never swaps rows already in it.
    *
    * Scale posture: ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    * a bounded k-heap per partition, then a k·partitions merge at the
    * driver; the corpus is never globally sorted and never shuffled
    * (asserted in SplitsSpec). That makes k a DRIVER-memory parameter:
    * the guard refuses past `maxK` (raise it deliberately, or take a
    * percentage split at that scale instead).
    *
    * Output keeps the original schema plus `sample_key` (the hex rank key,
    * auditable and re-derivable from the id alone).
    */
  def sampleExactK(df: DataFrame, k: Int, idCol: String = "doc_id",
      salt: String = "sample", maxK: Int = 10000000): DataFrame = {
    require(k > 0 && k <= maxK,
      s"sampleExactK gathers k rows to the driver: k=$k outside (0, $maxK]. " +
        "Raise maxK deliberately or use splitByHash percentages at this scale.")
    // null ids are excluded: md5(null) is null, and nulls sort FIRST under
    // Spark's ascending order with no deterministic order among themselves —
    // they would occupy the sample nondeterministically
    df.where(col(idCol).isNotNull)
      .withColumn("sample_key", md5(concat(lit(salt), col(idCol).cast("string"))))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }

  /** Deterministic WEIGHTED sample without replacement: k rows selected
    * with probability ∝ `weightCol` via the Gumbel top-k trick (key =
    * ln(w) + Gumbel noise, keep the k largest) — the general form of the
    * DSIR selection ([[graft.ext.LangModel.dsirSample]]), for any positive
    * weight column (quality scores, lengths, LM fluency). The noise is
    * md5-derived ([[graft.ext.LangModel.gumbelE4]] — one shared formula)
    * and ln(w) is 1e-4 fixed-pointed (the e33 round-the-libm-call
    * discipline), so the selected set is a property of the data + salt:
    * identical on any engine, any run, any partitioning. Integer key
    * arithmetic; ties break by id.
    *
    * Rows with null or non-positive weight are excluded (ln undefined) —
    * deliberately loud in the scaladoc rather than silently zero-weighted.
    * Same TakeOrderedAndProject shape and driver-memory guard as
    * [[sampleExactK]]. Output: original row + `logw_e4`, `key_e4`,
    * best-first.
    */
  def weightedSampleK(df: DataFrame, k: Int, weightCol: String,
      idCol: String = "doc_id", salt: String = "wsample",
      maxK: Int = 10000000): DataFrame = {
    require(k > 0 && k <= maxK,
      s"weightedSampleK gathers k rows to the driver: k=$k outside (0, $maxK]. " +
        "Raise maxK deliberately at your own driver's risk.")
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("logw_e4",
        round(log(col(weightCol).cast("double")) * 10000, 0).cast("long"))
      .withColumn("key_e4",
        col("logw_e4") + graft.ext.LangModel.gumbelE4(col(idCol), salt))
      .orderBy(col("key_e4").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic per-group cap — "at most k documents per domain", the
    * anti-concentration control of a corpus mix (one boilerplate-heavy
    * source must not dominate training data). Rows are ranked inside each
    * stratum by md5(salt ∥ id) with the id as tie-break, so the kept set is
    * a uniform, engine-portable pseudo-random sample that is STABLE under
    * reruns and repartitioning, and GROWS MONOTONICALLY with k (raising a
    * cap only adds rows — same property as [[stratifiedSampleByHash]]).
    * One shuffle (the window partition); the rank is bounded work per group
    * member, no group's rows are ever collected.
    */
  def capPerGroup(df: DataFrame, groupCol: String, k: Int,
      idCol: String = "doc_id", salt: String = "cap"): DataFrame = {
    require(k > 0, s"cap must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .drop("__rank")
  }

  /** Quality-ordered per-group cap — "keep the k BEST documents per
    * domain": rows rank inside each group by (`orderCol` DESC, id ASC) and
    * everything past k is dropped, with the surviving rank returned as
    * `rank` (1 = best). The curation semantics real per-domain caps want
    * (keep the longest/cleanest variants); [[capPerGroup]] is the uniform-
    * random cousin, [[graft.ext.Dedup.nearDedupRowsKeepBest]] the
    * per-CLUSTER argmax.
    *
    * Scale shape: a single partitioned window puts a hot group's entire
    * membership in one task (one mega-domain = one straggler), so the cap
    * runs in two EXACT phases: phase 1 ranks within (group, lane) — a
    * deterministic hash split of each group into `salts` lanes — keeping
    * ≤ k per lane; phase 2 ranks the ≤ salts·k survivors per group. The
    * global top-k is always a subset of the union of per-lane top-k, so
    * the result is identical to the single-window form (spec-pinned) while
    * bounding any task to ~max(|group|/salts, salts·k) rows.
    */
  def capPerGroupTop(df: DataFrame, groupCol: String, k: Int,
      orderCol: String, idCol: String = "doc_id", salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0, s"invalid cap: k=$k salts=$salts")
    val W = org.apache.spark.sql.expressions.Window
    val lane = pmod(xxhash64(col(idCol)), lit(salts.toLong))
    val w1 = W.partitionBy(col(groupCol), lane)
      .orderBy(col(orderCol).desc, col(idCol))
    val pre = df.withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= k).drop("__r1")
    val w2 = W.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol))
    pre.withColumn("rank", row_number().over(w2))
      .where(col("rank") <= k)
  }
}
