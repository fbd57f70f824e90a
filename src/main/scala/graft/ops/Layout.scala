package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and skew utilities — the knobs that matter at 100 TB
  * (builder prompt: bucketing for co-located joins, salting for skew).
  */
object Layout {

  /** Write a frame as a bucketed+sorted managed table. Two tables bucketed
    * the same way on the join key co-locate: the sort-merge join reads both
    * sides bucket-by-bucket with NO exchange — at 1000 executors that
    * removes the largest shuffle in a fact-fact join. (Verified in
    * LayoutSpec: the joined plan contains no Exchange operator.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Repartition-then-write partitioned parquet: directory pruning makes
    * `WHERE pcol = v` skip files entirely (partition pruning at the source).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write.partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)

  /** Round-robin repartition iff the frame plans FEWER partitions than
    * `target` (default: the cluster's parallelism) — repairs compute
    * parallelism over under-split inputs. A parquet file with a single row
    * group yields a single scan task no matter what
    * `spark.sql.files.maxPartitionBytes` says (byte-range splits can't
    * divide one row group), so every downstream map-side stage — codegen'd
    * hashing, fixed-point moment aggregation, n-gram explodes — runs on one
    * core until the first exchange. One cheap round-robin shuffle restores
    * full-width compute (measured 3-6x on the heavy declared queries over
    * the single-row-group testdata). A well-split input at real scale has
    * partitions >> cores and is left untouched — the check makes this a
    * no-op exactly where the repartition would be pure waste.
    */
  def repairScanParallelism(df: DataFrame, target: Int = 0): DataFrame = {
    val t = if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < t) df.repartition(t) else df
  }

  /** Salted join for skewed keys: explode the small side into `salt`
    * replicas, scatter the big side's hot keys across them, join on
    * (key, salt). Turns one straggler task per hot key into `salt` even
    * tasks. AQE's skew-join handles moderate skew automatically; salting is
    * for the pathological keys AQE can't split (e.g. a single null-heavy
    * key in a sort-merge join).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    // join types where unmatched/semi SMALL-side rows surface would return
    // one row per salt replica (salt× inflation) — only big-side-preserving
    // types are sound with an exploded small side
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti join types, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Incremental upsert into a partitioned parquet dataset: DYNAMIC
    * partition overwrite replaces only the partitions present in `df`,
    * leaving every other partition's files untouched — the idempotent
    * "re-land this day/source" primitive of an incremental pipeline. (Static
    * overwrite mode would truncate the whole dataset first; at 100 TB that
    * difference is the whole job.)
    */
  def upsertPartitions(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(col(partitionCol))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Compact a parquet dataset into ~`targetFileBytes` files at `dest`:
    * the small-file hygiene pass (a 100 TB table accreted from thousands of
    * incremental loads ends up with millions of KB-scale files whose
    * open/footer costs dominate scans). File count is computed from the
    * ACTUAL on-disk bytes via the Hadoop FS, not row counts, so compression
    * ratios carry over. Returns (input files, output files).
    */
  def compactTo(spark: SparkSession, src: String, dest: String,
      targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listFiles(new org.apache.hadoop.fs.Path(src), true)
    var nIn = 0
    var bytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (f.getPath.getName.endsWith(".parquet")) { nIn += 1; bytes += f.getLen }
    }
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(src).repartition(nOut).write.mode("overwrite").parquet(dest)
    (nIn, nOut)
  }

  /** Morton (Z-order) interleave of `cols`, each already normalized to an
    * integer in [0, 2^bits): bit i of column j lands at position
    * `i * k + j` of the z-value. Pure static-shift codegen (`shiftleft` /
    * `bitwiseOR` fold — bits·k terms, no UDF, no shuffle).
    * `bits * cols.size` must fit in a signed long (≤ 63).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 63,
      s"z-value needs 1+ columns and bits*k <= 63 (got ${cols.size} cols × $bits bits)")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** `df` plus a `__z` column: each listed (numeric) column min/max-scaled
    * to [0, 2^bits) — the corpus-wide min/max reduce to ONE broadcast row —
    * then Morton-interleaved with [[zValue]]. Constant columns scale to 0
    * (they carry no ordering information either way).
    */
  def withZValue(df: DataFrame, zCols: Seq[String], bits: Int = 16): DataFrame = {
    val statsCols = zCols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__min_$c"), max(col(c).cast("double")).as(s"__max_$c")))
    val stats = df.agg(statsCols.head, statsCols.tail: _*)
    val maxVal = (1L << bits) - 1
    val scaled = zCols.map { c =>
      val span = greatest(col(s"__max_$c") - col(s"__min_$c"), lit(java.lang.Double.MIN_NORMAL))
      least(lit(maxVal),
        floor((col(c).cast("double") - col(s"__min_$c")) / span * maxVal + 0.5)).cast("long")
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(scaled, bits))
      .drop(zCols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Z-ordered parquet write: range-partition by the z-value into `nFiles`
    * tasks and sort within each, so every output file covers a compact
    * hyper-rectangle of the `zCols` space. A predicate on ANY of the
    * clustered columns then skips most files via their min/max footer stats
    * — unlike a linear `orderBy(x)` layout, which clusters x but smears
    * every other column across all files. This is the same layout trick
    * Delta/Iceberg OPTIMIZE ZORDER applies, expressed as plain Spark
    * repartitionByRange + sortWithinPartitions.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      nFiles: Int, bits: Int = 16): Unit =
    withZValue(df, zCols, bits)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** True iff the physical plan of `df` contains no SHUFFLE exchange
    * (`Exchange hashpartitioning`/`rangepartitioning`) — the co-location
    * check used by tests and plan reviews. BroadcastExchange is allowed:
    * broadcasting a dimension is the desired plan, not a data shuffle.
    */
  def hasNoShuffleExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning")
  }
}
