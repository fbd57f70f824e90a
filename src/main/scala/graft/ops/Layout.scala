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
