package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Bloom-filter join pruning — the shuffle reducer for the sort-merge
  * regime. A broadcast join already avoids shuffling the big side when the
  * dimension fits in memory; when it does NOT (a 10⁸-row filtered fact used
  * as a semi-join key set), both sides of a shuffled join pay a full
  * exchange. A Bloom filter of the small side's keys is megabytes where the
  * key set is gigabytes, so the big side can be filtered BEFORE its
  * exchange: rows whose key cannot possibly join never enter the shuffle.
  * False positives are removed by the join itself — result equality is
  * exact for inner and left-semi joins (the pruned side only ever LOSES
  * non-matching rows).
  *
  * Built on the same Catalyst machinery Spark's adaptive runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects —
  * `BloomFilterAggregate` to build distributed, `might_contain` to probe,
  * both whole-stage-codegen'd, keys hashed with `xxhash64` on both sides so
  * build and probe agree. The explicit operator exists because the runtime
  * rule only fires inside one query's plan: a materialized bloom
  * ([[bloomOf]] bytes) can be built once and reused across queries, stages,
  * or pipeline runs (e.g. "filter today's 100 TB increment by last month's
  * customer keys") — a cross-query runtime filter the optimizer cannot see.
  */
object BloomPrune {

  private def mightContainExpr(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Distributed Bloom-filter build over `df`'s `key` values: one partial
    * aggregate per partition, merged to a single serialized filter
    * (`expectedItems`/`fpp` size the bit array — ~7.3 bits/item at 3% fpp).
    * The returned bytes are engine-opaque but stable: persist them next to
    * a snapshot and later increments can prune against it without re-reading
    * the snapshot.
    */
  def bloomOf(df: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"invalid bloom sizing: items=$expectedItems fpp=$fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(key)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.agg(ColumnBridge.column(agg).as("bloom")).collect().head
    row.getAs[Array[Byte]]("bloom")
  }

  /** Codegen'd membership probe against a materialized bloom: true when the
    * key MAY be in the build set (false positives at the configured fpp),
    * false only when it is definitely absent. Null keys probe as null
    * (filtered out when used as a predicate) — matching equi-join semantics,
    * which never match null keys either.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    mightContainExpr(bloom, key)

  /** Equi-join with the big side bloom-pruned before its shuffle. Only
    * `inner` and `left_semi` are accepted: for those, pre-filtering the LEFT
    * side by (a superset of) the right side's keys provably cannot change
    * the result — outer joins would lose their unmatched rows.
    *
    * `expectedItems` should bound the small side's DISTINCT key count;
    * oversizing costs bits (1 MB per ~10⁶ items at 3% fpp), undersizing
    * costs false positives (extra shuffled rows, never wrong results).
    */
  def prunedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long,
      fpp: Double = 0.03,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi").contains(joinType.toLowerCase),
      s"bloom pruning preserves only inner/left_semi join results, not $joinType " +
        "(an outer join's unmatched rows would be dropped by the pre-filter)")
    val bloom = bloomOf(small, smallKey, expectedItems, fpp)
    val pruned = big.where(mightContain(bloom, col(bigKey)))
    // bind each side explicitly — with the SAME key name on both frames an
    // unqualified col() would be an ambiguous reference post-join
    pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }
}
