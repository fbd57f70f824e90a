package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory heavy hitters: a Misra-Gries frequency sketch as a typed,
  * MERGEABLE `Aggregator` (merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012 §3).
  *
  * This is the 100 TB companion to `TextStats.wordFreq`: an exact
  * groupBy-count holds one counter per distinct key per partition, which for
  * a web-scale vocabulary (URLs, shingles, user-agents) is unbounded memory
  * and an unbounded shuffle. The sketch holds AT MOST `capacity` counters
  * per partition, ships `capacity`-sized partials through the shuffle, and
  * still guarantees every item with true frequency > N/(capacity+1) survives
  * with undercount ≤ (N − Σ counters)/(capacity+1) — the classic MG bound,
  * which the output carries as an explicit `max_undercount` column so a
  * caller can see the error budget instead of trusting it.
  *
  * Two regimes, one code path:
  *  - capacity ≥ #distinct: no decrement ever fires; counts are EXACT and
  *    the result is deterministic (this regime is what the DuckDB oracle
  *    verifies, e26).
  *  - capacity < #distinct: counts are deterministic lower bounds; the
  *    SURVIVING SET can vary with merge order (like any MG instance), but
  *    the guarantee above holds for every ordering — pinned in the spec
  *    under adversarial repartitioning.
  */
object FreqSketch {

  final case class FreqBuf(total: Long, counts: Map[String, Long])
  final case class Hit(item: String, est: Long, maxUndercount: Long)

  class FreqSketchAgg(capacity: Int)
      extends Aggregator[String, FreqBuf, Seq[Hit]] {
    require(capacity >= 1, "capacity must be >= 1")

    override def zero: FreqBuf = FreqBuf(0L, Map.empty)

    override def reduce(b: FreqBuf, a: String): FreqBuf = {
      val c = b.counts
      c.get(a) match {
        case Some(v) => FreqBuf(b.total + 1, c.updated(a, v + 1))
        case None if c.size < capacity => FreqBuf(b.total + 1, c.updated(a, 1L))
        case None =>
          // classic MG step: decrement every counter, drop zeros, discard
          // the incoming item — (capacity+1) units of mass per decrement
          FreqBuf(b.total + 1, c.collect { case (k, v) if v > 1 => k -> (v - 1) })
      }
    }

    override def merge(b1: FreqBuf, b2: FreqBuf): FreqBuf = {
      val summed = (b1.counts.keySet ++ b2.counts.keySet).iterator
        .map(k => k -> (b1.counts.getOrElse(k, 0L) + b2.counts.getOrElse(k, 0L)))
        .toMap
      val kept =
        if (summed.size <= capacity) summed
        else {
          // subtract the (capacity+1)-th largest count from everyone and
          // drop non-positives — keeps ≤ capacity counters, preserves the
          // N/(capacity+1) bound (Mergeable Summaries §3.1)
          val cut = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
          summed.collect { case (k, v) if v - cut > 0 => k -> (v - cut) }
        }
      FreqBuf(b1.total + b2.total, kept)
    }

    override def finish(r: FreqBuf): Seq[Hit] = {
      val bound = (r.total - r.counts.values.sum) / (capacity + 1)
      r.counts.toSeq.sortBy { case (k, v) => (-v, k) }
        .map { case (k, v) => Hit(k, v, bound) }
    }

    override def bufferEncoder: Encoder[FreqBuf] = Encoders.product[FreqBuf]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }

  /** Heavy hitters of a string column: one pass, ≤ `capacity` counters per
    * partition, one `capacity`-sized partial per partition through the
    * shuffle. Output (item, est, max_undercount) ordered by (est desc, item).
    */
  def heavyHitters(df: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(itemCol).cast("string")).as[String]
    ds.select(new FreqSketchAgg(capacity).toColumn.name("hits"))
      .flatMap(identity(_))
      .toDF("item", "est", "max_undercount")
      .orderBy(col("est").desc, col("item"))
  }
}
