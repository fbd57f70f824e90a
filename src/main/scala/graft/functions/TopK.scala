package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass bounded top-k aggregation (SURVEY.md §4's optional custom
  * aggregate, built as a typed `Aggregator` — the user-facing form of
  * TypedImperativeAggregate).
  *
  * Grouped top-k via `row_number().over(Window.partitionBy(g).orderBy(s))`
  * sorts EVERY row of every group; the aggregator keeps only k candidates
  * per group per partition and merges k-sized buffers — map-side partial
  * aggregation bounds both compute and shuffle volume by k·#groups,
  * independent of group fan-in. At 100 TB that's the difference between
  * shuffling the corpus and shuffling the answer.
  */
object TopK {

  final case class Scored(id: Long, score: Double)
  final case class Buf(items: Seq[Scored])

  /** Keep the k largest by (score, then lower id wins ties). */
  private def cap(items: Seq[Scored], k: Int): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  class TopKAgg(k: Int) extends Aggregator[Scored, Buf, Seq[Scored]] {
    override def zero: Buf = Buf(Vector.empty)
    override def reduce(b: Buf, a: Scored): Buf =
      // only re-sort when the buffer is full AND the candidate can compete
      if (b.items.size < k) Buf(cap(b.items :+ a, k))
      else {
        val worst = b.items.last
        if (a.score > worst.score || (a.score == worst.score && a.id < worst.id))
          Buf(cap(b.items :+ a, k))
        else b
      }
    override def merge(b1: Buf, b2: Buf): Buf = Buf(cap(b1.items ++ b2.items, k))
    override def finish(r: Buf): Seq[Scored] = r.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Grouped top-k over (group, id, score) columns: one shuffle of k-sized
    * partial buffers. Output: (group, id, score, rank) rank 1 = best.
    */
  def groupedTopK(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(groupCol).cast("long").as("g"),
      col(idCol).cast("long").as("id"),
      col(scoreCol).cast("double").as("score"))
      .as[(Long, Long, Double)]
    val agg = new TopKAgg(k).toColumn
    ds.groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case (s, i) => (g, s.id, s.score, i + 1) }
      }
      .toDF(groupCol, idCol, scoreCol, "rank")
  }
}
