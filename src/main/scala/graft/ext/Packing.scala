package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the last step between a curated corpus and a
  * trainer's input: concatenate documents (or chunks) into fixed-token-
  * budget training sequences so batch slots aren't wasted on padding.
  * Completes the pipeline `ext.TextStats.chunkTokens` starts (chunking
  * bounds item length; packing bins the items), and feeds
  * `examples.Curate`'s output shape.
  *
  * Bin-packing is inherently a sequential scan, which cannot distribute —
  * so the corpus is sharded into `numBuckets` deterministic md5 buckets and
  * each bucket is packed independently by a streaming NEXT-FIT scan in
  * md5-of-id order (next-fit, not first-fit: one open bin per scan, O(1)
  * state, no lookback — the standard streaming variant). Determinism is a
  * property of the DATA, not the execution: bucket = md5(salt ∥ id) and the
  * scan order is (bucket, md5 key, id), so the assignment survives reruns,
  * repartitioning, and engine changes, exactly like `ops.Splits`.
  *
  * Scale shape: ONE shuffle (hash repartition on bucket) + a sort within
  * partitions + a constant-memory per-partition scan — items are never
  * collected into driver or per-group arrays. Waste is bounded: next-fit in
  * random (md5) order wastes < one item's tokens per bin on average. Size
  * `numBuckets` so packing quality holds (each bucket should hold ≫ budget
  * tokens; more buckets = more parallelism, marginally more tail waste).
  *
  * Items longer than the budget get a singleton overflowing sequence and
  * never contaminate the running fill — pre-chunk with `chunkTokens` if
  * oversize items should be split instead.
  */
object Packing {

  /** Pack `(idCol, tokensCol)` items into sequences of at most `budget`
    * tokens. Output: (idCol, n_tokens, bucket, seq) — a sequence is the
    * (bucket, seq) pair, `seq` numbered from 0 within its bucket. Ids must
    * be integral (same contract as `Dedup.dupGroups`).
    *
    * `docCol` preserves DOCUMENT BOUNDARIES when the items are chunks: the
    * md5 bucket/order key is computed from the document id instead of the
    * item id, so all of a document's chunks land in one bucket and appear
    * consecutively in the scan (ordered by `idCol` within the document) —
    * a trainer reading a packed sequence sees each document's chunks
    * contiguous and in order, split across adjacent sequences only when a
    * document exceeds the remaining budget (unavoidable).
    */
  def packSequences(items: DataFrame, budget: Long, numBuckets: Int = 1024,
      idCol: String = "doc_id", tokensCol: String = "n_tokens",
      salt: String = "pack", docCol: String = null): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(numBuckets >= 1 && numBuckets <= 65536,
      s"numBuckets must be in [1, 65536] (md5 bucket space is 4 hex digits): $numBuckets")
    val spark = items.sparkSession
    import spark.implicits._

    val keySrc = if (docCol == null) idCol else docCol
    val key = md5(concat(lit(salt), col(keySrc).cast("string")))
    val keyed = items.select(
      (conv(substring(key, 1, 4), 16, 10).cast("long") % numBuckets).as("bucket"),
      key.as("__key"),
      col(idCol).cast("long").as("__id"),
      col(tokensCol).cast("long").as("__n"))

    val packed = keyed
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "__key", "__id")
      .select(col("bucket"), col("__id"), col("__n"))
      .as[(Long, Long, Long)]
      .mapPartitions { rows =>
        // buckets are contiguous after the sort; state resets per bucket,
        // so the result is independent of how buckets share partitions
        var curBucket = Long.MinValue
        var fill = 0L
        var seq = 0L
        rows.map { case (bucket, id, n) =>
          if (bucket != curBucket) { curBucket = bucket; seq = 0L; fill = n }
          else if (fill + n <= budget) fill += n
          else { seq += 1L; fill = n }
          (id, n, bucket, seq)
        }
      }
    packed.toDF(idCol, "n_tokens", "bucket", "seq")
  }
}
