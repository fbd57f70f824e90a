package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every key of two dataset versions as added /
  * removed / changed / unchanged — the audit step between incremental runs
  * of a curation pipeline (what did the new crawl or the new filter version
  * actually do?), and the input to an incremental writer that only rewrites
  * changed partitions (Layout.upsertPartitions).
  *
  * Scale: each side is reduced to `(key, xxhash64(compare cols))` BEFORE
  * its exchange — the full-outer join shuffles an 8-byte fingerprint per
  * row, never the document bodies (at 100 TB the payload difference is the
  * whole job). One shuffle per side, no broadcast assumption: both
  * snapshots may be huge.
  *
  * Caveats (documented contract): a 64-bit fingerprint collision marks a
  * changed row unchanged with probability ~2^-64 per key; rows whose
  * compare columns differ only by which of two adjacent columns is null
  * hash equal (Catalyst's hash leaves the seed unchanged on null). Exact
  * audits of suspect keys can re-join the originals; the driver-facing
  * semantics here are the DuckDB-expressible column compare (e34 pins the
  * two agree on real data).
  */
object Diff {

  /** Per-key diff of two snapshots. `keyCols` must be non-null identifying
    * columns present in both frames; `compareCols` defaults to every shared
    * non-key column (order-insensitive — the hash input order is the sorted
    * column-name order, so reordered schemas still compare equal).
    * Output: keyCols + `status` ∈ added | removed | changed | unchanged
    * (`includeUnchanged=false` drops the unchanged bulk before the join
    * output is materialized).
    */
  def diffByKey(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil,
      includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "diffByKey: keyCols must be non-empty")
    val shared = oldDf.columns.toSet.intersect(newDf.columns.toSet)
    val cmp =
      if (compareCols.nonEmpty) compareCols.sorted
      else (shared -- keyCols).toSeq.sorted
    require(cmp.nonEmpty, "diffByKey: no compare columns shared by both frames")
    (keyCols ++ cmp).foreach { c =>
      require(oldDf.columns.contains(c) && newDf.columns.contains(c),
        s"diffByKey: column $c missing from one side")
    }

    def fingerprint(df: DataFrame, hashName: String): DataFrame =
      df.select(keyCols.map(col) :+
        xxhash64(cmp.map(col): _*).as(hashName): _*)

    val o = fingerprint(oldDf, "__h_old")
    val n = fingerprint(newDf, "__h_new")
    val joined = o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old").isNull, lit("added"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(keyCols.map(col) :+ col("status"): _*)
    if (includeUnchanged) joined else joined.where(col("status") =!= "unchanged")
  }

  /** One-row roll-up of a diff: counts per status — the pipeline-run audit
    * line. Accepts [[diffByKey]] output (any subset of statuses).
    */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.agg(
      sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
      sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
      sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
}
