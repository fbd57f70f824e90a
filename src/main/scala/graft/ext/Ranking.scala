package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over a document corpus: TF-IDF / BM25 (Robertson &
  * Spärck Jones; the BM25 form is the Okapi formula with the standard
  * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))` smoothing). This is the search
  * primitive the text suite was missing — quality gates and dedup decide
  * what ENTERS a corpus, ranking is how a pipeline FINDS things in it
  * (eval-set mining, topic probes, nearest-keyword audits).
  *
  * Scale posture: the query term list is tiny (a handful of literals), so
  * per-document term frequencies are computed as codegen'd higher-order
  * functions on the token array — the corpus is scanned ONCE with ZERO
  * shuffle on the heavy side. Corpus-level statistics (N, Σdl, per-term df)
  * reduce to a single row and re-enter via a broadcast cross join. The only
  * shuffle anywhere is the final ORDER BY / top-k.
  */
object Ranking {

  /** Per-(term, doc) BM25 partial scores for a literal term list — one row
    * per matching (term, doc), columns (term, doc_id, tf, dl, score).
    * Scores stay per-term (summing to a doc score is the caller's move via
    * [[bm25TopK]]) so the output is engine-deterministic: every float op
    * happens in one fixed textual order from integer inputs.
    */
  def bm25(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id",
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"bm25 takes a small literal term list (got ${terms.size}); " +
        "for term sets at corpus scale use an inverted-index join instead")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    // one scan: doc length + one codegen'd count per query term, no shuffle
    val perDoc = docs.select(
      col(idCol).as("doc_id"),
      size(toks).cast("long").as("dl"), // long to match the oracle's len()
      array(terms.map(t =>
        struct(lit(t).as("term"),
          size(filter(toks, x => x === lit(t))).cast("long").as("tf"))): _*).as("tfs"))
    // corpus stats reduce to ONE row: N, Σdl, df per term (position-aligned
    // with `terms` — the aggregate is over the same array order)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"),
      array(terms.indices.map(i =>
        sum(when(col("tfs")(i)("tf") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*).as("dfs"))
    val joined = perDoc
      .select(col("doc_id"), col("dl"), posexplode(col("tfs")).as(Seq("pos", "t")))
      .where(col("t")("tf") > 0)
      .crossJoin(broadcast(stats))
    val tf = col("t")("tf")
    val df = element_at(col("dfs"), col("pos") + 1)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    // textual float-op order mirrored 1:1 in bm25Sql — keep in lockstep
    val idf = log(lit(1.0) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
    val score = idf * (tf * (lit(k1) + lit(1.0))) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    joined.select(
      col("t")("term").as("term"),
      col("doc_id"),
      tf.as("tf"),
      col("dl"),
      round(score, 4).as("score"))
  }

  /** DuckDB-side SQL of [[bm25]] over a parquet-registered `documents`-shaped
    * table — GENERATED from the same term list and constants so the two
    * formulations cannot drift (the e07 stopword-inventory pattern). Float
    * semantics: every operation appears in the same textual order as the
    * Spark expression; inputs are integers, so both engines execute the
    * identical IEEE sequence (ln() is the one libm call — scores are rounded
    * to 4 decimals on both sides to absorb any sub-ulp divergence).
    */
  def bm25Sql(table: String, terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String = {
    // escape for the single-quoted literals and double-quoted aliases the
    // generator embeds terms in — a term like it's must not break the oracle
    def lq(s: String) = s.replace("'", "''")
    def aq(s: String) = s.replace("\"", "\"\"")
    val tfExprs = terms.map(t =>
      s"""len(list_filter(toks, x -> x = '${lq(t)}')) AS "tf_${aq(t)}"""").mkString(",\n    ")
    val dfExprs = terms.map(t =>
      s"""SUM(CASE WHEN "tf_${aq(t)}" > 0 THEN 1 ELSE 0 END) AS "df_${aq(t)}"""").mkString(",\n    ")
    val perTerm = terms.map(t =>
      s"""SELECT '${lq(t)}' AS term, doc_id, "tf_${aq(t)}" AS tf, dl FROM tf WHERE "tf_${aq(t)}" > 0""")
      .mkString("\n  UNION ALL\n  ")
    val dfCase = terms.map(t => s"""WHEN term = '${lq(t)}' THEN "df_${aq(t)}"""").mkString(" ")
    s"""WITH tf AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    $tfExprs
       |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |        FROM $table)
       |), stats AS (
       |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
       |    $dfExprs
       |  FROM tf
       |), matches AS (
       |  $perTerm
       |)
       |SELECT term, doc_id, tf, dl,
       |  round(ln(1.0 + (n_docs - (CASE $dfCase END) + 0.5) / ((CASE $dfCase END) + 0.5))
       |    * (tf * ($k1 + 1.0))
       |    / (tf + $k1 * (1.0 - $b + $b * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 4) AS score
       |FROM matches, stats""".stripMargin
  }

  /** Doc-level BM25 top-k: per-term scores summed per document, then a
    * k-bounded global top-k (TakeOrderedAndProject — no full sort). Ties
    * break on doc_id for determinism.
    */
  def bm25TopK(
      docs: DataFrame,
      terms: Seq[String],
      k: Int = 10,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    bm25(docs, terms, textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score")), 4).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  /** Plain TF-IDF weight per (term, doc) — `tf · ln(N / df)` — for corpora
    * where BM25's length normalization is unwanted (e.g. fixed-length
    * chunks). Same zero-shuffle shape as [[bm25]].
    */
  def tfidf(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val perDoc = docs.select(
      col(idCol).as("doc_id"),
      array(terms.map(t =>
        struct(lit(t).as("term"),
          size(filter(toks, x => x === lit(t))).cast("long").as("tf"))): _*).as("tfs"))
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      array(terms.indices.map(i =>
        sum(when(col("tfs")(i)("tf") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*).as("dfs"))
    perDoc
      .select(col("doc_id"), posexplode(col("tfs")).as(Seq("pos", "t")))
      .where(col("t")("tf") > 0)
      .crossJoin(broadcast(stats))
      .select(col("t")("term").as("term"), col("doc_id"), col("t")("tf").as("tf"),
        round(col("t")("tf") * log(col("n_docs").cast("double") /
          element_at(col("dfs"), col("pos") + 1)), 4).as("tfidf"))
  }
}
