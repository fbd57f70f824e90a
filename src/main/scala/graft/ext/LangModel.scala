package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for corpus quality filtering and
  * data selection (mandated extension E3, SURVEY.md §2.e — the reference has
  * no LM-based curation; this is the KenLM/CCNet capability re-expressed in
  * Spark: CCNet (Wenzek et al. 2020) buckets Common Crawl by LM perplexity,
  * and DSIR (Xie et al. 2023) resamples raw data toward a target domain by
  * n-gram importance weights).
  *
  * The model is an add-k-smoothed bigram LM:
  *
  *   P(w | u) = (c(u,w) + k) / (c(u) + k·V)
  *
  * with c(·) counts from the TRAINING corpus and V its unigram vocabulary
  * size. Scores are per-document mean log-probabilities — high (close to 0)
  * means fluent under the training distribution, very negative means
  * out-of-distribution or noise. Per-token log-probs are rounded to 1e-4
  * FIXED POINT (longs) before summation, the repo-wide determinism rule
  * ([[graft.queries.Reference.msum]]): a Long sum is associative, so the
  * per-doc totals are bit-identical across partitionings, runs, and engines,
  * and the one final division is an exact IEEE op on integer-derived values.
  *
  * Scale posture: training is two hash aggregates over the exploded token /
  * bigram streams (one shuffle each, map-side partial); scoring is one join
  * of the corpus bigram stream against the vocabulary-sized count tables
  * (broadcast them when the vocab fits, shuffle-join on the gram key when it
  * does not — Catalyst picks by size) plus one per-doc aggregate. No UDFs,
  * no driver-side state: the LM "model" IS a pair of DataFrames.
  */
object LangModel {

  /** Fixed-point scale for per-token log-probs (1e-4, matching
    * [[graft.queries.Reference.msum]] and e17's 4-decimal ln() discipline).
    */
  private val Scale = 10000

  /** (id, toks) projection: normalized whitespace tokens, empties dropped —
    * the same canonicalization the dedup family uses ([[Dedup.normText]]).
    */
  private def toksOf(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      filter(split(Dedup.normText(col(textCol)), "\\s+"), t => length(t) > 0)
        .as("toks"))

  /** (id, u, w) bigram occurrence stream — POSITIONAL (repeats kept), one
    * explode per doc, no shuffle.
    */
  private def bigrams(toks: DataFrame): DataFrame =
    toks
      .where(size(col("toks")) >= 2)
      .select(col("id"), explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("u"),
          element_at(col("toks"), i + 2).as("w")))).as("b"))
      .select(col("id"), col("b.u").as("u"), col("b.w").as("w"))

  /** Score every document of `docs` under a bigram LM trained on
    * `lmCorpus`. Output: (idCol, n_bigrams, sum_lp_e4, avg_logprob) —
    * `sum_lp_e4` the exact fixed-point long (Σ round(1e4·ln P)), hash-stable
    * across engines; `avg_logprob` = sum_lp_e4 / (1e4 · n_bigrams), one
    * IEEE division. Documents with fewer than two tokens score
    * (0, 0, 0.0) — no evidence, not "perfect".
    *
    * Count tables enter the join with renamed keys (`__lm_*`): when `docs`
    * and `lmCorpus` are the same frame (the self-scoring quality-filter
    * case) the aggregate would otherwise join its own input on the same
    * attributes and trip Spark's ambiguous-self-join detection — the
    * [[Dedup.repeatedSpans]] pattern.
    */
  def scoreAgainst(docs: DataFrame, lmCorpus: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      addK: Int = 1): DataFrame = {
    require(addK >= 1, s"addK must be a positive integer (fixed-point SQL parity): $addK")
    val trainToks = toksOf(lmCorpus, textCol, idCol)
    val uni = trainToks
      .select(explode(col("toks")).as("__lm_u"))
      .groupBy(col("__lm_u"))
      .agg(count(lit(1)).as("__cu"))
    // vocabulary size as a 1-row broadcast (the e17 corpus-stats pattern)
    val v = uni.select(count(lit(1)).as("__v"))
    val cnt = bigrams(trainToks)
      .groupBy(col("u").as("__lm_bu"), col("w").as("__lm_bw"))
      .agg(count(lit(1)).as("__cuw"))

    val scoreToks = toksOf(docs, textCol, idCol)
    val lp = round(
      log((coalesce(col("__cuw"), lit(0L)) + addK).cast("double") /
        (coalesce(col("__cu"), lit(0L)) + lit(addK) * col("__v")).cast("double"))
        * Scale, 0).cast("long")
    val scored = bigrams(scoreToks)
      .join(cnt, col("u") === col("__lm_bu") && col("w") === col("__lm_bw"), "left")
      .join(uni, col("u") === col("__lm_u"), "left")
      .crossJoin(broadcast(v))
      .select(col("id"), lp.as("__lp"))
    val agg = scored
      .groupBy(col("id").as("__agg_id"))
      .agg(sum(col("__lp")).as("__sum_lp"), count(lit(1)).as("__n"))
    scoreToks.select(col("id"))
      .join(agg, col("id") === col("__agg_id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        coalesce(col("__sum_lp"), lit(0L)).as("sum_lp_e4"),
        when(coalesce(col("__n"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("__sum_lp").cast("double") /
            (col("__n") * Scale).cast("double")).as("avg_logprob"))
  }

  /** Self-scored corpus fluency — the CCNet-style quality signal: train on
    * the corpus, score the corpus. Documents whose `avg_logprob` sits far
    * below the corpus bulk are noise/gibberish candidates; combine with
    * [[TextStats.stats]] ratios for a full quality gate.
    */
  def lmScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", addK: Int = 1): DataFrame =
    scoreAgainst(docs, docs, textCol, idCol, addK)

  /** DSIR log importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log w(x) = log p_target(x) − log p_raw(x) under bigram LMs trained on
    * the `target` slice and on `corpus` itself. Both terms are the same
    * fixed-point `sum_lp_e4` longs, so `logw_e4` is an EXACT integer —
    * engine-portable with no float summation anywhere.
    *
    * Output: (idCol, n_bigrams, logw_e4). Positive ⇒ the document looks
    * more like the target domain than like the raw corpus. Documents with
    * no bigram (fewer than two tokens) carry NO evidence either way and are
    * dropped — resampling them by a vacuous weight of exactly 1 would just
    * inject noise docs at the Gumbel median.
    */
  def dsirLogWeights(corpus: DataFrame, target: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      addK: Int = 1): DataFrame = {
    val st = scoreAgainst(corpus, target, textCol, idCol, addK)
      .select(col(idCol).as("__t_id"), col("sum_lp_e4").as("__t_lp"))
    val sc = scoreAgainst(corpus, corpus, textCol, idCol, addK)
    sc.where(col("n_bigrams") > 0)
      .join(st, col(idCol) === col("__t_id"))
      .select(col(idCol), col("n_bigrams"),
        (col("__t_lp") - col("sum_lp_e4")).as("logw_e4"))
  }

  /** Deterministic Gumbel noise for id `c` under `salt`, in 1e-4 fixed
    * point: the first 4 hex chars of md5(salt ∥ id) give a 16-bit integer h,
    * u = (h + 0.5) / 65536 ∈ (0, 1) is exact in binary, and
    * g = −ln(−ln(u)) is two libm calls on identical doubles — the
    * [[graft.ops.Splits.hashBucket]] engine-portability argument extended
    * to a continuous distribution (16-bit resolution; the weight term
    * dominates selection long before quantization matters).
    */
  /** md5-derived Gumbel noise in 1e-4 fixed point — shared by DSIR and the
    * general [[graft.ops.Splits.weightedSampleK]] so every weighted
    * selection in the library draws from ONE portable noise formula.
    */
  private[graft] def gumbelE4(c: Column, salt: String): Column =
    round(-log(-log(
      (conv(substring(md5(concat(lit(salt), c.cast("string"))), 1, 4), 16, 10)
        .cast("double") + 0.5) / 65536.0)) * Scale, 0).cast("long")

  /** DSIR selection: sample `k` documents from `corpus` without replacement
    * with probability ∝ w(x), via the Gumbel top-k trick the DSIR paper
    * uses — key = log w(x) + Gumbel, keep the k largest keys. The Gumbel is
    * hash-derived ([[gumbelE4]]), so the selected set is a property of the
    * DATA (+ salt), reproducible on any engine, any partitioning, any run.
    * Key arithmetic is pure integer (`logw_e4 + g_e4`); ties break by id.
    *
    * Output: (idCol, logw_e4, key_e4), best-first. The top-k compiles to
    * TakeOrderedAndProject (per-partition heaps, no global sort); for a
    * corpus-scale selection (k in the millions) prefer a threshold on
    * `key_e4` from a quantile probe instead of a driver-bound limit.
    */
  def dsirSample(corpus: DataFrame, target: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      addK: Int = 1, salt: String = "dsir"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    dsirLogWeights(corpus, target, textCol, idCol, addK)
      .select(col(idCol), col("logw_e4"),
        (col("logw_e4") + gumbelE4(col(idCol), salt)).as("key_e4"))
      .orderBy(col("key_e4").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle generation: the SQL is GENERATED from the same constants
  // (Scale, addK, salt) so formula and parameters cannot drift between the
  // Spark operator and the oracle (the e07/e17/e19 pattern).

  /** CTE block that trains a bigram LM on `trainRel` and scores `scoreRel`
    * (both SQL relation expressions over (doc_id, text)), yielding relation
    * `<p>agg`(doc_id, n_bigrams, sum_lp_e4) for docs with ≥1 bigram and
    * `<p>ids`(doc_id) for all score-side docs. Prefix `p` keeps two LM
    * instances disjoint inside one query (the DSIR oracle).
    */
  def lmSqlCtes(p: String, trainRel: String, scoreRel: String, addK: Int): String =
    s"""${p}tt AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                             t -> len(t) > 0) AS toks
       |  FROM $trainRel
       |), ${p}uni AS (
       |  SELECT u, COUNT(*) AS cu
       |  FROM (SELECT unnest(toks) AS u FROM ${p}tt) GROUP BY u
       |), ${p}v AS (
       |  SELECT COUNT(*) AS v FROM ${p}uni
       |), ${p}cnt AS (
       |  SELECT u, w, COUNT(*) AS cuw FROM (
       |    SELECT toks[i] AS u, toks[i+1] AS w
       |    FROM (SELECT toks, unnest(range(1, len(toks))) AS i
       |          FROM ${p}tt WHERE len(toks) >= 2))
       |  GROUP BY u, w
       |), ${p}st AS (
       |  SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                             t -> len(t) > 0) AS toks
       |  FROM $scoreRel
       |), ${p}ids AS (
       |  SELECT doc_id FROM ${p}st
       |), ${p}sb AS (
       |  SELECT doc_id, toks[i] AS u, toks[i+1] AS w
       |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
       |        FROM ${p}st WHERE len(toks) >= 2)
       |), ${p}sc AS (
       |  SELECT b.doc_id,
       |    CAST(round(ln(CAST(coalesce(c.cuw, 0) + $addK AS DOUBLE) /
       |                  CAST(coalesce(u.cu, 0) + $addK * v.v AS DOUBLE)) * $Scale)
       |         AS BIGINT) AS lp
       |  FROM ${p}sb b
       |  LEFT JOIN ${p}cnt c ON b.u = c.u AND b.w = c.w
       |  LEFT JOIN ${p}uni u ON b.u = u.u
       |  CROSS JOIN ${p}v v
       |), ${p}agg AS (
       |  SELECT doc_id, CAST(SUM(lp) AS BIGINT) AS sum_lp_e4,
       |    COUNT(*) AS n_bigrams
       |  FROM ${p}sc GROUP BY doc_id
       |)""".stripMargin

  /** Full DuckDB mirror of [[lmScore]] over table `rel`. */
  def lmScoreSql(rel: String, addK: Int = 1): String =
    s"""WITH ${lmSqlCtes("m", rel, rel, addK)}
       |SELECT i.doc_id,
       |  CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(a.sum_lp_e4, 0) AS BIGINT) AS sum_lp_e4,
       |  CASE WHEN a.n_bigrams IS NULL THEN 0.0
       |       ELSE CAST(a.sum_lp_e4 AS DOUBLE) / (a.n_bigrams * $Scale) END
       |    AS avg_logprob
       |FROM mids i LEFT JOIN magg a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Full DuckDB mirror of [[dsirSample]]: `corpusRel` resampled toward
    * `targetRel`, Gumbel top-`k`.
    */
  def dsirSampleSql(corpusRel: String, targetRel: String, k: Int,
      addK: Int = 1, salt: String = "dsir"): String = {
    val h16 =
      """((((strpos('0123456789abcdef', substr(m,1,1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(m,2,1)) - 1)) * 16
        |      + (strpos('0123456789abcdef', substr(m,3,1)) - 1)) * 16
        |      + (strpos('0123456789abcdef', substr(m,4,1)) - 1))""".stripMargin
    s"""WITH ${lmSqlCtes("t", targetRel, corpusRel, addK)},
       |${lmSqlCtes("c", corpusRel, corpusRel, addK)},
       |w AS (
       |  SELECT c.doc_id, t.sum_lp_e4 - c.sum_lp_e4 AS logw_e4
       |  FROM cagg c JOIN tagg t USING (doc_id)
       |), g AS (
       |  SELECT doc_id, logw_e4,
       |    logw_e4 + CAST(round(-ln(-ln(($h16 + 0.5) / 65536.0)) * $Scale)
       |              AS BIGINT) AS key_e4
       |  FROM (SELECT doc_id, logw_e4,
       |          md5('$salt' || CAST(doc_id AS VARCHAR)) AS m FROM w)
       |)
       |SELECT doc_id, logw_e4, key_e4 FROM g
       |ORDER BY key_e4 DESC, doc_id LIMIT $k""".stripMargin
  }
}
