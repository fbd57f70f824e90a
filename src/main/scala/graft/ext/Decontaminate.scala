package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (or drop) training documents that share
  * word n-grams with an evaluation set — the standard contamination control
  * for LLM training corpora (GPT-3 appendix C / PaLM-style n-gram collision;
  * production pipelines use n = 8–13, the default here is parameterized).
  *
  * Scale posture: the benchmark side is ALWAYS small relative to the corpus
  * (eval suites are thousands of documents; the corpus is 100 TB), so the
  * benchmark's distinct n-gram set broadcasts and the corpus side never
  * shuffles for the probe — the only shuffle is the per-doc hit count
  * re-aggregation on `idCol`. With `broadcastBenchmark = false` the probe
  * becomes a shuffled equi-join on the n-gram (for the rare huge-benchmark
  * case); semantics are identical.
  */
object Decontaminate {

  /** Distinct word n-grams of the benchmark corpus — one column `g`. */
  def benchmarkNgrams(benchmark: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()

  /** Per-document contamination counts: for every corpus row, the number of
    * DISTINCT n-grams it shares with any benchmark document, plus a boolean
    * flag. Documents with no shingles (shorter than n tokens) or no overlap
    * report 0 / false — every corpus row appears in the output exactly once.
    *
    * Each document's shingle set is already distinct and the benchmark side
    * is deduplicated, so the joined row count per doc IS the distinct
    * overlap — no count(distinct) needed.
    */
  /** Per-doc count of distinct n-grams shared with the benchmark — ONLY
    * docs with ≥1 hit appear (the aggregate before the zero-fill join).
    */
  private def hitCounts(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int, broadcastBenchmark: Boolean): DataFrame = {
    val bench0 = benchmarkNgrams(benchmark, textCol, n)
    val bench = if (broadcastBenchmark) broadcast(bench0) else bench0
    corpus
      .select(col(idCol).as("__id"), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .join(bench, Seq("g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  def ngramHits(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      broadcastBenchmark: Boolean = true): DataFrame =
    corpus
      .select(col(idCol).as("__id"))
      .join(hitCounts(corpus, benchmark, textCol, idCol, n, broadcastBenchmark),
        Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))

  /** Collected benchmark n-gram set, for [[flagContaminated]] — eval suites
    * are small (10³–10⁷ n-grams), so the set fits the driver and can enter
    * plans as a literal. For benchmark sets past memory, stay with the
    * join-based [[ngramHits]].
    */
  def collectBenchmarkNgrams(benchmark: DataFrame, textCol: String = "text",
      n: Int = 3): Seq[String] =
    benchmarkNgrams(benchmark, textCol, n).collect().map(_.getString(0)).toSeq

  /** Stateless contamination flag against a literal benchmark n-gram set:
    * adds `n_hits` and `contaminated` columns as a pure per-row projection —
    * zero shuffle, zero join, and therefore STREAMING-SAFE (usable inside a
    * `readStream` curation chain in append mode, where [[ngramHits]]'s
    * aggregation is not). The per-doc shingle set is distinct, so
    * `array_intersect` against the (deduplicated) benchmark set counts each
    * shared n-gram once — identical semantics to [[ngramHits]].
    */
  def flagContaminated(corpus: DataFrame, benchGrams: Seq[String],
      textCol: String = "text", n: Int = 3): DataFrame = {
    val hits = size(array_intersect(
      Dedup.shingles(col(textCol), n),
      typedLit(benchGrams.distinct))).cast("long")
    corpus
      .withColumn("n_hits", hits)
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** SEMANTIC decontamination — the embedding-space companion to the n-gram
    * probe above: a corpus document is contaminated when its embedding's
    * cosine against ANY benchmark embedding reaches `minCosine` (paraphrased
    * eval leakage that shares no exact n-gram still sits next to the
    * benchmark in embedding space). Output: one row per corpus vector with
    * `max_cosine` (4dp-rounded, the e02/e31 discipline — the threshold
    * applies to the rounded value) and a `contaminated` flag.
    *
    * Scale posture: identical to [[ngramHits]] — eval suites are thousands
    * of vectors against a 100 TB corpus, so the benchmark broadcasts and the
    * corpus side never shuffles for the probe (a broadcast nested-loop scan
    * with the fused-loop [[graft.functions.CosineSim]] inside whole-stage
    * codegen). The only shuffle is the per-id max re-aggregation, which is
    * partial-aggregated to one 12-byte row per corpus vector before the
    * exchange. An empty benchmark yields an empty result (nothing to test
    * against — callers wanting "all clean" semantics zero-fill themselves).
    *
    * Two edge behaviors, INTENTIONAL and spec-pinned (they diverge from the
    * retired pairwise-join form — ADVICE r13):
    *  - a benchmark whose embeddings are ALL NULL collapses to an empty
    *    matrix (`collect_list` skips nulls), so the result is empty — same
    *    as an empty benchmark, where the pairwise form emitted every corpus
    *    row with a null `max_cosine`;
    *  - duplicate corpus ids each keep their own output row (one row per
    *    corpus ROW) — the pairwise form's `groupBy(id)` silently merged
    *    them, hiding upstream key corruption this form surfaces.
    */
  def semanticHits(
      corpus: DataFrame,
      benchmark: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      minCosine: Double = 0.99,
      broadcastBenchmark: Boolean = true): DataFrame = {
    // The benchmark folds to ONE matrix row (a few MB for eval-suite-sized
    // benchmarks) and the per-corpus-row max runs INSIDE one codegen'd
    // fused loop (MaxCosineSim): the pairwise crossJoin form materialized
    // |corpus|·|benchmark| rows through the join — 4·10⁹ rows / 494 s at
    // the sf10 rehearsal (200k × 20k), pure row overhead — where this is
    // |corpus| rows, no join stream and no re-aggregation exchange.
    // Semantics are pinned equal to the pairwise form in DecontaminateSpec:
    // same IEEE op sequence per pair, same max ordering, mismatched-length
    // rows skipped like their null pairwise cosine, round-then-max ≡
    // max-then-round (round is monotone), and an empty benchmark still
    // yields an empty result (the size guard — collect_list gives []).
    val benchRow = benchmark
      .select(col(vecCol).cast("array<double>").as("__b_v"))
      .agg(collect_list(col("__b_v")).as("__bm"))
    val bench = if (broadcastBenchmark) broadcast(benchRow) else benchRow
    corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .crossJoin(bench)
      .where(size(col("__bm")) > 0)
      .select(col("__id").as(idCol),
        round(graft.functions.CosineSim.maxCosineSim(col("__bm"), col("__v")), 4)
          .as("max_cosine"))
      .withColumn("contaminated", col("max_cosine") >= minCosine)
  }

  /** The semantically clean corpus: rows whose embedding reaches `minCosine`
    * against any benchmark vector are removed (left-anti on the flagged ids,
    * original schema preserved — the [[removeContaminated]] shape).
    */
  def removeSemanticContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      minCosine: Double = 0.99): DataFrame = {
    val dirty = semanticHits(corpus, benchmark, vecCol, idCol, minCosine)
      .where(col("contaminated"))
      .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** The clean corpus: rows of `corpus` sharing at least `minHits` distinct
    * n-grams with the benchmark are removed (left-anti on the flagged ids —
    * no row widening, original schema preserved).
    */
  def removeContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      minHits: Long = 1L): DataFrame = {
    // filter the hit AGGREGATE directly — ngramHits' zero-fill join back
    // onto every corpus id would be a wasted corpus-wide shuffle here,
    // since zero-hit rows are exactly the ones the anti-join keeps anyway
    val dirty = hitCounts(corpus, benchmark, textCol, idCol, n, broadcastBenchmark = true)
      .where(col("n_hits") >= minHits)
      .select(col("__id").as(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }
}
