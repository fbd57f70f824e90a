package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (mandated extension
  * E3, SURVEY.md §2.e): token counting, quality scoring, language-ID
  * heuristics, and document fingerprinting. All pure codegen'd column
  * expressions — per-row, zero shuffle, linear scans at any scale.
  */
object TextStats {

  /** Whitespace tokens of the raw text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * single punctuation marks) — the standard cheap proxy for tokenizer
    * counts when the real BPE vocab isn't on the cluster.
    */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])"),
      t => length(trim(t)) > 0))

  /** Per-document stats frame: counts + ratios used by quality filters. */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val toks = tokens(c)
    docs
      .withColumn("n_chars_calc", length(c))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_subwords", subwordCount(c))
      .withColumn("avg_token_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0), (a, t) => a + length(t)).cast("double") / size(toks))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(length(c) > 0,
          (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double")
            / length(c)).otherwise(lit(0.0)))
      .withColumn("upper_ratio",
        when(length(c) > 0,
          (length(c) - length(regexp_replace(c, "[A-Z]", ""))).cast("double")
            / length(c)).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(length(c) > 0,
          (length(c) - length(regexp_replace(c, "[0-9]", ""))).cast("double")
            / length(c)).otherwise(lit(0.0)))
  }

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic (public fastText/langid-style shortcut: the
    * language whose function words dominate wins).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "que", "dans", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "una", "para", "que", "en", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"))

  /** Stopword-hit ratio for one language over the token array. */
  def stopwordRatio(c: Column, lang: String = "en"): Column = {
    val sw = stopwords(lang)
    val toks = tokens(lower(c))
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(sw: _*))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Heuristic language-ID: argmax of per-language stopword evidence, with a
    * CJK charset override (Han characters ⇒ zh regardless of stopwords).
    * Returns a language code column ("en", "de", … or "und" for no signal).
    *
    * Single tokenization + ONE aggregate pass over the tokens, tallying all
    * languages at once (a per-language `stopwordRatio` would re-tokenize and
    * re-scan the text N× — measurably slower at corpus scale).
    */
  def langId(c: Column): Column = langIdFromVotes(langVotes(c), c)

  /** The expensive half of [[langId]]: per-language stopword vote counts in
    * ONE aggregate pass over the tokens. Bind this to a column (withColumn)
    * before calling [[langIdFromVotes]] when scoring a corpus — the argmax
    * references the votes array several times, and a bound attribute makes
    * those references free instead of re-running the aggregate per language.
    */
  def langVotes(c: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    aggregate(
      tokens(lower(c)),
      array_repeat(lit(0), langs.length),
      (acc, t) =>
        zip_with(acc, array(langs.map(l =>
          when(t.isin(stopwords(l): _*), 1).otherwise(0)): _*), (a, v) => a + v))
  }

  /** Argmax over [[langVotes]] output (+ Han-charset override). */
  def langIdFromVotes(votes: Column, text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(element_at(votes, i + 1).as("score"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(text.rlike("\\p{IsHan}"), lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Composite quality score in [0,1] — the usual length / punctuation /
    * stopword signals (Gopher/C4-style rules, public): mid-length docs with
    * some function words and sane punctuation score high.
    */
  def qualityScore(c: Column): Column = {
    val toks = tokens(c)
    val lenScore = least(size(toks).cast("double") / 50.0, lit(1.0))
    val swScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    val punct = when(length(c) > 0,
      (length(c) - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("double") / length(c))
      .otherwise(lit(0.0))
    val punctScore = lit(1.0) - least(punct * 4.0, lit(1.0))
    round((lenScore + swScore + punctScore) / 3.0, 6)
  }

  /** Flesch reading-ease per document — the readability member of the
    * quality battery (C4/Gopher filter on counts and ratios; readability
    * adds the sentence/syllable dimension web curation actually gates on).
    * Classic formula `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` with the standard heuristics: words =
    * whitespace tokens, sentences = runs of `[.!?]` (min 1 so fragment
    * docs stay finite), syllables = vowel-group count (`[aeiouy]+` on the
    * lowercased text) — the portable approximation every engine can
    * replicate exactly (a dictionary syllabifier is neither portable nor
    * needed for corpus-level gating).
    *
    * Zero shuffle — three codegen'd regex counts per row and one float
    * expression in fixed textual order over integer inputs (identical
    * IEEE in both engines; [[readabilitySql]] mirrors it 1:1), rounded
    * 4dp. Output: (doc_id, n_words, n_sentences, n_syllables, flesch).
    */
  def readability(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = size(tokens(col(textCol))).cast("long")
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val syllables = size(
      regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0))).cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      words.as("n_words"),
      sentences.as("n_sentences"),
      syllables.as("n_syllables"))
      .withColumn("flesch",
        round(lit(206.835)
          - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 4))
  }

  /** DuckDB mirror of [[readability]] — generated; double literals CAST
    * explicitly (bare decimals parse as DECIMAL in DuckDB), same textual
    * float order over the same integer counts.
    */
  def readabilitySql(table: String, textCol: String = "text",
      idCol: String = "doc_id"): String =
    s"""SELECT doc_id, n_words, n_sentences, n_syllables,
       |  round(CAST(206.835 AS DOUBLE)
       |    - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_sentences)
       |    - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words),
       |    4) AS flesch
       |FROM (
       |  SELECT $idCol AS doc_id,
       |    CAST(len(string_split_regex(trim($textCol), '\\s+')) AS BIGINT)
       |      AS n_words,
       |    GREATEST(CAST(len(regexp_extract_all($textCol, '[.!?]+')) AS BIGINT),
       |      1) AS n_sentences,
       |    CAST(len(regexp_extract_all(lower($textCol), '[aeiouy]+')) AS BIGINT)
       |      AS n_syllables
       |  FROM $table)""".stripMargin

  /** Polynomial rolling-hash fingerprint (Rabin–Karp over token hashes):
    * h = Σ xxhash64(tok_i)·B^(n−1−i) mod 2^31, folded left-to-right as
    * h = (h·B + tok) mod 2^31 — order-sensitive (unlike a bag-of-words
    * hash), stable, and computed entirely in codegen'd Catalyst expressions.
    * The accumulator is kept under 31 bits so `acc·B + h` never overflows a
    * Long (ANSI mode, Spark 4 default, makes Long overflow an error).
    */
  def fingerprint(c: Column, base: Long = 1000003L): Column = {
    require(base < (1L << 20), "base must stay below 2^20 to avoid overflow")
    // BOTH operands must be bounded before the add: acc < 2^31 and base <
    // 2^20 keep acc·base < 2^51, and h is folded into [0, 2^31) FIRST —
    // a raw xxhash64 near Long.MaxValue would otherwise overflow the add
    // itself under ANSI mode (2^51 + ~2^63 > Long.MaxValue).
    aggregate(
      transform(tokens(lower(c)), t => pmod(xxhash64(t), lit(1L << 31))),
      lit(0L),
      (acc, h) => pmod(acc * base + h, lit(1L << 31)))
  }

  /** Composable Gopher/C4-style quality gate (public heuristics): token
    * count bounds, mean token length bounds, symbol ratio cap, stopword
    * floor. Returns the input plus a boolean `quality_pass` and a
    * `quality_fail_reasons` array naming every violated rule — keep the
    * reasons column in curation pipelines; silent drops are undebuggable
    * at 100 TB.
    */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 5, maxTokens: Int = 100000,
      minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, minStopwordRatio: Double = 0.01): DataFrame = {
    val (_, _, _, _, reasons) = gopherSignals(col(textCol),
      minTokens, maxTokens, minMeanTokenLen, maxMeanTokenLen,
      maxSymbolRatio, minStopwordRatio)
    docs
      .withColumn("quality_fail_reasons", reasons)
      .withColumn("quality_pass", size(col("quality_fail_reasons")) === 0)
  }

  /** The Gopher rule signals + fail reasons for one text column, shared by
    * [[qualityFilter]] (the curation gate) and [[gopherReport]] (the
    * oracle-shaped per-doc report). Every ratio is ONE division of
    * integer-derived values (so engines agree bit-for-bit) and thresholds
    * compare the UNROUNDED signal — rounding is presentation only.
    */
  private def gopherSignals(c: Column,
      minTokens: Int, maxTokens: Int,
      minMeanTokenLen: Double, maxMeanTokenLen: Double,
      maxSymbolRatio: Double, minStopwordRatio: Double)
      : (Column, Column, Column, Column, Column) = {
    val toks = tokens(c)
    val meanLen = when(size(toks) > 0,
      aggregate(toks, lit(0), (a, t) => a + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
    // stripping letters/digits/whitespace leaves exactly the symbols
    val symbolRatio = when(length(c) > 0,
      length(regexp_replace(c, "[\\p{L}\\p{N}\\s]", "")).cast("double") / length(c))
      .otherwise(lit(0.0))
    val swRatio = stopwordRatio(c)
    val checks: Seq[(String, Column)] = Seq(
      "too_few_tokens" -> (size(toks) < minTokens),
      "too_many_tokens" -> (size(toks) > maxTokens),
      "mean_token_too_short" -> (meanLen < minMeanTokenLen),
      "mean_token_too_long" -> (meanLen > maxMeanTokenLen),
      "symbol_heavy" -> (symbolRatio > maxSymbolRatio),
      "no_stopwords" -> (swRatio < minStopwordRatio))
    val reasons = filter(
      array(checks.map { case (name, bad) =>
        when(bad, lit(name)).otherwise(lit(null))
      }: _*),
      r => r.isNotNull)
    (size(toks).cast("long"), meanLen, symbolRatio, swRatio, reasons)
  }

  /** Per-document Gopher rule report in oracle shape (Rae et al. 2021 §A1.1
    * heuristics, public): the four signals 6dp-rounded, the pass verdict,
    * and the violated rules as a comma-joined string (strings, not arrays —
    * engine-portable compare). Zero shuffle: pure codegen'd row
    * projections, exactly what a 100 TB curation pass maps over the corpus.
    */
  def gopherReport(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id",
      minTokens: Int = 5, maxTokens: Int = 100000,
      minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, minStopwordRatio: Double = 0.01): DataFrame = {
    val (nToks, meanLen, symbolRatio, swRatio, reasons) = gopherSignals(
      col(textCol), minTokens, maxTokens, minMeanTokenLen, maxMeanTokenLen,
      maxSymbolRatio, minStopwordRatio)
    docs.select(col(idCol),
      nToks.as("n_tokens"),
      round(meanLen, 6).as("mean_token_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(swRatio, 6).as("stopword_ratio"),
      (size(reasons) === 0).as("quality_pass"),
      array_join(reasons, ",").as("fail_reasons"))
      .orderBy(col(idCol))
  }

  /** Generated DuckDB mirror of [[gopherReport]] — same tokenization as the
    * e03 oracle, same single-division ratios, same check order. Keep in
    * lockstep.
    */
  def gopherReportSql(table: String,
      minTokens: Int = 5, maxTokens: Int = 100000,
      minMeanTokenLen: Double = 2.0, maxMeanTokenLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, minStopwordRatio: Double = 0.01): String = {
    val sw = stopwords("en").map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH sig AS (
       |  SELECT doc_id,
       |    string_split_regex(trim(text), '\\s+') AS toks,
       |    string_split_regex(trim(lower(text)), '\\s+') AS ltoks,
       |    length(text) AS nc,
       |    length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS nsym
       |  FROM $table
       |), m AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    CASE WHEN len(toks) > 0 THEN
       |      CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
       |        / len(toks) ELSE 0.0 END AS mean_len,
       |    CASE WHEN nc > 0 THEN CAST(nsym AS DOUBLE) / nc
       |      ELSE 0.0 END AS symbol_ratio,
       |    CASE WHEN len(ltoks) > 0 THEN
       |      CAST(len(list_filter(ltoks, t -> list_contains($sw, t)))
       |        AS DOUBLE) / len(ltoks) ELSE 0.0 END AS sw_ratio
       |  FROM sig
       |), r AS (
       |  SELECT doc_id, n_tokens, mean_len, symbol_ratio, sw_ratio,
       |    list_filter([
       |      CASE WHEN n_tokens < $minTokens THEN 'too_few_tokens' END,
       |      CASE WHEN n_tokens > $maxTokens THEN 'too_many_tokens' END,
       |      CASE WHEN mean_len < $minMeanTokenLen THEN 'mean_token_too_short' END,
       |      CASE WHEN mean_len > $maxMeanTokenLen THEN 'mean_token_too_long' END,
       |      CASE WHEN symbol_ratio > $maxSymbolRatio THEN 'symbol_heavy' END,
       |      CASE WHEN sw_ratio < $minStopwordRatio THEN 'no_stopwords' END],
       |      x -> x IS NOT NULL) AS reasons
       |  FROM m
       |)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round(mean_len, 6) AS mean_token_len,
       |  round(symbol_ratio, 6) AS symbol_ratio,
       |  round(sw_ratio, 6) AS stopword_ratio,
       |  len(reasons) = 0 AS quality_pass,
       |  COALESCE(array_to_string(reasons, ','), '') AS fail_reasons
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Token frequency table over a corpus: explode + count. One shuffle on
    * token; partial aggregation keeps it map-side-combined at scale.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))

  /** C4/CCNet-style PII + noise scrubbing: emails, then URLs, then long
    * digit runs that look like phone numbers, each replaced by a typed
    * placeholder token so downstream token statistics still see ONE token
    * where the entity was. Order matters (an email inside a URL query
    * string is redacted as <EMAIL> first). Patterns are deliberately
    * lookaround-free so they behave identically under Java regex and RE2 —
    * the same portability constraint the oracle SQL lives under. Per-row
    * codegen'd regexp_replace chain: zero shuffle, streaming-safe.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+|www\\.[^\\s]+", "<URL>"),
      "\\+?[0-9][0-9()\\s.-]{7,}[0-9]", "<PHONE>")

  /** Frequency vocabulary over a corpus: the `maxSize` most frequent
    * lowercased tokens with contiguous ids 0..size−1, deterministically
    * ordered by (count desc, token asc) so the same corpus always yields
    * the same vocab on any engine or partitioning. The global sort runs as
    * TakeOrderedAndProject (top-k per partition, merged on the driver — no
    * full sort), and the id-assigning window sees only the ≤ maxSize
    * surviving rows.
    */
  def buildVocab(docs: DataFrame, textCol: String = "text",
      maxSize: Int = 65536): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    wordFreq(docs, textCol)
      .orderBy(col("n").desc, col("token"))
      .limit(maxSize)
      .withColumn("id", row_number().over(w).cast("long") - 1)
  }

  /** Token-id encoding of each document against a [[buildVocab]] frame:
    * tokens in position order, out-of-vocabulary tokens as −1. The vocab
    * side is broadcast (it is ≤ maxSize rows by construction), so the only
    * shuffle is the per-doc reassembly; positions ride a posexplode and an
    * array_sort on (pos, id) structs restores document order exactly.
    */
  def encodeTokens(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "token")))
    toks
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          coalesce(col("id"), lit(-1L)).as("tid")))),
        s => s("tid")).as("token_ids"))
  }

  /** Per-document n-gram repetition signals — the n-gram rows of Gopher's
    * repetition filters (Rae et al. 2021, Table A1), in token-level form.
    * For each n in `ns` the output carries two columns:
    *
    *  - `top{n}gram_frac`: tokens covered by the single MOST FREQUENT
    *    n-gram, `count × n / n_tokens`. Overlapping occurrences are not
    *    de-overlapped — this is the standard cheap upper-bound coverage
    *    (only the max count is used, so gram-tie order cannot affect it).
    *  - `dup{n}gram_frac`: fraction of n-gram OCCURRENCES that are repeats
    *    of an earlier one, `(total − distinct) / total`.
    *
    * High values of either mark the template/boilerplate/looping-generator
    * documents the Gopher rules exist to drop; compose with
    * [[qualityFilter]] thresholds downstream.
    *
    * Shape at scale: ONE gram scan regardless of how many n are requested —
    * every n-gram enters a single explode tagged with its n, so the text
    * column is read twice in total (the token-count base + the grams),
    * not once per n. One shuffle on (doc id, n, gram) with map-side partial
    * counts, then one per-doc aggregation that splits the n's back out via
    * conditional aggregates — no per-row quadratic work, and the first
    * shuffle key includes the doc id so a globally common gram cannot skew
    * a partition. Both fractions divide integer-derived values exactly
    * once, so results are bit-identical across engines (the e12 oracle
    * relies on this). Docs with fewer than n tokens score 0.0 on both
    * signals.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", ns: Seq[Int] = Seq(2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct == ns,
      s"ns must be distinct positive n-gram sizes, got $ns")
    val base = docs.select(col(idCol),
      size(split(Dedup.normText(col(textCol)), "\\s+")).cast("long").as("n_tokens"))
    val tagged = docs.select(col(idCol), explode(concat(ns.map(n =>
        transform(Dedup.ngramsOrdered(col(textCol), n),
          g => struct(lit(n).as("n"), g.as("g")))): _*)).as("t"))
      .select(col(idCol), col("t.n").as("n"), col("t.g").as("g"))
    val counts = tagged.groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val perN = ns.flatMap(n => Seq(
      max(when(col("n") === n, col("c"))).as(s"top_c_$n"),
      sum(when(col("n") === n, col("c"))).as(s"tot_$n"),
      count(when(col("n") === n, lit(1))).as(s"dist_$n")))
    val stats = counts.groupBy(col(idCol)).agg(perN.head, perN.tail: _*)
    val fracs = ns.flatMap(n => Seq(
      when(col(s"tot_$n").isNull || col("n_tokens") === 0, lit(0.0))
        .otherwise((col(s"top_c_$n") * n).cast("double") / col("n_tokens"))
        .as(s"top${n}gram_frac"),
      when(col(s"tot_$n").isNull || col(s"tot_$n") === 0, lit(0.0))
        .otherwise((col(s"tot_$n") - col(s"dist_$n")).cast("double") / col(s"tot_$n"))
        .as(s"dup${n}gram_frac")))
    base.join(stats, Seq(idCol), "left")
      .select(col(idCol) +: col("n_tokens") +: fracs: _*)
  }

  /** Sliding token-window chunking — the context-window prep for retrieval
    * and training: each document becomes ⌈max(0, n−W)/stride⌉+1 chunks of at
    * most `windowTokens` tokens, consecutive chunks overlapping by
    * `overlapTokens` (stride = W − O). The final chunk may be short; a doc
    * shorter than one window yields exactly one chunk; an empty doc yields
    * none. Pure per-row HOFs + one explode — zero shuffle, the chunk fan-out
    * is the only row growth, and chunk membership depends on nothing but the
    * document text (rerun/engine stable).
    */
  /** Head+tail token truncation — the long-document budget policy for
    * trainer/context prep: keep the first `headTokens` and the last
    * `maxTokens − headTokens` tokens of any over-budget document (openings
    * carry titles/instructions, endings carry conclusions; the middle is
    * the cheapest cut — the standard alternative to naive head-only).
    * Zero shuffle: pure per-row codegen'd HOF slices.
    *
    * Output replaces nothing: adds `n_tokens`, `truncated`, and
    * `{textCol}_trunc` (whitespace-NORMALIZED — single spaces — in both
    * the kept and truncated cases, so the column is engine-portable and
    * downstream token counts are consistent either way).
    */
  def truncateTokens(
      docs: DataFrame,
      textCol: String = "text",
      maxTokens: Int = 512,
      headTokens: Int = 384): DataFrame = {
    require(maxTokens > 0 && headTokens > 0 && headTokens < maxTokens,
      s"need 0 < headTokens < maxTokens, got head=$headTokens max=$maxTokens")
    val tailTokens = maxTokens - headTokens
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val n = size(toks)
    docs
      .withColumn("__toks", toks)
      .withColumn("n_tokens", n.cast("long"))
      .withColumn("truncated", col("n_tokens") > maxTokens)
      .withColumn(s"${textCol}_trunc",
        when(!col("truncated"), concat_ws(" ", col("__toks")))
          .otherwise(concat(
            concat_ws(" ", slice(col("__toks"), 1, headTokens)),
            lit(" "),
            concat_ws(" ", slice(col("__toks"),
              col("n_tokens").cast("int") - tailTokens + 1, lit(tailTokens))))))
      .drop("__toks")
  }

  /** Distinct-n lexical diversity — the standard degenerate-generation /
    * template-spam diagnostic (distinct-1 / distinct-2 of Li et al. 2016):
    * per document, the ratio of UNIQUE unigrams (bigrams) to total
    * unigrams (bigrams). Low distinct-2 flags looping or boilerplate text
    * that per-token stats miss; the corpus-level complement of
    * [[repetitionStats]]'s duplicate-gram fractions.
    *
    * Scale posture: pure per-row codegen'd HOFs (bigrams via a
    * `sequence`/`transform` index walk, dedup via `array_distinct`) — ZERO
    * shuffle, no explode, no row growth. Determinism: both ratios divide
    * integer-derived counts exactly once and round at 4dp; tokens are
    * lowercase whitespace-split (the Drift convention). Docs with no
    * tokens score null/null; single-token docs score (1.0, null).
    */
  def distinctNgrams(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val n = col("__n")
    // branch guarded: sequence(1, n-1) is only evaluated when n >= 2 (an
    // unguarded sequence(1, 0) would walk DESCENDING and fabricate grams)
    val bigrams = transform(sequence(lit(1), n - 1), i =>
      concat_ws(" ", element_at(col("__toks"), i), element_at(col("__toks"), i + 1)))
    docs
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(
        col(idCol),
        n.cast("long").as("n_tokens"),
        when(n > 0, round(size(array_distinct(col("__toks"))).cast("double") / n, 4))
          .as("distinct1"),
        when(n >= 2, round(size(array_distinct(bigrams)).cast("double") / (n - 1), 4))
          .as("distinct2"))
  }

  /** Zipf rank–frequency fit — the corpus-health diagnostic: OLS slope of
    * ln(frequency) against ln(rank) over the `topK` most frequent tokens.
    * Natural text sits near slope −1 (Zipf's law); a much flatter slope
    * flags template/synthetic text, a much steeper one a collapsed
    * vocabulary. One row: `(n_terms, slope, intercept)`.
    *
    * Determinism: ranks and counts are exact longs with a total
    * (freq desc, token) order; each regression component (x, y, xy, x²)
    * fixes its association around the ONE pair of libm `ln` calls, rounds
    * at 6dp and sums as 1e-6-fixed-point longs (float-order-free); slope
    * and intercept each fix one textual association and round at 4dp —
    * the intercept uses the ROUNDED slope, same as the mirror.
    *
    * Scale: the corpus reduces to the vocab-sized frequency table in one
    * shuffle; top-k runs as TakeOrderedAndProject (no full sort) and the
    * rank window sees only the k survivors (the buildVocab pattern).
    */
  def zipfFit(docs: DataFrame, textCol: String = "text",
      topK: Int = 1000): DataFrame = {
    require(topK >= 10 && topK <= 100000,
      s"zipfFit wants a bounded head of the frequency table: $topK")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    val ranked = wordFreq(docs, textCol)
      .orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("r", row_number().over(w).cast("long"))
    val x = log(col("r").cast("double"))
    val y = log(col("n").cast("double"))
    val sums = ranked
      .select(round(x, 6).as("x"), round(y, 6).as("y"),
        round(x * y, 6).as("xy"), round(x * x, 6).as("xx"))
      .agg(
        count(lit(1)).as("k"),
        sum(round(col("x") * lit(1000000), 0).cast("long")).as("sx"),
        sum(round(col("y") * lit(1000000), 0).cast("long")).as("sy"),
        sum(round(col("xy") * lit(1000000), 0).cast("long")).as("sxy"),
        sum(round(col("xx") * lit(1000000), 0).cast("long")).as("sxx"))
    val kD = col("k").cast("double")
    def f(c: String) = col(c).cast("double") / lit(1000000)
    sums
      .select(col("k"), col("sx"), col("sy"),
        round((kD * f("sxy") - f("sx") * f("sy"))
          / (kD * f("sxx") - f("sx") * f("sx")), 4).as("slope"))
      .select(col("k").as("n_terms"), col("slope"),
        round((f("sy") - col("slope") * f("sx")) / kD, 4).as("intercept"))
  }

  /** Unigram language-model quality score — the CCNet/KenLM-style signal
    * beside the Gopher heuristics (e87): train add-one-smoothed unigram
    * probabilities on `train`, score every `score` document by its mean
    * token log-probability. Low (very negative) scores flag gibberish /
    * rare-token soup; high scores flag fluent, common-vocabulary text.
    * p(w) = (c(w) + 1) / (N + V) so out-of-vocabulary tokens score
    * ln(1) − ln(N+V) instead of −∞ (reference delegates quality entirely
    * to heuristics — `Comperhensive_bigdata_analysis-` has no LM gate; this
    * is the standard pre-training-corpus upgrade).
    *
    * Determinism: every ln runs on an EXACT INTEGER input ((c+1) and (N+V)
    * as doubles — identical values in both engines, and a 1e-6 fixed-point
    * round makes any last-ulp libm disagreement unobservable, the e96
    * discipline); per-doc sums accumulate c_dt·lnc1_fx in DECIMAL(38,0);
    * ONE double division pair at the end, rounded 4dp.
    *
    * Scale: vocab is a |V|-row hash aggregate; the score side joins its
    * (doc, token) counts to vocab on the token key (shuffle bounded by the
    * token-type table, never corpus²); the (N, V) stats row broadcasts.
    * Docs with zero tokens keep a row (n_tokens = 0, null avg_logprob)
    * from the id spine; `idCol` must be unique per document.
    */
  def lmScore(train: DataFrame, score: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val tk = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val vocab0 = train.select(explode(tk).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val vocab = vocab0.select(col("w"),
      round(log((col("c") + lit(1L)).cast("double")) * lit(1000000), 0)
        .cast("decimal(19,0)").as("lnc1_fx"))
    val stats = vocab0.agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
      .select(
        round(log((col("n_train") + col("v")).cast("double")) * lit(1000000), 0)
          .cast("decimal(19,0)").as("lnnv_fx"))
    val dt = score.select(col(idCol).as("doc_id"), explode(tk).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c_dt"))
    val perDoc = dt.join(vocab, Seq("w"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(col("c_dt")).as("n_tokens"),
        sum(when(col("lnc1_fx").isNull, col("c_dt")).otherwise(0L))
          .as("oov_tokens"),
        sum(col("c_dt").cast("decimal(19,0)") *
          coalesce(col("lnc1_fx"), lit(0).cast("decimal(19,0)"))).as("s_fx"))
    score.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
        when(col("n_tokens").isNotNull,
          round((((col("s_fx") -
            col("n_tokens").cast("decimal(19,0)") * col("lnnv_fx"))
            .cast("double")) / lit(1000000.0)) /
            col("n_tokens").cast("double"), 4)).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of [[lmScore]] — generated; same token split, same
    * integer-input 1e-6 ln fixed point, same DECIMAL accumulation and
    * final double association. `train`/`score` are table names or
    * parenthesized subqueries.
    */
  def lmScoreSql(train: String, score: String, textCol: String = "text",
      idCol: String = "doc_id"): String = {
    val tk = (t: String) =>
      s"unnest(list_filter(string_split_regex(lower(trim($t)), '\\s+'), " +
        "t -> length(t) > 0))"
    s"""WITH ttoks AS (
       |  SELECT ${tk(textCol)} AS w FROM $train
       |), vocab0 AS (
       |  SELECT w, COUNT(*) AS c FROM ttoks GROUP BY 1
       |), vocab AS (
       |  SELECT w,
       |    CAST(round(ln(CAST(c + 1 AS DOUBLE)) * 1000000, 0)
       |      AS DECIMAL(19,0)) AS lnc1_fx
       |  FROM vocab0
       |), stats AS (
       |  SELECT CAST(round(ln(CAST(SUM(c) + COUNT(*) AS DOUBLE)) * 1000000, 0)
       |    AS DECIMAL(19,0)) AS lnnv_fx
       |  FROM vocab0
       |), stoks AS (
       |  SELECT $idCol AS doc_id, ${tk(textCol)} AS w FROM $score
       |), dt AS (
       |  SELECT doc_id, w, COUNT(*) AS c_dt FROM stoks GROUP BY 1, 2
       |), perdoc AS (
       |  SELECT doc_id, CAST(SUM(c_dt) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CASE WHEN lnc1_fx IS NULL THEN c_dt ELSE 0 END) AS BIGINT)
       |      AS oov_tokens,
       |    SUM(CAST(c_dt AS DECIMAL(19,0)) *
       |        COALESCE(lnc1_fx, CAST(0 AS DECIMAL(19,0)))) AS s_fx
       |  FROM dt LEFT JOIN vocab USING (w) GROUP BY 1
       |)
       |SELECT d.doc_id,
       |  COALESCE(p.n_tokens, 0) AS n_tokens,
       |  COALESCE(p.oov_tokens, 0) AS oov_tokens,
       |  CASE WHEN p.n_tokens IS NOT NULL THEN
       |    round((CAST(p.s_fx -
       |        CAST(p.n_tokens AS DECIMAL(19,0)) * st.lnnv_fx AS DOUBLE)
       |      / 1000000.0) / CAST(p.n_tokens AS DOUBLE), 4)
       |  END AS avg_logprob
       |FROM (SELECT $idCol AS doc_id FROM $score) d
       |LEFT JOIN perdoc p USING (doc_id)
       |CROSS JOIN stats st
       |ORDER BY doc_id""".stripMargin
  }

  def chunkTokens(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      windowTokens: Int = 512,
      overlapTokens: Int = 64): DataFrame = {
    require(windowTokens > 0 && overlapTokens >= 0 && overlapTokens < windowTokens,
      s"need 0 <= overlap < window, got window=$windowTokens overlap=$overlapTokens")
    val stride = windowTokens - overlapTokens
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    val n = size(toks)
    // ⌈max(0, n−W)/stride⌉ + 1 extra windows past the first, as pure integer
    // arithmetic (floor((x + stride − 1) / stride) with x ≥ 0)
    val nChunks = when(n === 0, 0).otherwise(
      floor((greatest(n - windowTokens, lit(0)) + (stride - 1)) / stride).cast("int") + 1)
    docs
      .select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .where(col("__nc") > 0)
      .select(col(idCol), posexplode(transform(sequence(lit(0), col("__nc") - 1), s =>
        slice(col("__toks"), s * stride + 1, lit(windowTokens)))).as(Seq("chunk_idx", "__ct")))
      .select(col(idCol), col("chunk_idx"),
        size(col("__ct")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__ct")).as("chunk_text"))
  }
}
