package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stats computes token counts and ratios") {
    import spark.implicits._
    val df = Seq((1L, "Hello, World! 42 times")).toDF("doc_id", "text")
    val r = TextStats.stats(df).head()
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    assert(r.getInt(r.fieldIndex("n_tokens")) == 4)
    assert(r.getInt(r.fieldIndex("n_chars_calc")) == 22)
    assert(d("punct_ratio") > 0 && d("punct_ratio") < 0.2)
    assert(d("digit_ratio") > 0)
    assert(d("upper_ratio") > 0)
    assert(math.abs(d("avg_token_len") - 19.0 / 4) < 1e-9)
  }

  test("subwordCount splits words, digits and punctuation marks") {
    import spark.implicits._
    val df = Seq(("don't stop, 123 go!")).toDF("t")
    // don ' t stop , 123 go ! -> 8 pieces
    val got = df.select(TextStats.subwordCount(col("t"))).head().getInt(0)
    assert(got == 8)
  }

  test("langId picks the language whose stopwords dominate; Han chars force zh") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and it is warm"),
      (2L, "der hund ist nicht in der küche und das ist gut"),
      (3L, "le chat est dans la maison pour la nuit"),
      (4L, "el perro es una mascota para la casa"),
      (5L, "这 是 一个 测试 文档"),
      (6L, "zzz qqq xxx")).toDF("id", "text")
    val got = df.select(col("id"), TextStats.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en"); assert(got(2L) == "de"); assert(got(3L) == "fr")
    assert(got(4L) == "es"); assert(got(5L) == "zh"); assert(got(6L) == "und")
  }

  test("qualityScore favors clean prose over junk") {
    import spark.implicits._
    val df = Seq(
      ("good", "the system is designed to keep the data flowing and it works for all of the cases we care about in practice"),
      ("junk", "!!! ??? ### $$$ %%% &&& ***")).toDF("k", "text")
    val got = df.select(col("k"), TextStats.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("good") > 0.8, s"good=${got("good")}")
    assert(got("junk") < 0.4, s"junk=${got("junk")}")
  }

  test("fingerprint survives tokens whose xxhash64 is near Long.MaxValue (ANSI overflow)") {
    import spark.implicits._
    // xxhash64('w1380415') = 9223364489472312354 ≈ Long.MaxValue — the raw
    // `acc*base + h` fold overflowed on this input under ANSI mode
    val df = Seq(("hello w1380415"), ("w1380415 w1380415 w1380415")).toDF("text")
    val got = df.select(TextStats.fingerprint(col("text"))).collect()
    assert(got.length == 2 && got.forall(r => r.getLong(0) >= 0))
  }

  test("fingerprint is order-sensitive and stable") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("id", "text")
    val got = df.select(col("id"), TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(3L))
    assert(got(1L) != got(2L)) // bag-of-words hash would collide here
  }

  test("qualityFilter passes prose, fails junk with named reasons") {
    import spark.implicits._
    val df = Seq(
      ("ok", "the data pipeline keeps all of the documents that look like real text and it works well"),
      ("short", "tiny text"),
      ("symbols", "the @@ ## $$ %% ^^ && ** (( )) !! ?? ++ == ~~ ;; :: the")).toDF("k", "text")
    val got = TextStats.qualityFilter(df)
      .select("k", "quality_pass", "quality_fail_reasons")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getSeq[String](2))).toMap
    assert(got("ok")._1, s"ok failed: ${got("ok")._2}")
    assert(!got("short")._1 && got("short")._2.contains("too_few_tokens"))
    assert(!got("symbols")._1 && got("symbols")._2.contains("symbol_heavy"))
  }

  test("gopherReport: hand-computed signals, verdicts, and reason strings") {
    import spark.implicits._
    val df = Seq(
      (1L, "the data pipeline keeps all of the documents that look like real text and it works well"),
      (2L, "tiny text"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextStats.gopherReport(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(5),
        r.getString(6)))).toMap
    // doc 1: 17 tokens, 71 letter-chars / 17 -> mean_token_len, passes all
    assert(got(1L)._1 == 17L && got(1L)._3, got(1L).toString)
    assert(got(1L)._2 == math.rint(71.0 / 17 * 1e6) / 1e6)
    assert(got(1L)._4 == "")
    // doc 2: 2 tokens -> too_few; "tinytext" has no stopword hit
    assert(got(2L) == ((2L, 4.0, false, "too_few_tokens,no_stopwords")))
    // empty text: split yields one empty token -> mean len 0 trips both
    // length rules' floor and the stopword floor
    assert(!got(3L)._3 &&
      got(3L)._4 == "too_few_tokens,mean_token_too_short,no_stopwords")
  }

  test("wordFreq counts tokens across the corpus") {
    import spark.implicits._
    val df = Seq(("a b a"), ("b a")).toDF("text")
    val got = TextStats.wordFreq(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3, "b" -> 2))
  }

  test("scrubPii redacts emails, urls, and phone-like runs as single tokens") {
    import spark.implicits._
    val df = Seq(
      "contact me at jane.doe+spam@example.co.uk today",
      "see https://example.com/a?b=c&user=x@y.org and www.test.org/path",
      "call +1 (555) 123-4567 or 555.123.4567 now",
      "version 2.0 has 3 bugs" // short digit runs must survive
    ).toDF("text")
    val got = df.select(TextStats.scrubPii(col("text"))).collect().map(_.getString(0))
    assert(got(0) == "contact me at <EMAIL> today")
    assert(got(1) == "see <URL> and <URL>", got(1))
    assert(got(2) == "call <PHONE> or <PHONE> now", got(2))
    assert(got(3) == "version 2.0 has 3 bugs")
  }

  test("buildVocab is deterministic; encodeTokens restores order with OOV=-1") {
    import spark.implicits._
    val docs = Seq((1L, "b a b c B"), (2L, "a b zzz")).toDF("doc_id", "text")
    // counts: b=4 (incl B), a=2, c=1, zzz=1 → order by (n desc, token asc)
    val vocab = TextStats.buildVocab(docs, maxSize = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.map(v => v._1 -> v._3).toSeq == Seq("b" -> 0L, "a" -> 1L, "c" -> 2L), vocab.toSeq)
    // repartitioned input → identical vocab
    val vocab2 = TextStats.buildVocab(docs.repartition(5), maxSize = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(vocab.toSeq == vocab2.toSeq)
    val enc = TextStats.encodeTokens(docs, TextStats.buildVocab(docs, maxSize = 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc(1L) == Seq(0L, 1L, 0L, 2L, 0L)) // "b a b c B"
    assert(enc(2L) == Seq(1L, 0L, -1L))        // zzz is OOV
  }

  test("scrubPii and qualityFilter run unchanged on a streaming Dataset") {
    // the curation gate is per-row projections/filters only, so the same
    // code must work under readStream — pin that claim with MemoryStream
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val src = ms.toDS().toDF("doc_id", "text")
    val gated = TextStats.qualityFilter(src.withColumn("text", TextStats.scrubPii(col("text"))))
      .where(col("quality_pass"))
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("stream_curation").start()
    try {
      ms.addData(
        (1L, "reach me at someone@example.com about the quarterly market forecast " +
          "and the updated capacity numbers for the northern region please"),
        (2L, "@@@@ ???? !!!!"))
      q.processAllAvailable()
      val rows = spark.table("stream_curation").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L), rows.mkString(","))
      assert(rows.head.getAs[String]("text").contains("<EMAIL>"))
    } finally q.stop()
  }

  test("chunkTokens runs unchanged on a streaming Dataset") {
    // per-row HOFs + posexplode only — streaming-safe in append mode
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val chunked = TextStats.chunkTokens(
      ms.toDS().toDF("doc_id", "text"), windowTokens = 3, overlapTokens = 1)
    val q = chunked.writeStream.outputMode("append").format("memory")
      .queryName("stream_chunks").start()
    try {
      ms.addData((1L, "a b c d e"))
      q.processAllAvailable()
      val rows = spark.table("stream_chunks").collect()
        .map(r => r.getInt(1) -> r.getString(3)).toMap
      assert(rows == Map(0 -> "a b c", 1 -> "c d e"))
    } finally q.stop()
  }

  test("repetitionStats: hand-computed top/dup n-gram fractions") {
    import spark.implicits._
    val df = Seq(
      // "a b a b a": bigrams [a b, b a, a b, b a] → top count 2, tot 4,
      // dist 2; trigrams [a b a, b a b, a b a] → top 2, tot 3, dist 2
      (1L, "a b a b a"),
      // no repeats at all: every gram unique
      (2L, "one two three four"),
      // fewer tokens than n=3: trigram columns must be 0.0, not null
      (3L, "x y"),
      // degenerate loop: one token repeated — all grams identical
      (4L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(id: Long, c: String) = got(id).getDouble(got(id).fieldIndex(c))
    assert(got(1L).getLong(1) == 5L) // n_tokens
    assert(d(1L, "top2gram_frac") == 2.0 * 2 / 5)
    assert(d(1L, "dup2gram_frac") == 2.0 / 4)
    assert(d(1L, "top3gram_frac") == 2.0 * 3 / 5)
    assert(d(1L, "dup3gram_frac") == 1.0 / 3)
    assert(d(2L, "dup2gram_frac") == 0.0 && d(2L, "dup3gram_frac") == 0.0)
    assert(d(2L, "top2gram_frac") == 2.0 / 4)
    assert(d(3L, "top2gram_frac") == 1.0 && d(3L, "top3gram_frac") == 0.0)
    assert(d(3L, "dup3gram_frac") == 0.0)
    assert(d(4L, "dup2gram_frac") == 4.0 / 5) // 5 identical bigrams
    assert(d(4L, "top2gram_frac") == 5.0 * 2 / 6)
  }

  test("truncateTokens keeps head+tail of long docs, normalizes short ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),   // over budget
      (2L, "a  b   c"),                                 // short, messy spaces
      (3L, "")).toDF("doc_id", "text")
    val got = TextStats.truncateTokens(docs, maxTokens = 6, headTokens = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap
    // head 4 + tail 2 of w1..w10
    assert(got(1L) == ((10L, true, "w1 w2 w3 w4 w9 w10")))
    // under budget: untouched tokens, whitespace normalized
    assert(got(2L) == ((3L, false, "a b c")))
    assert(got(3L) == ((0L, false, "")))
    // budget-exact doc is NOT truncated
    val exact = Seq((1L, (1 to 6).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val e = TextStats.truncateTokens(exact, maxTokens = 6, headTokens = 4).head()
    assert(!e.getBoolean(3) && e.getString(4) == "t1 t2 t3 t4 t5 t6")
    intercept[IllegalArgumentException](
      TextStats.truncateTokens(docs, maxTokens = 4, headTokens = 4))
  }

  test("chunkTokens: window/overlap arithmetic, short docs, empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 35).map(i => s"t$i").mkString(" ")), // 35 toks: chunks at 0,15 -> 20+20
      (2L, "a b c"), //                                   one short chunk
      (3L, "   "), //                                     empty after trim -> no chunks
      (4L, (1 to 20).map(i => s"t$i").mkString(" "))) //  exactly one window
      .toDF("doc_id", "text")
    val out = TextStats.chunkTokens(docs, windowTokens = 20, overlapTokens = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L -> 0, 1L -> 1, 2L -> 0, 4L -> 0))
    assert(out((1L, 0))._1 == 20L && out((1L, 1))._1 == 20L)
    // stride 15: second chunk starts at t16, overlapping t16..t20
    assert(out((1L, 0))._2.endsWith("t19 t20"))
    assert(out((1L, 1))._2.startsWith("t16 t17"))
    assert(out((1L, 1))._2.endsWith("t34 t35"))
    assert(out((2L, 0)) == ((3L, "a b c")))
    assert(out((4L, 0))._1 == 20L)
    intercept[IllegalArgumentException](
      TextStats.chunkTokens(docs, windowTokens = 10, overlapTokens = 10))
  }

  test("chunkTokens invariants hold on randomized documents (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val docs = (0 until 40).map { i =>
      val n = rnd.nextInt(60) // includes 0-token docs
      (i.toLong, (1 to n).map(k => s"w$k").mkString("  ")) // ragged whitespace
    }
    val (w, o) = (7, 3)
    val out = TextStats.chunkTokens(docs.toDF("doc_id", "text"),
        windowTokens = w, overlapTokens = o)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getString(3)) }
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val chunks = out.getOrElse(id, Array.empty[String]).toSeq
      if (toks.isEmpty) assert(chunks.isEmpty, s"doc $id")
      else {
        // concatenating chunks with the overlap removed reconstructs the doc
        val rebuilt = chunks.head.split(" ").toSeq ++
          chunks.tail.flatMap(_.split(" ").drop(o))
        assert(rebuilt == toks, s"doc $id: $rebuilt != $toks")
        // every full window has exactly w tokens; only the last may be short
        chunks.dropRight(1).foreach(c => assert(c.split(" ").length == w))
        // consecutive chunks overlap by exactly o tokens
        chunks.sliding(2).foreach {
          case Seq(a, b) => assert(a.split(" ").takeRight(o).toSeq == b.split(" ").take(o).toSeq)
          case _ =>
        }
      }
    }
  }

  test("zipfFit recovers the slope of an exact power-law corpus") {
    import spark.implicits._
    // plant frequencies f(r) = round(1000 * r^-1): token w1 ×1000, w2 ×500,
    // w3 ×333 ... — OLS over ln-ln should come out near −1
    val words = (1 to 20).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"w$r%02d"))
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val row = TextStats.zipfFit(docs, topK = 20).head()
    assert(row.getLong(0) == 20L)
    assert(math.abs(row.getDouble(1) - (-1.0)) < 0.01, row.toString)
    // intercept ≈ ln 1000
    assert(math.abs(row.getDouble(2) - math.log(1000.0)) < 0.05, row.toString)
    intercept[IllegalArgumentException](TextStats.zipfFit(docs, topK = 5))
  }

  test("zipfFit is repartition-stable on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextStats.zipfFit(docs, topK = 50).head()
    val b = TextStats.zipfFit(docs.repartition(7), topK = 50).head()
    assert(a == b)
    assert(a.getDouble(1) < 0.0) // frequency falls with rank, always
  }

  test("distinctNgrams computes unique-gram ratios with degenerate-doc guards") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), //   distinct1 = 2/4; bigrams (a b)(b a)(a b) → 2/3
      (2L, "Solo"), //      one token: distinct1 = 1, distinct2 null
      (3L, "   "), //       no tokens: both null
      (4L, "x x x x x"), // fully repetitive: 1/5 and 1/4
      (5L, "p q r s")) //   fully diverse: 1.0 and 1.0
      .toDF("doc_id", "text")
    val got = TextStats.distinctNgrams(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(got(1L) == ((4L, 0.5, math.rint(2.0 / 3 * 10000) / 10000)))
    assert(got(2L) == ((1L, 1.0, -1.0)))
    assert(got(3L) == ((0L, -1.0, -1.0)))
    assert(got(4L) == ((5L, 0.2, 0.25)))
    assert(got(5L) == ((4L, 1.0, 1.0)))
  }

  test("lmScore: hand-computed add-one logprobs, OOV path, empty doc") {
    import spark.implicits._
    // train: a=2, b=2, c=1 → N=5, V=3, p(w) = (c+1)/8
    val train = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a a b"), // all in-vocab: avg = ln(3/8)
      (11L, "a z z"), // two OOV:     avg = (ln(3/8) + 2·ln(1/8)) / 3
      (12L, "")       // no tokens:   null score, zero counts
    ).toDF("doc_id", "text")
    val r = TextStats.lmScore(train, score).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) Double.NaN else x.getDouble(3)))).toMap
    assert(r(10L)._1 == 3 && r(10L)._2 == 0)
    assert(math.abs(r(10L)._3 - math.log(3.0 / 8)) < 1e-4)
    assert(r(11L)._1 == 3 && r(11L)._2 == 2)
    assert(math.abs(r(11L)._3 -
      (math.log(3.0 / 8) + 2 * math.log(1.0 / 8)) / 3) < 1e-4)
    assert(r(12L)._1 == 0 && r(12L)._2 == 0 && r(12L)._3.isNaN)
  }

  test("lmScore ranks fluent common-vocabulary text above rare-token soup") {
    import spark.implicits._
    val filler = (1 to 30).map(_ => "the data table scan").mkString(" ")
    val train = Seq((1L, filler), (2L, filler + " qzx vbn wry plm"))
      .toDF("doc_id", "text")
    val score = Seq((10L, "the data table scan the data"),
      (11L, "qzx vbn wry plm")).toDF("doc_id", "text")
    val got = TextStats.lmScore(train, score).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(got(10L) > got(11L))
  }

  test("lmScore is self-consistent and repartition-stable on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextStats.lmScore(docs, docs).collect().toSeq
    val b = TextStats.lmScore(docs.repartition(7), docs.repartition(5))
      .collect().toSeq
    assert(a == b && a.size == docs.count())
    // self-trained: every scored token is in vocab, scores strictly negative
    assert(a.forall(r => r.getLong(2) == 0))
    assert(a.forall(r => r.isNullAt(3) || r.getDouble(3) < 0))
  }

  test("distinctNgrams is case-insensitive and repartition-stable on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextStats.distinctNgrams(docs).collect().sortBy(_.getLong(0)).toSeq
    val b = TextStats.distinctNgrams(docs.repartition(7)).collect()
      .sortBy(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty)
    // ratios live in (0, 1]; bigram diversity ≥ unigram diversity is NOT
    // guaranteed in general but both must be positive on non-empty docs
    assert(a.forall { r =>
      r.getDouble(2) > 0 && r.getDouble(2) <= 1.0 &&
        (r.isNullAt(3) || (r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
    })
  }
}
