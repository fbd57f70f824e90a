package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fluent = Seq(
    "the cat sat on the mat and the dog sat on the rug",
    "the dog sat on the mat and the cat sat on the rug",
    "the cat and the dog sat on the mat",
    "a cat sat on a mat and a dog sat on a rug",
    "the bird sat on the mat and the cat sat on the rug")
  private val noise = Seq(
    "zqx vbnm wert plok juhy",
    "mnbv cxza lkjh gfds qwer")

  private def corpus = {
    import spark.implicits._
    (fluent ++ noise).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** Independent in-memory replay of the add-k bigram LM scoring. */
  private def refScores(train: Seq[(Long, String)], score: Seq[(Long, String)],
      addK: Int): Map[Long, (Long, Long, Double)] = {
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bigs(ts: Seq[String]) =
      if (ts.size < 2) Seq.empty[(String, String)]
      else ts.sliding(2).map(s => (s(0), s(1))).toSeq
    val trainToks = train.map { case (_, t) => toks(t) }
    val uni = trainToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = uni.size.toLong
    val big = trainToks.flatMap(bigs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    score.map { case (id, t) =>
      val lps = bigs(toks(t)).map { case (u, w) =>
        BigDecimal(math.log((big.getOrElse((u, w), 0L) + addK).toDouble /
          (uni.getOrElse(u, 0L) + addK * v).toDouble) * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val n = lps.size.toLong
      id -> (n, lps.sum, if (n == 0) 0.0 else lps.sum.toDouble / (n * 10000).toDouble)
    }.toMap
  }

  private def collectScores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  test("lmScore matches the in-memory reference exactly") {
    val got = collectScores(LangModel.lmScore(corpus))
    val all = (fluent ++ noise).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val want = refScores(all, all, addK = 1)
    assert(got == want)
  }

  test("fluent docs outscore gibberish under the corpus LM") {
    val got = collectScores(LangModel.lmScore(corpus))
    val fluentAvg = (0 until fluent.size).map(i => got(i.toLong)._3)
    val noiseAvg = (fluent.size until fluent.size + noise.size).map(i => got(i.toLong)._3)
    assert(fluentAvg.min > noiseAvg.max,
      s"fluent=$fluentAvg noise=$noiseAvg")
  }

  test("short docs score (0, 0, 0.0) — no evidence, not perfect") {
    import spark.implicits._
    val d = Seq((1L, "hello"), (2L, ""), (3L, "  "), (4L, "a b")).toDF("doc_id", "text")
    val got = collectScores(LangModel.lmScore(d))
    assert(got(1L) == ((0L, 0L, 0.0)))
    assert(got(2L) == ((0L, 0L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L)._1 == 1L)
  }

  test("deterministic under adversarial repartitioning") {
    val base = collectScores(LangModel.lmScore(corpus))
    Seq(corpus.repartition(13), corpus.orderBy(rand(7)), corpus.coalesce(1))
      .foreach(d => assert(collectScores(LangModel.lmScore(d)) == base))
  }

  test("scoreAgainst a foreign LM: unseen bigrams hit the smoothed floor") {
    import spark.implicits._
    val train = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val score = Seq((10L, "zq wx zq wx")).toDF("doc_id", "text")
    val got = collectScores(LangModel.scoreAgainst(score, train))
    // every bigram unseen, every prefix unseen: lp = ln(1 / V) each, V = 5
    val lp = BigDecimal(math.log(1.0 / 5) * 10000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(got(10L) == ((3L, 3 * lp, (3 * lp).toDouble / 30000.0)))
  }

  test("dsirLogWeights favors target-like docs and drops no-evidence docs") {
    import spark.implicits._
    val corpusDf = Seq(
      (1L, "stocks fell and bonds rose on friday"),
      (2L, "the cat sat on the mat quietly"),
      (3L, "x")).toDF("doc_id", "text")
    val targetDf = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "the dog sat on the mat")).toDF("doc_id", "text")
    val w = LangModel.dsirLogWeights(corpusDf, targetDf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(!w.contains(3L)) // single token: no bigram evidence
    assert(w(2L) > w(1L), s"target-like doc must outweigh off-domain doc: $w")
  }

  test("dsirSample matches the brute-force Gumbel top-k replay") {
    val all = (fluent ++ noise).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val corpusRows = all.filter(_._1 % 3 != 0)
    val targetRows = all.filter(_._1 % 3 == 0)
    import spark.implicits._
    val corpusDf = corpusRows.toDF("doc_id", "text")
    val targetDf = targetRows.toDF("doc_id", "text")

    val sTgt = refScores(targetRows, corpusRows, addK = 1)
    val sSelf = refScores(corpusRows, corpusRows, addK = 1)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = corpusRows.map(_._1)
      .filter(id => sSelf(id)._1 > 0)
      .map { id =>
        val logw = sTgt(id)._2 - sSelf(id)._2
        val h = java.lang.Long.parseLong(md5hex("dsir" + id).take(4), 16)
        val u = (h + 0.5) / 65536.0
        val g = BigDecimal(-math.log(-math.log(u)) * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (id, logw, logw + g)
      }
      .sortBy { case (id, _, key) => (-key, id) }
      .take(3)

    val got = LangModel.dsirSample(corpusDf, targetDf, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
