package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark join"), // tf(spark)=3, dl=4
      (2L, "spark join join"), //        tf(spark)=1, dl=3
      (3L, "filter scan shuffle"), //    no query terms
      (4L, "spark")) //                  tf(spark)=1, dl=1
      .toDF("doc_id", "text")
  }

  private def bm25Ref(tf: Long, dl: Long, df: Long, n: Long, sumDl: Long,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val avgdl = sumDl.toDouble / n
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    math.rint(raw * 10000) / 10000
  }

  test("bm25Join equals per-term bm25 summed, fixed-point, top-k ranked") {
    import spark.implicits._
    val q = Seq((1L, "spark"), (1L, "join"), (2L, "filter")).toDF("q_id", "term")
    val got = Ranking.bm25Join(corpus, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3))))
      .toMap
    // reference: sum the 4dp per-term bm25 scores (fixed-point: exact sums
    // of 1e4-scaled longs), rank by (score desc, doc_id)
    val per = Ranking.bm25(corpus, Seq("spark", "join", "filter")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4)).toMap
    def s(qid: Long, terms: Seq[String], doc: Long): Double =
      terms.flatMap(t => per.get((t, doc))).map(x => math.round(x * 10000)).sum / 10000.0
    val q1docs = Seq(1L, 2L, 4L) // docs matching spark|join
    val want1 = q1docs.map(d => d -> s(1L, Seq("spark", "join"), d))
      .sortBy { case (d, sc) => (-sc, d) }
      .zipWithIndex.map { case ((d, sc), i) => (1L, d) -> ((sc, i + 1)) }
    want1.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} vs $v") }
    // q2 = filter: only doc 3
    assert(got((2L, 3L))._2 == 1 && got.keys.count(_._1 == 2L) == 1)
    // terms absent from the corpus produce nothing, queries are distinct-safe
    val dup = Seq((5L, "spark"), (5L, "spark"), (6L, "zzz_missing")).toDF("q_id", "term")
    val g2 = Ranking.bm25Join(corpus, dup, k = 3).collect()
    assert(g2.forall(_.getLong(0) == 5L), "dup terms double-counted or missing q dropped")
  }

  test("readability: hand counts and formula, fragment floor, vowel groups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat. it ran!"),      // 5 words, 2 sentences, 5 syllable groups
      (2L, "word"),                       // fragment: sentences floor to 1
      (3L, "")).toDF("doc_id", "text")    // empty: words=[""] -> 1, syllables 0
    val out = TextStats.readability(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    def fl(w: Long, se: Long, sy: Long) =
      math.rint((206.835 - 1.015 * (w.toDouble / se) - 84.6 * (sy.toDouble / w)) * 10000) / 10000
    assert(out(1L) == ((5L, 2L, 5L, fl(5, 2, 5))), out(1L).toString)
    assert(out(2L) == ((1L, 1L, 1L, fl(1, 1, 1))))
    assert(out(3L)._2 == 1L && out(3L)._3 == 0L)
  }

  test("tfIdfTopTerms: hand-checked scores, df pruning, rank ties to term asc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "alpha gamma common"),
      (3L, "beta gamma common"),
      (4L, "delta common")).toDF("doc_id", "text")
    // N=4; df: alpha 2, beta 2, gamma 2, common 4, delta 1
    // maxDfFrac 0.5 prunes common (df 4 > 2); minDf 2 prunes delta (df 1)
    val out = Ranking.tfIdfTopTerms(docs, k = 2, minDf = 2, maxDfFrac = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(5)) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    def sc(tf: Long, df: Long) = math.rint(tf * math.log(4.0 / df) * 10000) / 10000
    // doc 1: alpha tf=2 beats beta tf=1
    assert(out((1L, 1)) == (("alpha", 2L, 2L, sc(2, 2))))
    assert(out((1L, 2)) == (("beta", 1L, 2L, sc(1, 2))))
    // doc 2: alpha/gamma tie on score -> term asc breaks it
    assert(out((2L, 1))._1 == "alpha" && out((2L, 2))._1 == "gamma")
    // doc 4: delta pruned by minDf, common by maxDfFrac -> no rows at all
    assert(!out.keys.exists(_._1 == 4L))
    // every score matches the fixed textual order formula
    out.values.foreach { case (_, tf, df, s) => assert(s == sc(tf, df)) }
  }

  test("bm25 matches the hand formula on every matching (term, doc)") {
    val out = Ranking.bm25(corpus, Seq("spark", "join")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // N=4, Σdl=11; df(spark)=3, df(join)=2
    assert(out.keySet == Set("spark" -> 1L, "spark" -> 2L, "spark" -> 4L,
      "join" -> 1L, "join" -> 2L))
    assert(out(("spark", 1L)) == ((3L, 4L, bm25Ref(3, 4, 3, 4, 11))))
    assert(out(("spark", 4L)) == ((1L, 1L, bm25Ref(1, 1, 3, 4, 11))))
    assert(out(("join", 2L)) == ((2L, 3L, bm25Ref(2, 3, 2, 4, 11))))
    // rarer term (join, df=2) outranks the common one at equal tf and dl
    assert(out(("join", 1L))._3 > out(("spark", 1L))._3 ||
      out(("join", 1L))._1 < out(("spark", 1L))._1)
  }

  test("bm25 length normalization: same tf scores higher in the shorter doc") {
    val out = Ranking.bm25(corpus, Seq("spark")).collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(out(4L) > out(2L), s"dl=1 ${out(4L)} should beat dl=3 ${out(2L)}")
  }

  test("bm25TopK sums per-term scores and bounds the result") {
    val top = Ranking.bm25TopK(corpus, Seq("spark", "join"), k = 2).collect()
    assert(top.length == 2)
    // doc 2 ranks first: tf=2 on the RARER term (join, idf ln2) in a shorter
    // doc beats doc 1's tf=3 on the common term — the classic BM25 ordering
    assert(top.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(top.head.getLong(2) == 2L) // n_terms_hit
    val scores = top.map(_.getDouble(1))
    assert(scores.sorted.reverse.toSeq == scores.toSeq)
  }

  test("tfidf weights rare terms up and absent terms out") {
    val out = Ranking.tfidf(corpus, Seq("spark", "join", "filter")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // filter: df=1 of 4 docs → idf ln(4); spark df=3 → ln(4/3)
    val f = out(("filter", 3L))
    assert(math.abs(f - math.rint(math.log(4.0) * 10000) / 10000) < 1e-9)
    assert(!out.contains(("spark", 3L)))
    // equal tf: rarer term weighs more
    assert(out(("join", 2L)) / 2 > out(("spark", 2L)))
  }

  test("bm25 rejects an oversized term list") {
    intercept[IllegalArgumentException](
      Ranking.bm25(corpus, (1 to 65).map(i => s"t$i")))
    intercept[IllegalArgumentException](Ranking.bm25(corpus, Nil))
  }

  test("rankByScore assigns total 1-based ranks with id tie-breaks") {
    import spark.implicits._
    val scored = Seq((10L, 0.5), (11L, 0.9), (12L, 0.5), (13L, 0.1))
      .toDF("doc_id", "score")
    val got = Ranking.rankByScore(scored, "score", "doc_id", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0.9 first; the 0.5 tie breaks on the LOWER id; 0.1 falls off at k=3
    assert(got == Map(11L -> 1L, 10L -> 2L, 12L -> 3L))
    intercept[IllegalArgumentException](
      Ranking.rankByScore(scored, "score", "doc_id", 0))
  }

  test("rrfFuse is the hand formula, handles one-sided ids, orders best-first") {
    import spark.implicits._
    val a = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val b = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = Ranking.rrfFuse(a, b, "doc_id", k0 = 60).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3)))
    def rr(x: Double) = math.rint(x * 1000000) / 1000000
    // doc 2 appears in BOTH lists and wins despite never ranking first
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(got(0) == ((2L, 2L, 1L, rr(1.0 / 62 + 1.0 / 61))))
    assert(got(1) == ((1L, 1L, -1L, rr(1.0 / 61)))) // absent list adds 0
    assert(got(2) == ((3L, -1L, 2L, rr(1.0 / 62))))
  }

  test("rrf hybrid fusion runs end-to-end on real testdata") {
    val dir = "/root/testdata/sf0.001"
    val lex = Ranking.bm25(spark.read.parquet(s"$dir/documents.parquet"), Seq("spark"))
      .select(col("doc_id"), col("score"))
    val sem = Similarity.bruteForceTopK(
      spark.read.parquet(s"$dir/embeddings.parquet"), queryId = 0L, k = 20)
      .withColumnRenamed("vec_id", "doc_id")
    val fused = Ranking.rrfFuse(
      Ranking.rankByScore(lex, "score", "doc_id", 20),
      Ranking.rankByScore(sem, "cosine", "doc_id", 20), "doc_id").collect()
    assert(fused.length >= 20 && fused.length <= 40) // union of two top-20s
    val scores = fused.map(_.getDouble(3))
    assert(scores.sorted.reverse.toSeq == scores.toSeq)
    // every fused score is attainable from two ranks ≤ 20
    assert(scores.head <= 1.0 / 61 + 1.0 / 61 + 1e-9)
  }

  private def discRef(r: Long): Long =
    math.round(1000000.0 * math.log(2.0) / math.log(r + 1.0))

  test("ndcgAtK matches the hand-computed graded formula") {
    import spark.implicits._
    // query q1: graded rels (3,2,0,1) at ranks 1..4, k=3
    val judged = Seq(
      ("q1", 1L, 3L), ("q1", 2L, 2L), ("q1", 3L, 0L), ("q1", 4L, 1L),
      // q2: perfectly ranked binary list
      ("q2", 1L, 1L), ("q2", 2L, 1L), ("q2", 3L, 0L),
      // q3: worst ranking — the one relevant doc is last
      ("q3", 1L, 0L), ("q3", 2L, 0L), ("q3", 3L, 1L),
      // q4: nothing relevant
      ("q4", 1L, 0L), ("q4", 2L, 0L)).toDF("query", "rnk", "rel")
    val got = Ranking.ndcgAtK(judged, "query", "rnk", "rel", k = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    val dcg1 = 3 * discRef(1) + 2 * discRef(2) // + 0·d(3); rank 4 outside k
    val idcg1 = 3 * discRef(1) + 2 * discRef(2) + 1 * discRef(3)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("q1") == ((4L, 3L, Some(r4(dcg1.toDouble / idcg1)))))
    assert(got("q2") == ((3L, 2L, Some(1.0)))) // ideal order scores exactly 1
    assert(got("q3") == ((3L, 1L,
      Some(r4(discRef(3).toDouble / discRef(1))))))
    assert(got("q4") == ((2L, 0L, None))) // no relevant → null, not 0
    intercept[IllegalArgumentException](
      Ranking.ndcgAtK(judged, "query", "rnk", "rel", k = 0))
  }

  test("ndcgAtK is repartition-stable and order-bounded on a real ranking") {
    import spark.implicits._
    // deterministic pseudo-ranking: 3 queries × 50 docs, rel from a residue
    val judged = (for {
      q <- 1 to 3; r <- 1L to 50L
    } yield (s"q$q", r, if ((r * q) % 7 == 0) 1L else 0L))
      .toDF("query", "rnk", "rel")
    val a = Ranking.ndcgAtK(judged, "query", "rnk", "rel", k = 10)
      .orderBy("query").collect().toSeq
    val b = Ranking.ndcgAtK(judged.repartition(7), "query", "rnk", "rel", k = 10)
      .orderBy("query").collect().toSeq
    assert(a == b && a.nonEmpty)
    a.foreach { r =>
      Option(r.get(3)).map(_.asInstanceOf[Double]).foreach { v =>
        assert(v >= 0.0 && v <= 1.0, r.toString)
      }
    }
  }
}
