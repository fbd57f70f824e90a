package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // benchmark doc 100 contributes 3-grams of "the quick brown fox jumps";
  // corpus doc 1 repeats that span verbatim (contaminated), doc 2 shares
  // words but no 3-gram, doc 3 is disjoint, doc 4 is too short to shingle.
  private def frames = {
    import spark.implicits._
    val corpus = Seq(
      (1L, "intro text the quick brown fox jumps over something"),
      (2L, "quick fox and brown dog walk the park"),
      (3L, "completely unrelated material about spark plans"),
      (4L, "too short")).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    (corpus, bench)
  }

  test("ngramHits counts distinct shared n-grams, keeps zero-hit and unshingleable rows") {
    val (corpus, bench) = frames
    val out = Decontaminate.ngramHits(corpus, bench).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // "the quick brown fox jumps" has 3 distinct 3-grams, all inside doc 1
    assert(out(1L) == ((3L, true)), out.toString)
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
    assert(out(4L) == ((0L, false)))
    assert(out.size == 4)
  }

  test("shuffled-join variant matches the broadcast default") {
    val (corpus, bench) = frames
    val a = Decontaminate.ngramHits(corpus, bench).collect().map(_.toSeq).toSet
    val b = Decontaminate.ngramHits(corpus, bench, broadcastBenchmark = false)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("removeContaminated drops exactly the flagged rows, schema untouched") {
    val (corpus, bench) = frames
    val clean = Decontaminate.removeContaminated(corpus, bench)
    assert(clean.columns.toSeq == corpus.columns.toSeq)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    // a stricter threshold keeps the lightly-overlapping row
    val lax = Decontaminate.removeContaminated(corpus, bench, minHits = 4L)
    assert(lax.count() == 4)
  }

  test("flagContaminated (literal set) matches the join-based ngramHits") {
    val (corpus, bench) = frames
    val grams = Decontaminate.collectBenchmarkNgrams(bench)
    val inline = Decontaminate.flagContaminated(corpus, grams)
      .select("doc_id", "n_hits", "contaminated")
      .collect().map(_.toSeq).toSet
    val joined = Decontaminate.ngramHits(corpus, bench)
      .collect().map(_.toSeq).toSet
    assert(inline == joined)
  }

  test("streaming curation: decontam flag + stratified mix run on an unbounded stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (corpus, bench) = frames
    val grams = Decontaminate.collectBenchmarkNgrams(bench)
    val stream = MemoryStream[(Long, String, String)]
    val streamed = stream.toDF().toDF("doc_id", "text", "lang")
    // the full stateless curation chain: contamination flag, then data mixing
    val curated = graft.ops.Splits.stratifiedSampleByHash(
      Decontaminate.flagContaminated(streamed, grams).where(!col("contaminated")),
      stratumCol = "lang", pcts = Map("en" -> 100), idCol = "doc_id")
    val q = curated.writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      stream.addData(
        (1L, "intro text the quick brown fox jumps over something", "en"),
        (3L, "completely unrelated material about spark plans", "en"),
        (4L, "too short", "en"))
      q.processAllAvailable()
      val got = spark.table("curation_stream").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      // doc 1 is contaminated → dropped; 3 and 4 survive the en=100% mix
      assert(got == Set(3L, 4L))
    } finally q.stop()
  }

  test("semanticHits flags embedding-space leakage the n-gram probe cannot see") {
    import spark.implicits._
    // doc 1 IS a benchmark vector (paraphrase leakage: identical embedding,
    // different id); doc 2 is near it; doc 3 is orthogonal
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.7, 0.7, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticHits(corpus, bench, minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((1.0, true)), got.toString)
    assert(got(2L)._1 > 0.5 && got(2L)._1 < 0.99 && !got(2L)._2, got.toString)
    assert(got(3L) == ((0.0, false)))
    assert(got.size == 3)
    // shuffled-join variant matches the broadcast default
    val b = Decontaminate.semanticHits(corpus, bench, minCosine = 0.99,
      broadcastBenchmark = false).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(b == got)
    // removal drops exactly the flagged row, schema untouched
    val clean = Decontaminate.removeSemanticContaminated(corpus, bench)
    assert(clean.columns.toSeq == corpus.columns.toSeq)
    assert(clean.select("vec_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("semanticHits fused matrix loop ≡ the pairwise crossJoin form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, max, round}
    // deterministic pseudo-random corpus incl. a zero vector (NaN cosine),
    // a length-mismatched vector, and exact/near benchmark copies
    def vec(seed: Long, dim: Int): Seq[Double] =
      (0 until dim).map(i => ((seed * 2654435761L + i * 40503L) % 1000L).toDouble / 500.0 - 1.0)
    val corpus = ((1L to 40L).map(i => (i, vec(i, 8))) ++
      Seq((90L, Seq.fill(8)(0.0)), (91L, vec(3L, 5)), (92L, vec(7L, 8)))).toDF("vec_id", "embedding")
    val bench = Seq((100L, vec(7L, 8)), (101L, vec(11L, 8)), (102L, vec(13L, 8)))
      .toDF("vec_id", "embedding")
    // NaN-safe row images (Double NaN != NaN under ==; bit-compare instead)
    def img(v: Option[Any]): Option[Any] = v.map {
      case d: Double => java.lang.Double.doubleToLongBits(d)
      case other => other
    }
    // the retired pairwise formulation, inline, as the semantics oracle
    val pairwise = corpus
      .select(col("vec_id").as("__id"), col("embedding").cast("array<double>").as("__v"))
      .crossJoin(broadcast(bench.select(col("embedding").cast("array<double>").as("__b_v"))))
      .groupBy(col("__id"))
      .agg(max(round(Similarity.cosine(col("__v"), col("__b_v")), 4)).as("max_cosine"))
      .select(col("__id").as("vec_id"), col("max_cosine"),
        (col("max_cosine") >= 0.99).as("contaminated"))
      .collect().map(r => r.getLong(0) -> ((img(Option(r.get(1))), Option(r.get(2))))).toMap
    val fused = Decontaminate.semanticHits(corpus, bench, minCosine = 0.99)
      .collect().map(r => r.getLong(0) -> ((img(Option(r.get(1))), Option(r.get(2))))).toMap
    assert(fused == pairwise)
    // the length-mismatched row survives with a null max (every pair null)
    assert(fused(91L) == ((None, None)), fused(91L).toString)
    // empty benchmark → empty result (nothing to test against)
    assert(Decontaminate.semanticHits(corpus, bench.limit(0)).count() == 0L)
  }

  test("semanticHits edge pins: all-null benchmark and duplicate corpus ids") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),
      (1L, Seq(0.0, 1.0)), // DUPLICATE id, different vector
      (2L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    // all-null benchmark embeddings collapse to an empty matrix
    // (collect_list skips nulls) → empty result, same as an empty
    // benchmark. INTENTIONAL divergence from the retired pairwise form,
    // which emitted every corpus row with a null max_cosine (ADVICE r13).
    val nullBench = Seq((100L, Option.empty[Seq[Double]]))
      .toDF("vec_id", "embedding")
    assert(Decontaminate.semanticHits(corpus, nullBench).count() == 0L)
    // duplicate corpus ids each keep their own row (one output row per
    // corpus ROW — the pairwise groupBy(id) silently merged them)
    val bench = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val rows = Decontaminate.semanticHits(corpus, bench, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.length == 3, rows.mkString(","))
    assert(rows.count(_._1 == 1L) == 2)
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0.0, 1.0))
  }

  test("a doc sharing the same n-gram with MANY benchmark docs counts it once") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma"),
      (101L, "prefix words alpha beta gamma")).toDF("doc_id", "text")
    val out = Decontaminate.ngramHits(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "alpha beta gamma" appears in both benchmark docs → still 1 distinct hit
    // (plus "beta gamma delta" is nowhere in the benchmark)
    assert(out(1L) == 1L, out.toString)
  }
}
