package graft.ext

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def items(n: Int) = {
    import spark.implicits._
    // token counts 5..54, deterministic
    (1 to n).map(i => (i.toLong, (i % 50 + 5).toLong)).toDF("doc_id", "n_tokens")
  }

  private def collectPack(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** In-memory replay of the same md5-ordered next-fit — the spec's
    * independent reference implementation.
    */
  private def reference(rows: Seq[(Long, Long)], budget: Long, numBuckets: Int,
      salt: String = "pack"): Map[Long, (Long, Long)] = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keyed = rows.map { case (id, n) =>
      val m = md5hex(salt + id)
      (java.lang.Long.parseLong(m.take(4), 16) % numBuckets, m, id, n)
    }
    keyed.groupBy(_._1).flatMap { case (bucket, rs) =>
      var fill = 0L; var seq = -1L
      rs.sortBy(r => (r._2, r._3)).map { case (_, _, id, n) =>
        if (seq < 0) { seq = 0; fill = n }
        else if (fill + n <= budget) fill += n
        else { seq += 1; fill = n }
        id -> (bucket, seq)
      }
    }.toMap
  }

  test("packing matches the reference next-fit and respects the budget") {
    val got = collectPack(Packing.packSequences(items(200), budget = 100, numBuckets = 8))
    assert(got.length == 200)
    val expect = reference((1 to 200).map(i => (i.toLong, (i % 50 + 5).toLong)), 100, 8)
    got.foreach { case (id, _, bucket, seq) => assert(expect(id) == (bucket, seq), s"doc $id") }
    // every (bucket, seq) bin's total fits the budget
    val bins = got.groupBy(r => (r._3, r._4)).values
    bins.foreach(b => assert(b.map(_._2).sum <= 100, b.toSeq))
  }

  test("deterministic under adversarial repartitioning and shuffle partitions") {
    val base = collectPack(Packing.packSequences(items(300), budget = 128, numBuckets = 16)).sorted.toSeq
    Seq(items(300).repartition(17), items(300).orderBy(rand(5)), items(300).coalesce(1))
      .foreach { d =>
        val got = collectPack(Packing.packSequences(d, budget = 128, numBuckets = 16)).sorted.toSeq
        assert(got == base)
      }
  }

  test("oversize items get singleton sequences and never corrupt the scan") {
    import spark.implicits._
    val mix = Seq((1L, 500L), (2L, 10L), (3L, 700L), (4L, 20L), (5L, 30L), (6L, 15L))
      .toDF("doc_id", "n_tokens")
    val got = collectPack(Packing.packSequences(mix, budget = 100, numBuckets = 1))
    // bucket 0 only; oversize docs 1 and 3 must sit alone in their bins
    val byBin = got.groupBy(r => r._4).view.mapValues(_.map(_._1).toSet).toMap
    val oversizeBins = got.filter(r => r._2 > 100).map(_._4)
    oversizeBins.foreach(b => assert(byBin(b).size == 1, s"bin $b"))
    // all small docs' bins respect the budget
    got.groupBy(_._4).values.filter(_.forall(_._2 <= 100))
      .foreach(b => assert(b.map(_._2).sum <= 100))
  }

  test("docCol keeps a document's chunks contiguous and in order") {
    import spark.implicits._
    // 40 docs x 1..5 chunks of 30 tokens, chunk_id = doc*100 + idx
    val chunks = (1 to 40).flatMap { d =>
      (0 until (d % 5 + 1)).map(i => (d * 100L + i, d.toLong, 30L))
    }.toDF("chunk_id", "doc_id", "n_tokens")
    val got = Packing.packSequences(chunks, budget = 100, numBuckets = 4,
        idCol = "chunk_id", docCol = "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // per doc: one bucket, seq non-decreasing along chunk order
    got.groupBy(_._1 / 100).foreach { case (doc, rows) =>
      val inOrder = rows.sortBy(_._1)
      assert(inOrder.map(_._2).distinct.length == 1, s"doc $doc spans buckets")
      val seqs = inOrder.map(_._3)
      assert(seqs.zip(seqs.tail).forall { case (a, b) => b == a || b == a + 1 },
        s"doc $doc chunks not contiguous: ${seqs.toSeq}")
    }
    // budget still respected (30-token chunks -> at most 3 per sequence)
    got.groupBy(r => (r._2, r._3)).values.foreach(b => assert(b.length * 30 <= 100))
  }

  test("packing wastes little: bins are well filled on a uniform corpus") {
    val got = collectPack(Packing.packSequences(items(500), budget = 128, numBuckets = 4))
    val bins = got.groupBy(r => (r._3, r._4)).view.mapValues(_.map(_._2).sum).toMap
    val mean = bins.values.sum.toDouble / bins.size
    // next-fit on ~30-token items against a 128 budget: mean fill >= 75%
    assert(mean >= 96.0, s"mean bin fill $mean")
  }
}
