package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private def edgesDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Scala unroll of the exact integer recurrence both engines implement —
    * the spec's independent third voice next to pageRank and pageRankSql.
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Int = 85): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = (100L - dampingPct) * 1000000L / 100L
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n -> (base + dampingPct * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("asymmetric graph: sink-only and source-only nodes keep base mass") {
    // 1→2, 1→3, 2→3: node 3 is a pure sink (no out-edges), node 1 has no
    // in-edges — the exact shape where the old inner-join SQL mirror
    // dropped nodes. Hand-unrolled iters=2 expectation:
    //   r1 = (1: 150000, 2: 575000, 3: 1425000)
    //   r2 = (1: 150000, 2: 213750, 3: 702500)
    val got = ranks(PageRank.pageRank(edgesDf(1L -> 2L, 1L -> 3L, 2L -> 3L), iters = 2))
    assert(got == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
    assert(got == reference(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L), iters = 2))
  }

  test("SQL mirror keeps the full node universe on asymmetric graphs") {
    val sql = PageRank.pageRankSql("SELECT 1 AS src, 2 AS dst", iters = 3)
    // node universe = src ∪ dst, recurrence left-joins onto it
    assert(sql.contains("nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)"))
    assert(sql.contains("r0 AS (SELECT node"))
    (1 to 3).foreach(i => assert(sql.contains(s"FROM nodes n LEFT JOIN c$i")))
    // edges normalized exactly like the Spark side
    assert(sql.contains("SELECT DISTINCT src, dst FROM"))
  }

  test("deterministic under adversarial repartitioning and duplicate edges") {
    val edges = (1L to 40L).flatMap(i => Seq(i -> (i % 40 + 1), (i % 40 + 1) -> i))
    val expected = reference(edges, iters = 5)
    Seq(
      edgesDf(edges: _*),
      edgesDf(edges: _*).repartition(13),
      edgesDf((edges ++ edges.take(17)): _*).orderBy(rand(7)) // dup edges, shuffled
    ).foreach { d =>
      assert(ranks(PageRank.pageRank(d, iters = 5)) == expected)
    }
  }

  test("mass conservation on a symmetric regular graph") {
    // symmetric ring: every node deg 2, perfectly regular → every rank
    // stays exactly at the fixed point 1.0 (base + 85% of 1.0)
    val ring = (1L to 10L).flatMap(i => Seq(i -> (i % 10 + 1), (i % 10 + 1) -> i))
    val got = ranks(PageRank.pageRank(edgesDf(ring: _*), iters = 4))
    assert(got.values.forall(_ == 1000000L), got)
  }

  test("25 iterations complete with the default lineage checkpointing") {
    val edges = edgesDf(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val got = ranks(PageRank.pageRank(edges, iters = 25))
    assert(got == reference(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L), iters = 25))
  }

  test("long runs without checkpointing are rejected loudly") {
    val e = edgesDf(1L -> 2L)
    intercept[IllegalArgumentException] {
      PageRank.pageRank(e, iters = 25, checkpointEvery = 0)
    }
  }

  test("self-loops feed a node's own rank back through the recurrence") {
    // 1⇄2 plus a self-loop on 1: deg(1)=2, deg(2)=1
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 1L)
    val got = ranks(PageRank.pageRank(edgesDf(edges: _*), iters = 3))
    assert(got == reference(edges, iters = 3))
    assert(got.keySet == Set(1L, 2L))
  }

  test("empty edge frame yields an empty result, not a failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.pageRank(empty, iters = 2).collect().isEmpty)
  }

  /** The [[reference]] unroll with seed-gated restart mass and init. */
  private def pprReference(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int, dampingPct: Int = 85): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = (100L - dampingPct) * 1000000L / 100L
    var r = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n ->
        ((if (seeds(n)) base else 0L) + dampingPct * in.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("personalized rank decays with distance from the seed") {
    // chain 1→2→3→4, seed {1}: mass enters only at 1 and dilutes hop by hop
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val got = ranks(PageRank.personalizedPageRank(edgesDf(chain: _*),
      seeds = Seq(1L), iters = 4))
    assert(got == pprReference(chain, Set(1L), iters = 4))
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L))
    // a non-seed node with no path from the seed holds zero rank
    val forked = chain :+ (5L -> 4L)
    val got2 = ranks(PageRank.personalizedPageRank(edgesDf(forked: _*),
      seeds = Seq(1L), iters = 4))
    assert(got2(5L) == 0L)
  }

  test("seeding every node reproduces the global walk") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L)
    val global = ranks(PageRank.pageRank(edgesDf(edges: _*), iters = 3))
    val allSeeds = ranks(PageRank.personalizedPageRank(edgesDf(edges: _*),
      seeds = Seq(1L, 2L, 3L), iters = 3))
    assert(global == allSeeds)
  }

  test("personalized walk matches the SQL mirror's recurrence shape and is stable") {
    val edges = (1L to 30L).flatMap(i => Seq(i -> (i % 30 + 1), (i % 30 + 1) -> i))
    val expected = pprReference(edges, Set(1L, 2L), iters = 5)
    Seq(
      edgesDf(edges: _*),
      edgesDf(edges: _*).repartition(13),
      edgesDf((edges ++ edges.take(9)): _*).orderBy(rand(3))
    ).foreach { d =>
      assert(ranks(PageRank.personalizedPageRank(d, Seq(1L, 2L), iters = 5))
        == expected)
    }
    val sql = PageRank.personalizedPageRankSql("SELECT 1 AS src, 2 AS dst",
      Seq(2L, 1L), iters = 2)
    // seed list is deduped+sorted into the literal; universe left-joined
    assert(sql.contains("IN (1, 2)"))
    (1 to 2).foreach(i => assert(sql.contains(s"FROM nodes n LEFT JOIN c$i")))
    // seeds outside the graph contribute nothing — all-zero ranks, no rows lost
    val offGraph = ranks(PageRank.personalizedPageRank(
      edgesDf(1L -> 2L, 2L -> 1L), seeds = Seq(99L), iters = 3))
    assert(offGraph == Map(1L -> 0L, 2L -> 0L))
  }

  test("empty seed set is rejected loudly") {
    intercept[IllegalArgumentException] {
      PageRank.personalizedPageRank(edgesDf(1L -> 2L), seeds = Seq.empty, iters = 2)
    }
  }
}
