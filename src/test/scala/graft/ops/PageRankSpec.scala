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
}
