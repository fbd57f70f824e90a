package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative PageRank as a DataFrame loop — the graph-analytics operator a
  * link/citation/co-occurrence corpus needs (reference scope has no graph
  * ops; this rounds out the engine the same way the GraphX connected
  * components in `ext.Dedup.dupGroups` did for clustering).
  *
  * Engine-deterministic by construction: ranks are FIXED-POINT LONGS
  * (micro-units, 1.0 ≡ 1 000 000), per-edge contributions are integer
  * `div`s, and the damping step is `base + (d·mass) div 100` — every
  * operation is associative integer arithmetic, so the result is identical
  * regardless of partitioning, reduction order, or engine (the DuckDB
  * oracle unrolls the same recurrence; see [[pageRankSql]]). This is the
  * same determinism discipline as `Reference.msum`, applied to an iterative
  * algorithm. Convention matches GraphX's unnormalized form: every node
  * starts with mass 1.0, new = (1−d) + d·Σ incoming (total mass ≈ N, not 1).
  *
  * Scale shape: each iteration is ONE shuffle (groupBy dst of the
  * contribution stream); the edge⋈degree frame is computed once and
  * persisted so iterations re-read a materialized compact edge list, not
  * the source scan. `checkpointEvery` (default 5) truncates lineage with
  * `localCheckpoint` — each iteration's plan embeds the previous one, so
  * without truncation analyzer cost grows multiplicatively and a 30–50
  * iteration run stalls the driver before a task launches. At 100 TB graph
  * scale you run this exactly like GraphX's Pregel: materialize per
  * iteration, shuffle contributions only.
  * Dangling nodes (out-degree 0) keep their base mass but leak the damped
  * share, as in the classic simplified formulation; on a symmetrized graph
  * (the common co-occurrence case, and the e23 query) none exist.
  */
object PageRank {

  private val Micro = 1000000L

  /** Run `iters` damped iterations over directed (src, dst) edges.
    * Output: (node, rank_micro, rank) totally ordered by node.
    */
  def pageRank(edges: DataFrame, iters: Int = 5, dampingPct: Int = 85,
      checkpointEvery: Int = 5): DataFrame = {
    val base = (100 - dampingPct) * Micro / 100
    iterate(edges, iters, dampingPct, checkpointEvery,
      baseOf = _ => lit(base), initOf = _ => lit(Micro))
  }

  /** Personalized PageRank: the teleport lands only on `seeds`, so rank
    * measures proximity to the seed set rather than global centrality —
    * the "related items" / "similar users" primitive over the same
    * co-occurrence graphs [[pageRank]] ranks globally. Same unnormalized
    * micro-units convention: each SEED starts at 1.0 and receives the
    * (1−d) restart share every step; every other node starts at 0 and
    * earns mass only through in-edges. Seeds absent from the edge list are
    * ignored (the node universe is src ∪ dst). The seed membership test is
    * a literal IN over the node id — seed sets are small by definition
    * (a query vector, not a table); a frame-sized personalization vector
    * would join instead.
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iters: Int = 5, dampingPct: Int = 85,
      checkpointEvery: Int = 5): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs at least one seed")
    val base = (100 - dampingPct) * Micro / 100
    def isSeed(node: Column) = node.isin(seeds.distinct: _*)
    iterate(edges, iters, dampingPct, checkpointEvery,
      baseOf = n => when(isSeed(n), lit(base)).otherwise(lit(0L)),
      initOf = n => when(isSeed(n), lit(Micro)).otherwise(lit(0L)))
  }

  /** The shared damped-iteration loop: `baseOf`/`initOf` map the node id
    * column to that node's restart mass and starting rank (constants for
    * the global walk, seed-gated for the personalized one).
    */
  private def iterate(edges: DataFrame, iters: Int, dampingPct: Int,
      checkpointEvery: Int, baseOf: Column => Column,
      initOf: Column => Column): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    require(iters <= 10 || checkpointEvery > 0,
      s"iters=$iters without lineage truncation: each iteration's plan embeds " +
        "the previous one, so long runs need checkpointEvery > 0")

    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the compact edge list ONCE (round 16): ew's plan embeds
    // `e` twice (join with its own degree table) and nodes' twice more —
    // uncached, a cold run re-parses and re-distincts the source four
    // times. One eager count builds e's cache; ew/nodes materialize from
    // it; e is released before the iterations (they read only ew/nodes).
    e.count()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // compact (src, dst, deg) edge list, reused every iteration
    val ew = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    // the node universe is ALSO hit every iteration (the left join that
    // keeps in-edge-less nodes) — unpersisted it re-runs the edge scan and
    // two distincts per iteration, which dominated e23's first bench
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    ew.count(); nodes.count()
    e.unpersist(false)

    var ranks = nodes.withColumn("rank_micro", initOf(col("node")))
    for (i <- 1 to iters) {
      // disjoint column names (not dataset-qualified refs): iteration ≥ 2
      // joins ranks against its own lineage, where qualified resolution
      // can trip Spark's ambiguous-self-join detection
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "pr_node"),
          col("src") === col("pr_node"))
        .select(col("dst").as("node"), expr("rank_micro div deg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("in_mass"))
      // left join keeps rank mass on nodes nothing points at
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (baseOf(col("node")) +
            expr(s"($dampingPct * coalesce(in_mass, 0L)) div 100"))
            .as("rank_micro"))
      // truncating the FINAL frame is pointless (nothing builds on it) and
      // would eagerly materialize the whole result once for nothing
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks
      .select(col("node"), col("rank_micro"),
        (col("rank_micro").cast("double") / Micro).as("rank"))
      .orderBy(col("node"))
  }

  /** DuckDB mirror of [[pageRank]]: unrolls the identical integer
    * recurrence (`//` = integer div; sums re-cast to BIGINT because DuckDB
    * widens SUM(BIGINT) to HUGEINT). GENERATED from the same
    * (iters, dampingPct) so the recurrences cannot drift. `edgesCte` must
    * define columns (src, dst); it does NOT need to be symmetric or
    * duplicate-free — like the Spark side, edges are DISTINCT'd, the node
    * universe is src ∪ dst, and each step LEFT JOINs contributions onto
    * that universe, so sink-only nodes keep their base mass in both
    * engines (this mirror previously inner-joined through the edge list,
    * which silently dropped in-edge-less nodes on asymmetric graphs).
    */
  def pageRankSql(edgesCte: String, iters: Int = 5, dampingPct: Int = 85): String = {
    val base = (100 - dampingPct) * Micro / 100
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(SUM(r${i - 1}.rank_micro // deg.deg) AS BIGINT) AS in_mass
         |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |    $base + ($dampingPct * COALESCE(c$i.in_mass, CAST(0 AS BIGINT))) // 100 AS rank_micro
         |  FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesCte)),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST($Micro AS BIGINT) AS rank_micro FROM nodes),
       |$steps
       |SELECT node, rank_micro, CAST(rank_micro AS DOUBLE) / $Micro AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }

  /** DuckDB mirror of [[personalizedPageRank]] — the [[pageRankSql]]
    * unroll with the restart mass and the starting rank gated on seed
    * membership, GENERATED from the same (seeds, iters, dampingPct).
    */
  def personalizedPageRankSql(edgesCte: String, seeds: Seq[Long],
      iters: Int = 5, dampingPct: Int = 85): String = {
    require(seeds.nonEmpty, "personalized PageRank needs at least one seed")
    val base = (100 - dampingPct) * Micro / 100
    val in = seeds.distinct.sorted.mkString("(", ", ", ")")
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(SUM(r${i - 1}.rank_micro // deg.deg) AS BIGINT) AS in_mass
         |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |    CASE WHEN n.node IN $in THEN $base ELSE 0 END
         |      + ($dampingPct * COALESCE(c$i.in_mass, CAST(0 AS BIGINT))) // 100 AS rank_micro
         |  FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesCte)),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node,
       |  CAST(CASE WHEN node IN $in THEN $Micro ELSE 0 END AS BIGINT)
       |    AS rank_micro FROM nodes),
       |$steps
       |SELECT node, rank_micro, CAST(rank_micro AS DOUBLE) / $Micro AS rank
       |FROM r$iters ORDER BY node""".stripMargin
  }
}
