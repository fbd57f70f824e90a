package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the declared query surface on sf0.001 — the full value-level
  * gate is the driver's DuckDB compare (tools/local_check.py locally).
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every declared query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("query output column names are deterministic and alias-stable") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      assert(cols.distinct.length == cols.length, s"$name has duplicate column names")
      assert(cols.forall(c => !c.contains("(")), s"$name leaks un-aliased agg column: ${cols.mkString(",")}")
    }
  }
}
