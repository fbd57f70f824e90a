package graft

import graft.queries.Reference
import graft.ext.ExtQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[graft.queries.Reference]] (the reference's canonical
  * query set, SURVEY.md §2.b/§2.c) and [[graft.ext.ExtQueries]] (mandated
  * extensions, §2.e); this object is just the aggregation point.
  */
object SparkEntry {

  private val defs: Seq[Reference.Q] = Reference.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Re-target of the reference's headline chart ("capacity by technology",
    * ipynb cell 21): the TPC-H-Q1-shaped pricing summary.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_groupsum")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash/langId) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
