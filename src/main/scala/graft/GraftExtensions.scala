package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.SimHash64

/** Session-extension registration: makes the library's custom Catalyst
  * expressions first-class SQL functions, so both API forms the engine
  * supports (DataFrame chains and SQL text — SURVEY.md §3 EP2) can reach
  * them:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT simhash64(text) FROM docs")
  *
  * or `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster.
  * [[GraftExtensions.register]] does the same for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))

  /** Register on a live session (tests / notebook use). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
