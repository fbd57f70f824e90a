package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash as a native Catalyst expression.
  *
  * The higher-order-function formulation ([[graft.ext.Dedup.simhash]]) is
  * semantically identical but runs on Catalyst's interpreted HOF path
  * (array materialization + per-element expression eval: measured ~4 s per
  * 5k docs). This expression is one tight JVM loop per row, wired into
  * whole-stage codegen through a static helper call — the (b)-level custom
  * operator escalation (compose built-ins → custom Expression) the design
  * guide prescribes when built-ins can't hit the required shape.
  *
  * Token hashing matches `xxhash64(token)` (XXH64, seed 42) bit-for-bit, so
  * the two implementations produce identical hashes — pinned by test.
  */
object SimHashImpl {
  final val Seed = 42L

  /** Normalize (lower+trim), whitespace-tokenize, xxhash each token,
    * ±1-vote per bit, pack signs. Mirrors the HOF form exactly, including
    * the empty-string-token edge (split of "" yields one empty token).
    */
  def simhash64(input: UTF8String): Long = {
    val s = input.toLowerCase.trim().toString
    val tokens = s.split("\\s+", -1)
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < tokens.length) {
      val t = UTF8String.fromString(tokens(ti))
      val h = XXH64.hashUTF8String(t, Seed)
      var b = 0
      while (b < 64) {
        votes(b) += (((h >>> b) & 1L).toInt * 2) - 1
        b += 1
      }
      ti += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    SimHashImpl.simhash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash {
  /** Column API: fast native SimHash. */
  def simhash64(c: Column): Column = ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}
