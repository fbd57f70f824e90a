package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every word-level n-token span as a native Catalyst
  * expression — the string-free candidate pass of substring-level dedup
  * ([[graft.ext.Dedup.repeatedSpans]] with `hashSpanKey=true`).
  *
  * The composed formulation materializes every span STRING through the
  * plan (`posexplode(transform(sequence, i -> array_join(slice(toks ...))))`
  * — ~n tokens of text per corpus token, the dominant byte volume of the
  * whole pipeline at scale) and then hashes it. This expression emits only
  * the `array<long>` of hashes in one compiled pass per row, so the
  * distinct-doc counting branch explodes 8-byte longs instead of n-token
  * strings; span text is materialized on the survivor branch only.
  *
  * Hash identity: `spanHashes(text, n)[i] == xxhash64(span_i)` where
  * `span_i = array_join(slice(filter(split(lower(trim(text)), "\\s+"),
  * t -> length(t) > 0), i+1, n), " ")` — same normalization calls, same
  * single-space join, XXH64 seed 42 over the UTF-8 bytes. Pinned
  * bit-for-bit in DedupSpec, like [[SimHash64]] / [[MinHashSig]].
  */
object SpanHashImpl {
  final val Seed = 42L

  def spanHashes(input: UTF8String, n: Int): ArrayData = {
    val s = input.toLowerCase.trim().toString
    val raw = s.split("\\s+", -1)
    // match filter(..., t -> length(t) > 0): only the empty-input edge
    // produces an empty token, but mirror the filter exactly regardless
    var cnt = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) cnt += 1; i += 1 }
    val tokens =
      if (cnt == raw.length) raw
      else {
        val t = new Array[String](cnt)
        var j = 0
        i = 0
        while (i < raw.length) {
          if (raw(i).nonEmpty) { t(j) = raw(i); j += 1 }
          i += 1
        }
        t
      }
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](tokens.length - n + 1)
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j <= tokens.length - n) {
      sb.setLength(0)
      var w = 0
      while (w < n) {
        if (w > 0) sb.append(' ')
        sb.append(tokens(j + w))
        w += 1
      }
      out(j) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class SpanHashes(child: Expression, spanTokens: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"span_hashes requires string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    SpanHashImpl.spanHashes(v.asInstanceOf[UTF8String], spanTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SpanHashImpl.spanHashes($c, $spanTokens)")

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)

  override def prettyName: String = "span_hashes"
}

object SpanHash {
  /** Column API: xxhash64 of every n-token span of the normalized text. */
  def spanHashes(c: Column, n: Int = 10): Column =
    ColumnBridge.column(SpanHashes(ColumnBridge.expression(c), n))
}
