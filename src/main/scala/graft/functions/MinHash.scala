package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-value MinHash signature as a native Catalyst expression — one JVM pass
  * over the text: normalize → whitespace-tokenize → word shingles → k
  * seeded xxhash64 min-folds. Bit-identical to the HOF formulation
  * ([[graft.ext.Dedup.minhashSignature]] over [[graft.ext.Dedup.shingles]],
  * pinned in DedupSpec) but runs inside whole-stage codegen instead of the
  * interpreted higher-order-function path — the same (b)-level escalation
  * as [[SimHash64]], applied to the slowest near-dup stage.
  */
object MinHashImpl {
  final val Seed = 42L

  /** Matches `xxhash64(concat(lit(s"$i:"), shingle))` for each permutation
    * i: hash of the UTF-8 bytes of "i:" + shingle with seed 42.
    */
  def signature(input: UTF8String, shingleSize: Int, k: Int): ArrayData = {
    val s = input.toLowerCase.trim().toString
    val tokens = s.split("\\s+", -1)
    val mins = Array.fill(k)(Long.MaxValue)
    if (tokens.length >= shingleSize) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j <= tokens.length - shingleSize) {
        sb.setLength(0)
        var w = 0
        while (w < shingleSize) {
          if (w > 0) sb.append(' ')
          sb.append(tokens(j + w))
          w += 1
        }
        val shingle = sb.toString
        var i = 0
        while (i < k) {
          val h = XXH64.hashUTF8String(UTF8String.fromString(i + ":" + shingle), Seed)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, shingleSize: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    MinHashImpl.signature(v.asInstanceOf[UTF8String], shingleSize, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.signature($c, $shingleSize, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHash {
  /** Column API: k minhash values of the text's word shingles. */
  def minhashSig(c: Column, shingleSize: Int = 3, k: Int = 16): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), shingleSize, k))
}
