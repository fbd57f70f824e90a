package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-value md5 MinHash signature as a native Catalyst expression — ONE JVM
  * pass over the shingle array computing all k permutation min-folds.
  * Bit-identical to the HOF formulation
  * ([[graft.ext.Dedup.minhashSignatureMd5]]: per permutation i,
  * `aggregate(transform(sh, g => md5Hash60(concat("i:", g))), MaxValue,
  * least)` where md5Hash60 = `conv(substring(md5(x), 1, 15), 16, 10)` —
  * pinned in DedupSpec) but replaces k interpreted higher-order-function
  * array traversals, each allocating a concat string, a 32-char hex
  * string, a substring and a conv parse PER ELEMENT, with one digest and
  * an integer nibble fold per (permutation, shingle) — the same (b)-level
  * escalation as [[MinHashSig]], applied to the md5 oracle twin that
  * measured ~6× the native form's cost at 50M docs (BASELINE.md).
  *
  * The md5 SEMANTICS are untouched: identical digests of identical bytes,
  * so e84's declared output (and every DuckDB mirror built from the same
  * constants) is unchanged — only the per-row execution path is native.
  */
object MinHashMd5Impl {

  /** First 60 bits of md5("i:" ++ shingle) as a non-negative long — the
    * byte-level equivalent of parsing the first 15 hex chars of the hex
    * digest (conv(substring(md5, 1, 15), 16, 10)): 15 nibbles big-endian.
    */
  def signature(arr: ArrayData, k: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      prefixes(i) = (i.toString + ":")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val g = arr.getUTF8String(j).getBytes
      var p = 0
      while (p < k) {
        md.update(prefixes(p))
        md.update(g)
        val d = md.digest() // resets the digest for the next update
        var v = 0L
        var nib = 0
        while (nib < 15) {
          val b = d(nib >> 1)
          val x = if ((nib & 1) == 0) (b >> 4) & 0xf else b & 0xf
          v = (v << 4) | x
          nib += 1
        }
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSigMd5(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig_md5 requires array<string> input, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashMd5Impl.signature(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashMd5Impl.signature($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5 =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig_md5"
}

object MinHashMd5 {
  /** Column API: k md5-permutation minhash values of a shingle-set column. */
  def minhashSigMd5(c: Column, k: Int = 16): Column =
    ColumnBridge.column(MinHashSigMd5(ColumnBridge.expression(c), k))
}
