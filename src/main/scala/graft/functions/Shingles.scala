package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-shingle set as a native Catalyst expression — one JVM pass
  * over the text: normalize → whitespace-tokenize → positional n-grams →
  * first-occurrence-ordered distinct. Bit-identical to the HOF formulation
  * ([[graft.ext.Dedup.shinglesHof]]: `array_distinct` over the zip-shift
  * n-grams, pinned in DedupSpec) but runs as one compiled pass instead of
  * the interpreted higher-order-function chain (regex split + n−1 zip_with
  * + filter + array_distinct) — the same (b)-level escalation as
  * [[MinHashSig]], applied to what profiling showed is the dominant cost of
  * the exact-Jaccard pipeline (the HOF chain measured ~2.5 s for 10k docs
  * at sf0.1; the shingle set feeds e11's posting lists, e09's verification
  * re-join, and e14's pair graph).
  */
object ShingleImpl {

  /** Matches `array_distinct(filter(zip_with(...)))` over
    * `split(lower(trim(text)), "\\s+")`: same normalization calls
    * (UTF8String.toLowerCase / trim, Java regex split with limit −1), same
    * ' '-joined n-grams, and first-occurrence order exactly like
    * `array_distinct`.
    */
  def shingleSet(input: UTF8String, n: Int): ArrayData = {
    val s = input.toLowerCase.trim().toString
    val tokens = s.split("\\s+", -1)
    if (tokens.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
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
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

case class ShingleSet(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_set requires string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    ShingleImpl.shingleSet(v.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleImpl.shingleSet($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)

  override def prettyName: String = "shingle_set"
}

/** Position-ordered n-gram MULTISET (repeats kept) — the native twin of
  * [[ShingleSet]] without the distinct, matching
  * [[graft.ext.Dedup.ngramsOrderedHof]] exactly. Feeds repetition
  * statistics, where the gram multiplicities ARE the signal.
  */
object NGramImpl {
  def ngrams(input: UTF8String, n: Int): ArrayData = {
    val s = input.toLowerCase.trim().toString
    val tokens = s.split("\\s+", -1)
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
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class NGramsOrdered(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngrams_ordered requires string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    NGramImpl.ngrams(v.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramImpl.ngrams($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): NGramsOrdered =
    copy(child = newChild)

  override def prettyName: String = "ngrams_ordered"
}

object Shingles {
  /** Column API: the distinct word-shingle set of the normalized text. */
  def shingleSet(c: Column, n: Int = 3): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(c), n))

  /** Column API: position-ordered n-grams, repeats kept. */
  def ngramsOrdered(c: Column, n: Int = 3): Column =
    ColumnBridge.column(NGramsOrdered(ColumnBridge.expression(c), n))
}
