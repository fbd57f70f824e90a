package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two `array<double>` vectors as a native Catalyst
  * expression — the hot inner operation of every similarity path (brute
  * top-k, IVF probe, embedding near-dup verification).
  *
  * The higher-order-function formulation ([[graft.ext.Similarity.cosine]])
  * is semantically identical but runs on Catalyst's interpreted HOF path
  * (three zip_with/aggregate chains, per-element expression eval). This is
  * one fused JVM loop per row — dot product and both norms in a single
  * pass — called from whole-stage codegen via a static helper, the same
  * (b)-level escalation as [[SimHash64]]/[[MinHashSig]].
  *
  * Arithmetic matches the HOF form EXACTLY: sequential index-order
  * accumulation of p·q, a·a, b·b, then `dot / (sqrt(na) * sqrt(nb))` —
  * identical IEEE op sequence, so results are bit-identical (pinned in
  * SimilaritySpec). Mismatched lengths return null, mirroring zip_with's
  * null-padding which nulls the HOF aggregate.
  */
object CosineSimImpl {
  /** One-pass cosine; caller guarantees non-null ArrayData of doubles. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else CosineSimImpl.cosine(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSimImpl.cosine($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Column API: fused native cosine similarity. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
