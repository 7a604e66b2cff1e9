package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: Σ a_i·b_i over two double arrays as one
  * primitive loop inside whole-stage codegen. Replaces the
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * tree in the cosine hot paths: higher-order functions run as
  * interpreted per-row fallbacks and the zip_with allocates an
  * intermediate array per pair — measured ~50 µs/pair, which dominates a
  * brute-force or verification scoring pass (the same expression class as
  * [[MinhashSignatureExpression]] / [[SortedIntersectCountExpression]]).
  *
  * BIT-IDENTICAL to the reference tree: the fold runs left-to-right with
  * initial 0.0 and per-step `acc + a_i * b_i` — the identical IEEE-754
  * operation sequence — and mismatched lengths yield NULL exactly like
  * zip_with's null padding poisons the reference's sum (pinned by
  * DotProductSpec, raw-bits comparison). CONTRACT: no null ELEMENTS
  * (every producer casts a non-null float vector to array<double>);
  * a null element under the reference yields null, here its slot reads
  * as 0.0 — outside the contract, like SortedIntersect's sortedness. */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects (array<double>, array<double>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else java.lang.Double.valueOf(DotProductExpression.dot(aa, bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotProductExpression.dot($a, $b);
      }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProductExpression {

  /** Left-to-right fold, initial 0.0 — static so generated code calls it
    * directly. Equal lengths checked by the caller. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotProduct(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(DotProductExpression(
      Bridge.expression(a), Bridge.expression(b)))
  }
}
