package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the 64-bit simhash fold over per-token
  * hashes: majority vote per bit across the array elements. Participates
  * in whole-stage codegen and reads the array through `ArrayData.getLong`
  * — no per-element boxing and no ScalaUDF conversion boundary, unlike
  * the UDF it replaced in the hot dedup banding path.
  */
case class Simhash64Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Simhash64Expression.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Simhash64Expression.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object Simhash64Expression {

  /** The per-row fold — static so generated code can call it directly.
    * Null elements are skipped (cannot occur from `xxhash64` inputs, but
    * the array type permits them). */
  def fold(a: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(hashes: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Simhash64Expression(Bridge.expression(hashes)))
  }
}
