package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the longest run of EQUAL values in a long
  * array after sorting — i.e. the largest multiplicity of any element —
  * as one primitive sort + scan inside whole-stage codegen. Replaces the
  * repetition signal's `aggregate(sequence(...), struct(best, cur), ...)`
  * fold over a sorted STRING bigram array: the higher-order fold runs
  * interpreted with two `element_at` lookups and a struct allocation per
  * step, and the string sort boxes/compares UTF8Strings, where this sorts
  * a primitive long[] (Arrays.sort) and scans once.
  *
  * Contract mirror of the tree it replaces: empty and 1-element arrays
  * yield 1 (the fold's initial `best`); null array → null; null ELEMENTS
  * are not permitted (the producing expression emits none). */
case class MaxRunLengthExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_run_length expects array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MaxRunLengthExpression.maxRun(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MaxRunLengthExpression.maxRun($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxRunLengthExpression =
    copy(child = newChild)

  override def prettyName: String = "max_run_length"
}

object MaxRunLengthExpression {

  /** Sort a private copy, scan for the longest equal run — static so
    * generated code calls it directly. */
  def maxRun(a: ArrayData): Int = {
    val n = a.numElements()
    if (n <= 1) return 1
    val arr = a.toLongArray()
    java.util.Arrays.sort(arr)
    var best = 1
    var cur = 1
    var i = 1
    while (i < n) {
      if (arr(i) == arr(i - 1)) { cur += 1; if (cur > best) best = cur }
      else cur = 1
      i += 1
    }
    best
  }

  def maxRunLength(a: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MaxRunLengthExpression(Bridge.expression(a)))
  }
}
