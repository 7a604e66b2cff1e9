package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the winnowing fingerprint selection —
  * distinct (first-occurrence) minima of every width-`w` sliding window
  * over a long array — as one monotonic-deque pass inside whole-stage
  * codegen, O(n) total. Replaces the
  * `array_distinct(transform(sequence(...), i => array_min(slice(grams,
  * i+1, w))))` tree, which allocates a slice array and scans it per
  * window position (O(n·w), interpreted).
  *
  * Exact tree mirror (pinned by WinnowMinSpec): j runs 0..max(len−w, 0)
  * inclusive, so a shorter-than-w array yields the whole-array minimum
  * and an EMPTY array yields the single `array_min(empty) = null` entry;
  * null input → null. Null ELEMENTS are not permitted (the gram producer
  * emits none). */
case class WinnowMinExpression(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_min expects array<bigint> (w > 0), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowMinExpression.winnow(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowMinExpression.winnow($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMinExpression =
    copy(child = newChild)

  override def prettyName: String = "winnow_min"
}

object WinnowMinExpression {

  /** Monotonic-deque sliding minimum + first-occurrence dedup — static so
    * generated code calls it directly. */
  def winnow(a: ArrayData, w: Int): ArrayData = {
    val len = a.numElements()
    if (len == 0) return new GenericArrayData(Array[Any](null))
    val arr = a.toLongArray()
    if (len <= w) {
      var mn = arr(0)
      var i = 1
      while (i < len) { if (arr(i) < mn) mn = arr(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val jMax = len - w // inclusive
    val seen = new java.util.HashSet[java.lang.Long](math.max(8, (jMax + 1) * 2))
    val out = new Array[Long](jMax + 1)
    var m = 0
    // deque of indices with increasing values; head = current window min
    val dq = new Array[Int](len)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < len) {
      while (tail > head && arr(dq(tail - 1)) >= arr(i)) tail -= 1
      dq(tail) = i
      tail += 1
      val j = i - w + 1 // window [j, i] complete once i >= w-1
      if (j >= 0) {
        if (dq(head) < j) head += 1
        val mn = arr(dq(head))
        if (seen.add(mn)) { out(m) = mn; m += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def winnowMin(grams: Column, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnowMinExpression(Bridge.expression(grams), w))
  }
}
