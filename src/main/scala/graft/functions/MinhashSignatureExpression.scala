package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the full MinHash signature over per-
  * shingle hashes: all `numHashes` family minima in ONE pass over the
  * array, inside whole-stage codegen.
  *
  * BIT-IDENTICAL to the expression-tree formulation it replaces
  * (`array((0 until n).map(k => array_min(transform(hs, h => xxhash64(h,
  * lit(k))))))`, pinned by MinhashSignatureSpec): Spark's `xxhash64(h,
  * lit(k))` folds its children through XXH64 starting at seed 42 —
  * `hashInt(k, hashLong(h, 42))` — and skips null children. That tree
  * re-derives `hashLong(h, 42)` once per FAMILY (64× per element) and
  * allocates `numHashes` intermediate arrays per row; this fold hashes
  * each element's k-independent inner value once and keeps `numHashes`
  * running minima — no allocation, half the hash work, one codegen call.
  */
case class MinhashSignatureExpression(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint> (numHashes > 0), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSignatureExpression.fold(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSignatureExpression.fold($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureExpression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignatureExpression {

  /** The per-row fold — static so generated code can call it directly.
    *
    * Exact old-tree semantics per family k:
    *  - non-null element h contributes `XXH64.hashInt(k, XXH64.hashLong(h, 42))`
    *    (xxhash64's child fold, seed 42, IntegerType literal k);
    *  - a null element contributes `XXH64.hashInt(k, 42)` (XxHash64 SKIPS
    *    null children — it never returns null);
    *  - an EMPTY array yields null per family (`array_min` of empty). */
  def fold(a: ArrayData, numHashes: Int): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val inner = if (a.isNullAt(i)) 42L else XXH64.hashLong(a.getLong(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashInt(k, inner)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSignature(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(MinhashSignatureExpression(Bridge.expression(hashes), numHashes))
  }
}
