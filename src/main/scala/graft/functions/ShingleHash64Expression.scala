package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Native Catalyst expression: the distinct xxhash64 values of a token
  * array's word n-gram shingles, in ONE pass — no shingle STRING is ever
  * materialized. Replaces the
  * `transform(array_distinct(transform(sequence(...), j =>
  * concat_ws(" ", slice(toks, j+1, n)))), s => xxhash64(s))` pipeline in
  * the minhash-banding and ngram-gram hot paths, where the per-window
  * `concat_ws` + `slice` allocations dominated the pass (measured: the
  * shingle-string stage alone cost ~2 s of a 2.1 s tokenize+shingle+hash
  * pass over 100k docs; tokens alone 0.09 s).
  *
  * SEMANTICS (pinned by ShingleHashSpec against the reference tree):
  *  - hash h(j) = xxhash64 (seed 42) over the EXACT bytes
  *    `concat_ws(" ", slice(toks, j+1, n))` would produce — null tokens
  *    skipped with their separator, empty-string tokens kept (double
  *    space), short tail windows for len < n, the empty string for an
  *    empty array (`sequence(0, greatest(len-n, 0))` always emits j=0);
  *  - output order = first occurrence, deduplicated BY HASH VALUE. The
  *    reference deduplicates by STRING and then hashes, so the two
  *    disagree only when two DISTINCT shingle strings collide in
  *    xxhash64 (~2⁻⁶⁴ per pair) — the same collision tolerance the
  *    hashed-gram jaccard design already accepts (see ngramJaccardPairs).
  *  - null input array → null. Output elements are never null.
  */
case class ShingleHash64Expression(child: Expression, n: Int,
                                   distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 expects array<string> (n > 0), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHash64Expression.shingleHashes(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHash64Expression.shingleHashes($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hash64"
}

object ShingleHash64Expression {

  /** One pass over the windows — static so generated code calls it
    * directly. A shared-per-call growable byte buffer holds the current
    * window's joined bytes; XXH64 runs over the buffer region. */
  def shingleHashes(a: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = a.numElements()
    val jMax = math.max(len - n, 0) // inclusive; j=0 always emitted
    val seen = if (distinct)
      new java.util.HashSet[java.lang.Long](math.max(8, (jMax + 1) * 2)) else null
    val out = new Array[Long](jMax + 1)
    var m = 0
    var buf = new Array[Byte](64)
    var j = 0
    while (j <= jMax) {
      var size = 0
      var wrote = false
      var t = j
      val end = math.min(j.toLong + n, len.toLong).toInt
      while (t < end) {
        if (!a.isNullAt(t)) { // concat_ws skips null tokens AND their separator
          val s = a.getUTF8String(t)
          val nb = s.numBytes()
          val need = size + nb + 1
          if (need > buf.length) {
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          }
          if (wrote) { buf(size) = ' '.toByte; size += 1 }
          s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + size)
          size += nb
          wrote = true
        }
        t += 1
      }
      val h = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, size, 42L)
      if (seen == null || seen.add(h)) { out(m) = h; m += 1 }
      j += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }

  /** distinct=false emits every window's hash in POSITION order (the
    * winnowing gram sequence); distinct=true (default) deduplicates by
    * hash keeping first occurrence (the shingle-set form). */
  def shingleHash64(tokens: Column, n: Int, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ShingleHash64Expression(Bridge.expression(tokens), n, distinct))
  }
}
