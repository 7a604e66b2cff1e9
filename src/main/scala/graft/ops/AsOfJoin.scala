package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row is matched with the single right row sharing
  * its key whose timestamp is the greatest `rightTs <= leftTs`
  * (inclusive) — the temporal-dimension lookup (latest snapshot / rate /
  * config as of an event time) that Spark has no built-in operator for.
  *
  * Scale shape: the naive formulation is a range-condition join, which
  * Spark executes as an equi-join on the key with a post-match filter +
  * per-key top-1 — quadratic comparisons on hot keys (the same defect
  * class the dedup candidate join had before round 3). This
  * implementation is the union + single-window pass: tag both sides,
  * union on (key, ts), and let `last(payload, ignoreNulls)` over an
  * ordered running frame carry each right payload forward to the left
  * rows that follow it. ONE shuffle on the key, a per-key sort, no
  * comparison blow-up.
  *
  * Semantics:
  *  - inclusive: a right row at exactly `leftTs` matches (right rows sort
  *    BEFORE left rows at equal timestamps);
  *  - all payload columns are carried as ONE struct, so they always come
  *    from the SAME right row even when some payload values are null;
  *  - right should be unique per (key, ts) — dedupe upstream; otherwise
  *    an arbitrary co-timestamped right row wins;
  *  - left rows with no right row at or before them emit null payloads
  *    (left-outer semantics; filter afterwards for inner);
  *  - column-name contract: left and right column names must be disjoint
  *    apart from `keys` (right's non-key non-payload columns are ignored);
  *    a null `leftTs` row sorts before every right row and gets null
  *    payloads.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payloads: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__pay", lit(null).cast(
        org.apache.spark.sql.types.StructType(payloads.map(right.schema(_)))))

    // a null right timestamp matches NOTHING (it would otherwise sort
    // nulls-first and poison the whole key partition via last(ignoreNulls))
    var r = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__pay", struct(payloads.map(col): _*))
      .select((keys :+ "__ts" :+ "__side" :+ "__pay").map(col): _*)
    leftCols.filterNot(c => keys.contains(c)).foreach { c =>
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // inclusive as-of; the running frame ends at the current row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val unioned = l.select((leftCols :+ "__ts" :+ "__side" :+ "__pay").map(col): _*)
      .unionByName(r.select((leftCols :+ "__ts" :+ "__side" :+ "__pay").map(col): _*))

    unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloads.map(p => col(s"__pay.$p").as(p)): _*)
  }
}
