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

  /** HOT-KEY CONTRACT: this form partitions its one window by `keys`
    * alone, so a single key holding a large fraction of the table
    * serializes that key's sort into one task. Correct at any size, fine
    * when keys are well-distributed; for skewed keys at scale use
    * [[asOfBucketed]], which bounds every task by (key, time-bucket) and
    * is output-identical (equivalence spec in OpsSpec). */
  /** Debug guard for the right-uniqueness contract: fails fast when any
    * (key, ts) holds more than one right row (where the operators would
    * otherwise silently pick an arbitrary winner). One aggregate pass —
    * call it in tests / on suspect inputs, not per production run. */
  def requireUniqueRight(right: DataFrame, keys: Seq[String], rightTs: String): Unit = {
    val dup = right.filter(col(rightTs).isNotNull)
      .groupBy((keys :+ rightTs).map(col): _*)
      .count().filter(col("count") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"as-of right side not unique per (${keys.mkString(",")}, $rightTs): e.g. ${dup.mkString}")
  }

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

  /** Skew-safe as-of join — output-identical to [[asOf]] (same contract,
    * same tie rules), but every window partitions by (key, TIME BUCKET)
    * instead of the key alone, so one hot key (a user holding 10% of a
    * 100 TB event table) is split across its time range instead of
    * serializing into a single task. Three-step two-pass shape:
    *
    *  1. per (key, bucket): the LAST right row's payload (a window over
    *     right bucketed — bounded by rights per key per bucket);
    *  2. a per-(key, bucket) SPINE frame (distinct buckets either side
    *     touches — |keys|·|buckets| rows, ≪ data) carries the latest
    *     earlier-bucket state forward with one tiny per-key window
    *     (strictly-earlier frame, so in-bucket rights stay in step 3);
    *  3. union left rows + right rows + one carry pseudo-row per (key,
    *     bucket) (sorts first in its bucket: null ts, side −1), then the
    *     same running `last(payload)` pass as [[asOf]] — partitioned by
    *     (key, bucket).
    *
    * The per-task bound becomes rows-per-(key, bucket): pick
    * `bucketSeconds` so a hot key's densest bucket fits a task (e.g.
    * hours for a years-spanning table). A key fully inside ONE bucket
    * degenerates to [[asOf]]'s bound — the knob, not magic. Null left
    * timestamps ride the null bucket: it sorts first on the spine with an
    * empty carry frame, so they keep [[asOf]]'s null-payload semantics. */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, payloads: Seq[String],
                   bucketSeconds: Long = 86400L): DataFrame = {
    val leftCols = left.columns.toSeq
    val payT = org.apache.spark.sql.types.StructType(payloads.map(right.schema(_)))
    val bucketMicros = bucketSeconds * 1000000L
    def bucketOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / bucketMicros).cast("long")

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__pay", lit(null).cast(payT))
      .withColumn("__bucket", bucketOf(col(leftTs)))
    // the right side is referenced THREE times below (lastPerBucket, the
    // spine, and the union) and Catalyst's exchange reuse does not fire
    // across the differently-projected consumers — without this checkpoint
    // an expensive right-side plan (the gate row's per-(user, hour) window
    // over the event table) executes once per consumer. The materialized
    // frame is the prepared (keys, ts, payload struct, bucket) projection —
    // the dimension-history side of an as-of join, the smaller side by
    // contract; storing it once beats three scans+windows of its plan.
    val rCore = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__pay", struct(payloads.map(col): _*))
      .withColumn("__bucket", bucketOf(col(rightTs)))
      .select((keys :+ "__ts" :+ "__side" :+ "__pay" :+ "__bucket").map(col): _*)
      .localCheckpoint()
    var r = rCore
    leftCols.filterNot(keys.contains).foreach { c =>
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unionCols = (leftCols :+ "__ts" :+ "__side" :+ "__pay" :+ "__bucket").map(col)

    // 1. last right payload per (key, bucket)
    val wrb = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col("__ts").desc)
    val lastPerBucket = r
      .withColumn("__rk", row_number().over(wrb))
      .filter(col("__rk") === 1)
      .select((keys :+ "__bucket").map(col) :+ col("__pay").as("__state"): _*)

    // 2. spine: strictly-earlier-bucket carry state per touched (key, bucket).
    // ONE distinct over the union — the previous per-side distincts + a
    // final distinct planned three exchanges for one logical dedup; the
    // single aggregation still partial-aggregates each union input inside
    // its scan stage, so the exchange carries (key, bucket) groups either
    // way (plan: 3 exchanges -> 1 for the spine subtree).
    val spine = l.select((keys :+ "__bucket").map(col): _*)
      .unionByName(r.select((keys :+ "__bucket").map(col): _*))
      .distinct()
    val wk = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bucket").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine
      .join(lastPerBucket, keys :+ "__bucket", "left")
      .withColumn("__carry", last(col("__state"), ignoreNulls = true).over(wk))
      .filter(col("__carry").isNotNull)

    // 3. carry pseudo-rows sort FIRST in their bucket (null ts, side -1)
    var pseudo = carry.select(
      (keys.map(col) :+ lit(null).cast(left.schema(leftTs).dataType).as("__ts")
        :+ lit(-1).as("__side") :+ col("__carry").as("__pay") :+ col("__bucket")): _*)
    leftCols.filterNot(keys.contains).foreach { c =>
      pseudo = pseudo.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select(unionCols: _*)
      .unionByName(r.select(unionCols: _*))
      .unionByName(pseudo.select(unionCols: _*))
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payloads.map(p => col(s"__pay.$p").as(p)): _*)
  }
}
