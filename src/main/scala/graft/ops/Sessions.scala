package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the batch face of
  * [[graft.streaming.EventStreams.sessionize]] (which holds the same gap
  * rule in `flatMapGroupsWithState` for unbounded streams): a new session
  * starts when the gap to the user's previous event exceeds `gapSeconds`.
  *
  * Scale shape: two window functions over ONE partitioning (lag to mark
  * session starts, a running sum to number them) — a single shuffle on
  * the user key; the per-session aggregate that usually follows reuses
  * the same partitioning, so Catalyst plans no second exchange.
  */
object Sessions {

  /** Adds a 1-based `session_seq` per user ordered by event time.
    * Ordering ties on the timestamp stay in one session (gap 0). The gap
    * is computed in MICROSECONDS so batch and streaming agree on
    * sub-second timestamps (the streaming sessionizer compares
    * millisecond epochs; `unix_timestamp` would truncate to seconds and
    * under-measure gaps like 1800.05 s). */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol).cast("timestamp")) - unix_micros(col("__prev").cast("timestamp")) > gapSeconds * 1000000L, 1)
        .otherwise(0))
      .withColumn("session_seq", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }
}
