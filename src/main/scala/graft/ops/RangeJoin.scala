package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: each left row is matched with every right
  * interval `[start, end)` sharing its key that contains the left
  * timestamp — the validity-interval lookup (price lists, shifts,
  * sessions) Spark has no native operator for.
  *
  * Scale shape: writing the range condition directly gives Catalyst an
  * equi-join on the key with the range as a POST-MATCH filter — every
  * co-keyed (event, interval) pair is compared, quadratic on hot keys.
  * This implementation bucketizes time: intervals replicate into the
  * fixed-width buckets they overlap, events map to exactly one bucket,
  * and the join is a pure equi-join on (key, bucket) + exact containment
  * filter. Comparisons are |events| × (intervals overlapping their
  * bucket); each interval replicates ceil(width / bucketSeconds) + 1
  * times, so pick `bucketSeconds` near the typical interval width.
  * No result dedup is needed: an event joins only its own bucket, and
  * each (event, interval) pair co-occurs in exactly that one bucket.
  * Column-name contract: left and right column names must be disjoint
  * apart from `keys` (the result carries both sides' columns). */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, startCol: String, endCol: String,
                   bucketSeconds: Long = 21600L): DataFrame = {
    // bucket math in MICROSECONDS (Spark timestamp precision): second
    // truncation would mis-bucket sub-second boundaries — an interval
    // ending at 10:00:00.5 must still replicate into the 10:00 bucket
    val w = bucketSeconds * 1000000L
    val l = left.withColumn("__b", floor(unix_micros(col(leftTs).cast("timestamp")) / w))
    val r = right
      .filter(col(endCol) > col(startCol)) // empty intervals match nothing
      .withColumn("__bs", floor(unix_micros(col(startCol).cast("timestamp")) / w))
      .withColumn("__be", floor((unix_micros(col(endCol).cast("timestamp")) - 1) / w))
      .withColumn("__b", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
    l.join(r, keys :+ "__b")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__b")
  }
}
