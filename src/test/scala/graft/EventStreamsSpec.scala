package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent

class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked tumbling windows finalize and drop late data") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")

    val q = EventStreams.windowedCounts(events, watermark = "10 minutes",
        windowLen = "60 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()

    // window [0,60): 2 clicks; then advance the watermark far past it
    input.addData((ts(1), 1L, "click", 1.0), (ts(5), 2L, "click", 2.0))
    q.processAllAvailable()
    input.addData((ts(200), 3L, "click", 1.0)) // watermark -> ~190min
    q.processAllAvailable()
    // a straggler inside the finalized window must be dropped
    input.addData((ts(2), 9L, "click", 100.0))
    q.processAllAvailable()
    input.addData((ts(400), 3L, "view", 1.0)) // pushes watermark, finalizes [180,240)
    q.processAllAvailable()

    val rows = spark.table("win_counts")
      .select($"win_start", $"event_type", $"n").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
    q.stop()

    val firstWin = rows.filter(_._1 == 1700000000000L - (1700000000000L % 3600000L))
    // the [0,60) window of our epoch-aligned hour contains exactly the 2
    // on-time clicks; the late straggler (value 100) was dropped
    assert(firstWin.exists(r => r._2 == "click" && r._3 == 2), s"got ${rows.mkString(",")}")
  }

  test("flatMapGroupsWithState sessionization closes on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60000L)

    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 5 min apart (one session), then a 30-min gap event
    input.addData(SessionEvent(1L, ts(0), "a"), SessionEvent(1L, ts(5), "b"))
    q.processAllAvailable()
    input.addData(SessionEvent(1L, ts(40), "c"))
    q.processAllAvailable()

    val closed = spark.table("sessions").as[EventStreams.Session].collect()
    q.stop()
    assert(closed.length == 1, s"expected the first session closed, got ${closed.toSeq}")
    assert(closed.head.nEvents == 2)
    assert(closed.head.startMs == ts(0).getTime && closed.head.endMs == ts(5).getTime)
  }
}
