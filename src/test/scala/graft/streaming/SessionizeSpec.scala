package graft.streaming

import graft.SparkSpec
import graft.streaming.Sessionize._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** flatMapGroupsWithState sessionization: gap splits, event-time timeout
  * closure, bounded state.
  */
class SessionizeSpec extends SparkSpec {

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions close on gap; idle sessions close via event-time timeout") {
    implicit val s = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 10 min apart (one session), then a 2-hour gap event
    input.addData(
      Event(1L, ts("2023-06-27 12:00:00"), 1),
      Event(1L, ts("2023-06-27 12:10:00"), 2),
      Event(1L, ts("2023-06-27 14:10:00"), 3),
      Event(2L, ts("2023-06-27 12:05:00"), 4))
    query.processAllAvailable()
    // the first session of user 1 closed by the in-batch gap
    val afterBatch1 = spark.table("sess_out").as[Session].collect()
    assert(afterBatch1.exists(s => s.user_id == 1 && s.n_events == 2))

    // push watermark far ahead: idle sessions (user1 second, user2) time out
    input.addData(Event(3L, ts("2023-06-27 18:00:00"), 5))
    query.processAllAvailable()
    input.addData(Event(3L, ts("2023-06-27 19:00:00"), 6))
    query.processAllAvailable()
    val all = spark.table("sess_out").as[Session].collect()
    assert(all.exists(s => s.user_id == 1 && s.n_events == 1)) // 14:10 session
    assert(all.exists(s => s.user_id == 2 && s.n_events == 1))
    query.stop()
  }
}
