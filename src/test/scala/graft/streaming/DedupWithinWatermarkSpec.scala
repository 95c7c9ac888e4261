package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The two halves of the `dropDuplicatesWithinWatermark` contract that the
  * gate query (st10) cannot exercise — its oracle deliberately constructs a
  * no-eviction replay, so suppression-then-eviction-then-re-emission needs
  * explicitly controlled micro-batches:
  *
  *  - a duplicate arriving while the first occurrence is inside the
  *    watermark horizon is DROPPED (the dedup guarantee);
  *  - once the watermark passes first-seen + delay the key's state evicts,
  *    and a later occurrence EMITS AGAIN (the bounded-state price st10's
  *    scaladoc defers here).
  */
class DedupWithinWatermarkSpec extends SparkSpec {

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("in-horizon duplicate suppressed; key idle past the horizon re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[DedupWithinWatermarkSpec.KeyedEvent]
    val q = input.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id")
      .writeStream.format("memory").queryName("dedupww_out")
      .outputMode("append").start()
    def emitted(): Seq[(Long, java.sql.Timestamp)] =
      spark.table("dedupww_out")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq

    // batch 1: first occurrence of key 1 emits; watermark -> 11:00
    input.addData(DedupWithinWatermarkSpec.KeyedEvent(1L, ts("2023-06-27 12:00:00")))
    q.processAllAvailable()
    assert(emitted() == Seq((1L, ts("2023-06-27 12:00:00"))))

    // batch 2: duplicate of key 1 inside the horizon (state expires at
    // 13:00, watermark only reaches 11:30) -> suppressed, nothing new emits
    input.addData(DedupWithinWatermarkSpec.KeyedEvent(1L, ts("2023-06-27 12:30:00")))
    q.processAllAvailable()
    assert(emitted() == Seq((1L, ts("2023-06-27 12:00:00"))))

    // batch 3: an unrelated key advances the watermark to 14:00 > 13:00 —
    // key 1's dedup state evicts at batch end; key 2 itself first-emits
    input.addData(DedupWithinWatermarkSpec.KeyedEvent(2L, ts("2023-06-27 15:00:00")))
    q.processAllAvailable()
    assert(emitted().toSet ==
      Set((1L, ts("2023-06-27 12:00:00")), (2L, ts("2023-06-27 15:00:00"))))

    // batch 4: key 1 reappears after its state evicted (14:30 is not late:
    // watermark is 14:00) -> RE-EMITS — the bounded-state re-emission price
    input.addData(DedupWithinWatermarkSpec.KeyedEvent(1L, ts("2023-06-27 14:30:00")))
    q.processAllAvailable()
    assert(emitted().toSet == Set(
      (1L, ts("2023-06-27 12:00:00")),
      (2L, ts("2023-06-27 15:00:00")),
      (1L, ts("2023-06-27 14:30:00"))))

    // batch 5: a LATE row (13:30 < watermark 14:00) is dropped as input —
    // a never-before-seen key below the horizon emits nothing at all
    input.addData(DedupWithinWatermarkSpec.KeyedEvent(3L, ts("2023-06-27 13:30:00")))
    q.processAllAvailable()
    assert(!emitted().exists(_._1 == 3L))
    q.stop()
  }
}

object DedupWithinWatermarkSpec {
  case class KeyedEvent(user_id: Long, ts: java.sql.Timestamp)
}
