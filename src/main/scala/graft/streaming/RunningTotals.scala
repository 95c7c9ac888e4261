package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Custom stateful streaming operator on Spark 4's `transformWithState`
  * API (the successor of `mapGroupsWithState`, backed by the RocksDB state
  * store with fine-grained state variables instead of one opaque blob):
  * per-key running totals that emit the cumulative (count, sum) after every
  * micro-batch that touched the key.
  *
  * The emission stream is deliberately CUMULATIVE: per key, the emitted
  * count is strictly increasing across batches, so "the row with the
  * largest count per key" is the final total regardless of how a replay
  * splits into micro-batches — that batching-independence is what lets a
  * deterministic oracle (plain batch GROUP BY) pin a streaming query.
  *
  * State is one (count, sum) pair per key — bounded by key cardinality,
  * not volume. TTL is off here (finite replay, exact totals); an unbounded
  * deployment bounds idle-key state with `TTLConfig(Duration)` the same
  * way st4's dedup documents its watermark trade-off.
  */
object RunningTotals {

  final case class In(event_type: String, user_id: Long)
  final case class CountSum(n: Long, sum: Long)
  final case class Out(event_type: String, n: Long, sum_uid: Long)

  /** StatefulProcessor: init declares the typed ValueState variable;
    * handleInputRows folds the batch's rows into it and emits the running
    * total once per (key, batch).
    */
  final class Processor extends StatefulProcessor[String, In, Out] {
    @transient private var totals: ValueState[CountSum] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[CountSum](
        "totals", Encoders.product[CountSum], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var n = 0L; var sum = 0L
      rows.foreach { r => n += 1; sum += r.user_id }
      val prev = if (totals.exists()) totals.get() else CountSum(0L, 0L)
      val next = CountSum(prev.n + n, prev.sum + sum)
      totals.update(next)
      Iterator.single(Out(key, next.n, next.sum))
    }
  }

  def totals(events: Dataset[In])(implicit spark: SparkSession): Dataset[Out] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
