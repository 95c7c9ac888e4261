package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** `graft_hour_bucket(ts)` — the reference's BigQuery hour-partition id
  * (`YYYYMMDDHH`, `/root/reference/ingestion/partition.py:3`) as a LONG,
  * computed with pure integer arithmetic on the timestamp's epoch micros.
  *
  * This is the engine's one custom scalar `Expression` and exists for a
  * performance reason: the equivalent `date_format(ts, 'yyyyMMddHH')` goes
  * through a `DateTimeFormatter` and produces a string that callers usually
  * cast back to a number; on an ingest path that derives the bucket for
  * every row of a 100 TB table, formatter+string churn is measurable. This
  * expression does date math on integers (civil-from-days algorithm), emits
  * no objects, and participates in whole-stage codegen via [[doGenCode]].
  *
  * Semantics are UTC (the reference pins everything to UTC: scheduler TZ
  * `Etc/UTC`, `commands.sh:72`; `utcnow()` in `app.py:128`).
  */
case class HourBucket(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == TimestampType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hour_bucket requires TIMESTAMP, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    HourBucket.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HourBucket.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HourBucket =
    copy(child = newChild)

  override def prettyName: String = "graft_hour_bucket"
}

object HourBucket {
  /** Epoch micros (UTC) -> YYYYMMDDHH as a long. Integer-only civil-date
    * algorithm (Howard Hinnant's `civil_from_days`), no allocation.
    */
  def compute(micros: Long): Long = {
    val secs = Math.floorDiv(micros, 1000000L)
    val days = Math.floorDiv(secs, 86400L)
    val hour = Math.floorDiv(secs - days * 86400L, 3600L)
    // civil_from_days
    val z = days + 719468L
    val era = Math.floorDiv(z, 146097L)
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val y = yoe + era * 400
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val m = if (mp < 10) mp + 3 else mp - 9
    val year = if (m <= 2) y + 1 else y
    year * 1000000L + m * 10000L + d * 100L + hour
  }
}
