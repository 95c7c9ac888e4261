package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension (SURVEY §2.2
  * "joins: as-of"; preference ladder (c): custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` via `SparkSessionExtensions`).
  *
  * Semantics: for every left row, attach the right row with the same key
  * and the greatest right-time <= left-time (LEFT OUTER: no match => nulls)
  * — "latest state as of this event". DuckDB's `ASOF LEFT JOIN` is the
  * oracle; the window-lag composition (q15) is the built-in-only fallback.
  *
  * Why a custom operator beats the compositions at scale:
  *  - the union+window trick (q15) shuffles LEFT+RIGHT together through one
  *    window sort and carries every right column through the union;
  *  - a range join (`l.ts >= r.ts`) explodes to O(|L|·matches) before the
  *    per-key top-1 filter prunes it back;
  *  - this exec co-partitions both sides by key (two hash exchanges, the
  *    minimum possible), sorts within partitions, and streams a single
  *    forward merge per partition: O(L + R), memory = one retained right
  *    row per key, no candidate explosion, spillable sorts from the
  *    standard Sort operator.
  */
object AsOfJoin {

  /** Logical marker node: output = left columns ++ right value columns
    * (forced nullable — LEFT OUTER semantics).
    */
  case class AsOfJoinPlan(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression) extends BinaryNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  /** Physical as-of merge join.
    *
    * Distribution: both sides clustered on their key (EnsureRequirements
    * inserts compatible hash exchanges); ordering: (key, time) ascending on
    * both sides, satisfied by the standard (spillable) Sort operator.
    * Execution: per co-partition, advance the right iterator alongside the
    * left one, retaining the latest right row per current key — one pass,
    * no buffering beyond a single row.
    */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val leftOut = left.output
      val rightOut = right.output
      val lKey = leftKey; val rKey = rightKey
      val lTime = leftTime; val rTime = rightTime
      val fullOut = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyEval = UnsafeProjection.create(Seq(lKey), leftOut)
        val rKeyEval = UnsafeProjection.create(Seq(rKey), rightOut)
        val lTimeEval = UnsafeProjection.create(Seq(lTime), leftOut)
        val rTimeEval = UnsafeProjection.create(Seq(rTime), rightOut)
        // bind against nullability-FORCED right attrs: binding to the
        // child's non-nullable originals would codegen away the null checks
        // and read garbage zeros from the all-null unmatched row
        val outProj = UnsafeProjection.create(fullOut,
          leftOut ++ rightOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rightOut.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rHead: InternalRow = _            // next unconsumed right row
          private var retained: InternalRow = _         // latest right row <= current left time, same key
          private var retainedKey: Long = 0L
          private var haveRetained = false

          private def advanceRightTo(key: Long, time: Long): Unit = {
            // consume right rows while (rkey < key) or (rkey == key && rtime <= time)
            var continue = true
            while (continue) {
              if (rHead == null && rIter.hasNext) rHead = rIter.next()
              if (rHead == null) continue = false
              else {
                val rk = rKeyEval(rHead)
                val rt = rTimeEval(rHead)
                if (rk.isNullAt(0) || rt.isNullAt(0)) {
                  rHead = null // SQL comparison semantics: null never matches
                } else if (rk.getLong(0) < key) {
                  rHead = null // skip keys before current
                } else if (rk.getLong(0) == key && rt.getLong(0) <= time) {
                  retained = rHead.copy(); retainedKey = rk.getLong(0)
                  haveRetained = true
                  rHead = null
                } else continue = false
              }
            }
          }

          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyEval(l)
            val lt = lTimeEval(l)
            if (lk.isNullAt(0) || lt.isNullAt(0))
              return outProj(joined(l, nullRight)) // null key/time: no match
            val key = lk.getLong(0)
            val time = lt.getLong(0)
            if (haveRetained && retainedKey != key) haveRetained = false
            advanceRightTo(key, time)
            val r = if (haveRetained && retainedKey == key) retained else nullRight
            outProj(joined(l, r))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  def install(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => Strategy)

  /** Public API: as-of join `left` with `right`. Key and time columns must
    * be LongType (map timestamps through `unix_micros` — monotonic and
    * lossless); that contract is ENFORCED here, not just documented — a
    * mistyped column fails fast instead of merge-reading garbage. Null keys
    * or times follow SQL comparison semantics: a null left key/time gets
    * the null right side; null right rows never match. Right-side duplicate
    * (key, time) pairs make the pick ambiguous — deduplicate upstream (the
    * gate query aggregates to unique pairs). A self-join whose right side
    * shares attributes with the left is re-aliased with fresh exprIds
    * (Catalyst's DeduplicateRelations does not know this node).
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.types.LongType
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // conflicting exprIds (self-join without full re-aliasing) would make
    // the output ambiguous downstream: mint fresh ids for the right side
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).nonEmpty)
        Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
      else rPlan0
    def attr(p: LogicalPlan, side: String, name: String) = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asof: $side column $name not found"))
      if (a.dataType != LongType)
        throw new IllegalArgumentException(
          s"asof: $side column $name must be LongType (unix_micros your " +
            s"timestamps), got ${a.dataType.simpleString}")
      a
    }
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, "left", leftKey), attr(rPlan, "right", rightKey),
      attr(lPlan, "left", leftTime), attr(rPlan, "right", rightTime)))
  }
}
