package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** An OPTIMIZER BARRIER around one expensive expression: evaluates to its
  * child unchanged (identity at runtime, zero per-row work in both the
  * interpreted and codegen paths), but reports `deterministic = false`, so
  *
  *  - `CollapseProject` may not inline the child into downstream
  *    projections that reference the aliased column more than once, and
  *  - `PushDownPredicates` may not substitute it into filter conditions
  *    pushed below the projection,
  *
  * which together guarantee the child is computed EXACTLY ONCE per row and
  * every consumer reads the materialized attribute. The pipeline scrub
  * (`CorpusPipeline.redactExpr` — a 3-regex+md5 rewrite referenced ~15× by
  * the quality gate) previously enforced this with a `mapPartitions`
  * identity, which costs a full InternalRow→Row→InternalRow codec round
  * trip per row and splits whole-stage codegen; this expression keeps the
  * single-evaluation guarantee inside one codegen stage at zero cost.
  *
  * The "nondeterminism" is a declaration to the optimizer only: the child
  * must itself be deterministic, so evaluation order/count changes from
  * other rules (e.g. speculative re-execution of a task) cannot change any
  * value — the expression exists to PIN the count at one per row, which is
  * always a legal schedule for a deterministic child.
  */
case class OptBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  // identity: no null-stripping wrapper — forward the child's eval/code
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): OptBarrier =
    copy(child = newChild)

  override def prettyName: String = "graft_opt_barrier"
}

