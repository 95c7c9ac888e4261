package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The one genuinely custom Catalyst piece for reference parity (SURVEY §4,
  * §7.3): BigQuery's `require_partition_filter = TRUE`
  * (`/root/reference/bq_create_table_ddl.sql:10-13`) — a guard that makes
  * full scans of the landing table a plan-time error rather than a 100 TB
  * accident. Spark has no built-in equivalent for file-based tables.
  *
  * Enforcement point: an **optimizer** rule (injected via
  * [[SparkSessionExtensions.injectOptimizerRule]]), NOT an analysis check.
  * Analysis runs eagerly on every intermediate Dataset — a check there would
  * reject `read()` before the caller ever gets to `.filter(partitionCol)`.
  * Optimization runs lazily, exactly once per executed action — the same
  * moment BigQuery enforces the flag (job submission). The rule never rewrites
  * the plan; it only throws on violation.
  *
  * A query is rejected iff it scans a protected table ROOT and no `Filter`
  * anywhere in the executed plan references at least one of that scan's
  * partition columns. Reading a per-partition subdirectory directly is always
  * allowed — the path itself is the filter (the reference's decorator
  * addressing, `tasks.py:24-25`). Pruning itself is Catalyst's
  * `PruneFileSourcePartitions`; this rule only enforces that pruning CAN
  * happen.
  */
object RequirePartitionFilter {

  /** Registry of protected landing-table root paths. */
  private val protectedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def protect(path: String): Unit = protectedPaths.add(normalize(path))
  def unprotect(path: String): Unit = protectedPaths.remove(normalize(path))
  def clear(): Unit = protectedPaths.clear()

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:/+", "/")

  /** Install into a session builder:
    * `SparkSession.builder.withExtensions(RequirePartitionFilter.install)`.
    */
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => CheckRule)

  object CheckRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = { check(plan); plan }
  }

  /** Throws on an unconstrained scan of a protected table. Public for tests
    * and for engines embedding the check elsewhere.
    */
  def check(plan: LogicalPlan): Unit = {
    if (protectedPaths.isEmpty) return
    // Partition attributes referenced by any Filter in the plan, including
    // inside subqueries.
    def filterRefs(p: LogicalPlan): Set[String] = {
      var refs = Set.empty[String]
      p.foreach {
        case Filter(cond, _) =>
          refs ++= cond.references.map(_.name)
          cond.foreach {
            case s: SubqueryExpression => refs ++= filterRefs(s.plan)
            case _ =>
          }
        case _ =>
      }
      refs
    }
    val constrained = filterRefs(plan)
    plan.foreach {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
          if isProtected(fs) && fs.partitionSchema.nonEmpty =>
        val partCols = fs.partitionSchema.fieldNames.toSet
        if (partCols.intersect(constrained).isEmpty)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"Scan of partition-filter-required table at " +
               s"${fs.location.rootPaths.mkString(",")} has no filter on " +
               s"partition columns [${partCols.mkString(", ")}]. " +
               s"Add a predicate on a partition column (reference parity: " +
               s"BigQuery require_partition_filter=TRUE).")))
      case _ =>
    }
  }

  // Only the table ROOT is protected: reading a per-partition subdirectory
  // directly is already maximally pruned (the path IS the filter).
  private def isProtected(fs: HadoopFsRelation): Boolean =
    fs.location.rootPaths.exists(rp => protectedPaths.contains(normalize(rp.toString)))
}
