package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for graft's custom Catalyst functions.
  *
  * Install alongside the partition-filter rule:
  * {{{
  * SparkSession.builder.withExtensions { ext =>
  *   graft.plans.RequirePartitionFilter.install(ext)
  *   graft.functions.GraftFunctions.install(ext)
  * }
  * }}}
  * After install, `graft_hour_bucket(ts)` is available in SQL text and via
  * [[hourBucket]] in the Column API.
  */
object GraftFunctions {

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hour_bucket"),
      new ExpressionInfo(classOf[HourBucket].getName, "graft_hour_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_hour_bucket takes 1 argument")
        HourBucket(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_h60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "graft_h60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_h60 takes 1 argument")
        Md5Prefix60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_shingles takes 1 argument")
        WordShingles(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_hilbert takes (cx, cy, order)")
        val order = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "graft_hilbert order must be an integer literal")
        }
        HilbertIndex(children.head, children(1), order)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_opt_barrier"),
      new ExpressionInfo(classOf[OptBarrier].getName, "graft_opt_barrier"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_opt_barrier takes 1 argument")
        OptBarrier(children.head)
      }))
    // Spark's own PercentileDisc expression evaluates a WHOLE ARRAY of
    // percentages from ONE value->count buffer (PercentileBase.percentages
    // is plural; getPercentile runs per requested p over the same sorted
    // counts) — only the SQL WITHIN GROUP builder restricts it to a scalar
    // per call, which forces q42-style queries to keep one full hashmap
    // buffer PER percentile of the SAME column. Registering the expression
    // under an array-accepting name collapses those buffers to one with
    // values identical by construction (it IS the built-in's code path).
    ext.injectFunction((
      FunctionIdentifier("graft_percentile_disc"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .PercentileDisc].getName, "graft_percentile_disc"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_percentile_disc takes (col, percentage-or-array)")
        org.apache.spark.sql.catalyst.expressions.aggregate.PercentileDisc(
          children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cclass"),
      new ExpressionInfo(classOf[CharClassCount].getName, "graft_cclass"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_cclass takes (text, kind, set)")
        def litStr(e: Expression, what: String): String = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(
                v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case _ => throw new IllegalArgumentException(
            s"graft_cclass $what must be a string literal")
        }
        CharClassCount(children.head,
          litStr(children(1), "kind"), litStr(children(2), "set"))
      }))
  }

  /** Column-API form of `graft_hour_bucket` (requires [[install]]ed session). */
  def hourBucket(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_hour_bucket", c)

  /** Column-API form of `graft_h60` (requires [[install]]ed session). */
  def h60(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_h60", c)

  /** Column-API form of `graft_hilbert` (requires [[install]]ed session). */
  def hilbert(cx: Column, cy: Column, order: Int): Column =
    org.apache.spark.sql.functions.call_function("graft_hilbert", cx, cy,
      org.apache.spark.sql.functions.lit(order))

  /** Column-API form of `graft_cclass` (requires [[install]]ed session). */
  def cclass(c: Column, kind: String, set: String): Column =
    org.apache.spark.sql.functions.call_function("graft_cclass", c,
      org.apache.spark.sql.functions.lit(kind),
      org.apache.spark.sql.functions.lit(set))

  /** Column-API form of `graft_opt_barrier` (requires [[install]]ed
    * session) — pin an expensive deterministic expression to exactly one
    * evaluation per row (see [[OptBarrier]]).
    */
  def optBarrier(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_opt_barrier", c)
}
