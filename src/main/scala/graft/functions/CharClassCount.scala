package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_cclass(text, kind, set)` — single-pass ASCII character-class
  * counting over the UTF-8 bytes, replacing regex scans on the
  * tokenization/quality hot paths:
  *
  *  - kind `runs`:  number of maximal runs of characters from `set`
  *    (== `size(regexp_extract_all(text, '[set]+'))` for ASCII sets,
  *    since a maximal byte run is exactly a maximal char run in UTF-8);
  *  - kind `count`: number of characters from `set`
  *    (== `length(regexp_replace(text, '[^set]', ''))`);
  *  - kind `count_not`: number of characters NOT in `set`, counting each
  *    non-ASCII code point once
  *    (== `size(regexp_extract_all(text, '[^set]'))` — note Java/RE2 `\s`
  *    is ASCII-only, so sets with whitespace semantics stay exact).
  *
  * `kind` and `set` are constructor constants (SQL callers pass foldable
  * string literals), compiled once into a 128-bit membership bitmap; the
  * scan is branch-light byte arithmetic with no allocation, inside
  * whole-stage codegen. A Java-regex `[^a-zA-Z0-9\s]` pass over a document
  * corpus is the kind of thing that dominates a 100 TB text-quality job;
  * this is the same answer at memcpy-like speed.
  */
case class CharClassCount(child: Expression, kind: String, set: String)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cclass requires STRING, got ${child.dataType.sql}")
    else if (!CharClassCount.Kinds.contains(kind))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cclass kind must be one of ${CharClassCount.Kinds.mkString("/")}, got '$kind'")
    else if (set.exists(_ >= 128))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_cclass set must be ASCII")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  private lazy val mode: Int = CharClassCount.Kinds.indexOf(kind)
  private lazy val (maskLo, maskHi) = {
    var lo = 0L; var hi = 0L
    set.foreach { c =>
      if (c < 64) lo |= 1L << c else hi |= 1L << (c - 64)
    }
    (lo, hi)
  }

  override def nullSafeEval(input: Any): Any =
    CharClassCount.compute(input.asInstanceOf[UTF8String], mode, maskLo, maskHi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharClassCount.compute($c, $mode, ${maskLo}L, ${maskHi}L)")

  override protected def withNewChildInternal(newChild: Expression): CharClassCount =
    copy(child = newChild)

  override def prettyName: String = "graft_cclass"
}

object CharClassCount {

  val Kinds: Seq[String] = Seq("runs", "count", "count_not")

  private def inSet(b: Int, lo: Long, hi: Long): Boolean =
    if (b < 64) ((lo >>> b) & 1L) != 0
    else ((hi >>> (b - 64)) & 1L) != 0

  /** One pass over the UTF-8 bytes; see class doc for the three modes. */
  def compute(s: UTF8String, mode: Int, lo: Long, hi: Long): Int = {
    val bytes = s.getBytes
    var i = 0
    var count = 0
    var prevIn = false
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) {
        val in = inSet(b, lo, hi)
        mode match {
          case 0 => if (in && !prevIn) count += 1; prevIn = in
          case 1 => if (in) count += 1
          case 2 => if (!in) count += 1
        }
      } else {
        // non-ASCII: out-of-set for runs/count; one char per lead byte for
        // count_not (continuation bytes 0x80-0xBF are skipped)
        mode match {
          case 0 => prevIn = false
          case 1 => ()
          case 2 => if ((b & 0xc0) != 0x80) count += 1
        }
      }
      i += 1
    }
    count
  }
}
