package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_h60(text)` — the engine's cross-engine-deterministic 60-bit string
  * hash: the first 15 hex digits of md5, as a LONG. Bit-identical to
  * `conv(substr(md5(x), 1, 15), 16, 10)` (and to DuckDB's
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`), which is what every
  * MinHash/SimHash oracle query is built on.
  *
  * Exists for performance: the composed form materializes a 32-char hex
  * string per value, substrings it, and re-parses digits through `conv` —
  * per shingle, that churn dominates the digest itself. This expression
  * reads the leading 60 bits straight off the digest bytes (zero
  * intermediate objects beyond the digest) and stays inside whole-stage
  * codegen via [[doGenCode]]. MinHash over word-shingles hashes every
  * shingle of every document — at 100 TB this is the hottest scalar in the
  * dedup pipeline.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_h60 requires STRING, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)

  override def prettyName: String = "graft_h60"
}

object Md5Prefix60 {

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) == integer value of the first 15 hex
    * digits of the digest: big-endian read of the leading 8 bytes, dropping
    * the low nibble of byte 7.
    */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }
}
