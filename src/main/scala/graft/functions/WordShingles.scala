package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text)` — generator (UDTF surface): emits one row per
  * distinct word 3-gram shingle of the input, `(pos INT, shingle STRING)`.
  * The table-function form of [[graft.operators.DedupQueries]]'s shingling:
  * where the column form materializes the whole shingle array per row
  * before exploding it, a Generator streams shingles straight into the
  * downstream operator — on 100 TB of documents that's the difference
  * between an array allocation the size of the document and none.
  *
  * Semantics (shared with the column form and the duckdb oracles): tokens =
  * `\s+`-split of the trimmed text; documents with < 3 tokens yield the
  * whole text as their single shingle; shingles are de-duplicated keeping
  * first position.
  */
case class WordShingles(child: Expression)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema, false)
  override def inline: Boolean = false
  override def position: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires STRING, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else WordShingles.shinglesOf(v.asInstanceOf[UTF8String].toString).zipWithIndex
      .map { case (s, i) => InternalRow(i, UTF8String.fromString(s)) }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

object WordShingles {
  /** Distinct word 3-gram shingles in first-occurrence order; < 3 tokens =>
    * the whole text. Mirrors DedupQueries.shingles3 / the duckdb CTEs.
    */
  def shinglesOf(text: String): Iterator[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length >= 3) {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i + 2 < toks.length) {
        seen += s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"
        i += 1
      }
      seen.iterator
    } else Iterator.single(text)
  }
}
