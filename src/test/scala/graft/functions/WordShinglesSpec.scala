package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_shingles generator: agreement with the column-form shingling and
  * the documented edge semantics.
  */
class WordShinglesSpec extends SparkSpec {

  test("generator output equals posexplode of the column-form shingles") {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .unionAll(Seq((9001L, "one two", "x", "x", 7L),
        (9002L, "  padded   text   here  now ", "x", "x", 28L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .createOrReplaceTempView("ws_docs")
    val gen = spark.sql(
      """SELECT doc_id, s.pos, s.shingle FROM ws_docs
        |LATERAL VIEW graft_shingles(text) s AS pos, shingle""".stripMargin)
    val t = split(trim(col("text")), "\\s+")
    val colForm = spark.table("ws_docs")
      .select(col("doc_id"),
        posexplode(
          when(size(t) >= 3,
            array_distinct(transform(sequence(lit(1), size(t) - 2),
              i => concat_ws(" ", slice(t, i, lit(3))))))
            .otherwise(array(col("text")))).as(Seq("pos", "shingle")))
    assert(gen.exceptAll(colForm).isEmpty && colForm.exceptAll(gen).isEmpty)
  }

  test("null input yields no rows; short text yields itself at pos 0") {
    import spark.implicits._
    Seq((1L, Some("only two")), (2L, None: Option[String]))
      .toDF("id", "s").createOrReplaceTempView("ws_edge")
    val rows = spark.sql(
      """SELECT id, s2.pos, s2.shingle FROM ws_edge
        |LATERAL VIEW graft_shingles(s) s2 AS pos, shingle""".stripMargin)
      .collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 1L &&
      rows(0).getInt(1) == 0 && rows(0).getString(2) == "only two")
  }
}
