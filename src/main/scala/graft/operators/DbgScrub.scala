package graft.operators

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: where does scrub time go at a scale dir — redact regexes,
  * tokenize, quality gates, shingles, the LM bigram join. Not a gate.
  */
object DbgScrub {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/scale/x10"
    // "explain" mode: print the scrub fragment's FORMATTED plan — the
    // stage the full-query plan dumps cannot show (x1–x4/st19 explains
    // start at the post-checkpoint snapshot scan). A reader checks:
    // (a) no DeserializeToObject/MapPartitions/SerializeFromObject triple
    // (the row-codec barrier removed in r21), (b) the redact chain appears
    // exactly once, under graft_opt_barrier, (c) scan → scrub → gate →
    // tokenize sits in ONE WholeStageCodegen span.
    if (args.length > 1 && args(1) == "explain") {
      val spark = GraftSession.builder("local[4]", 4).getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val docs = RelationalQueries.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      println(CorpusPipeline.scrubbedQualityDocs(docs)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      spark.stop()
      return
    }
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = RelationalQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .localCheckpoint(true)
    def t(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scrub] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    t("raw count")(docs.count())
    t("scrubbedQualityDocs")(
      CorpusPipeline.scrubbedQualityDocs(docs).count())
    t("scrub again (warm)")(
      CorpusPipeline.scrubbedQualityDocs(docs).count())
    t("scrub repart32")(
      CorpusPipeline.scrubbedQualityDocs(docs.repartition(32)).count())
    t("redact only, repart32")(
      CorpusPipeline.redactProbe(docs.repartition(32)).count())
    // bisect the quality-gate expressions
    import graft.functions.GraftFunctions.cclass
    val d32 = docs.repartition(32).localCheckpoint(true)
    def occ(low: org.apache.spark.sql.Column, pat: String) =
      ((length(low) - length(replace(low, lit(pat), lit("")))) / lit(pat.length))
        .cast("long")
    t("tokens split only")(
      d32.select(split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) > 0).count())
    t("cclass aeiou only")(
      d32.filter(cclass(col("text"), "count", "aeiou") >= 0).count())
    t("cclass punct only")(
      d32.filter(cclass(col("text"), "count", ".!?,;:") >= 0).count())
    val low = lower(col("text"))
    t("occ x6 only")(
      d32.filter(occ(low, "the") + occ(low, "and") + occ(low, "ing") +
        occ(low, "dat") + occ(low, "tab") + occ(low, "row") >= 0).count())
    // the scrub with a mapPartitions barrier after the redact projection:
    // if the 92 s is project-collapse re-derivation, this drops to seconds
    t("scrub with barrier")({
      val red = CorpusPipeline.redactProbe(d32)
      val bar = red.mapPartitions(it => it)(
        org.apache.spark.sql.Encoders.row(red.schema))
      val withT = bar.select(col("doc_id"), col("text"),
        split(trim(col("text")), "\\s+").as("t"))
      val triEn = occ(low, "the") + occ(low, "and") + occ(low, "ing")
      val triData = occ(low, "dat") + occ(low, "tab") + occ(low, "row")
      val logit = lit(-2.0) + lit(0.004) * length(col("text")) -
        lit(0.05) * size(col("t")) +
        lit(0.02) * cclass(col("text"), "count", "aeiou") -
        lit(0.8) * cclass(col("text"), "count", ".!?,;:")
      withT.filter(logit > lit(-2.0) && triData <= triEn * lit(5L)).count()
    })
    t("scrub + shingles")(
      DedupQueries.shingleFrameFrom(
        CorpusPipeline.scrubbedQualityDocs(docs)
          .select(col("doc_id"), col("text"), col("t"))).count())
    val bq = CorpusPipeline.scrubbedQualityDocs(docs).localCheckpoint(true)
    t("bigramPairs explode")(
      bq.select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("bg")).count())
    spark.stop()
  }
}
