package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round-5 operators (the oracle gate proves value
  * equality against duckdb; these prove the semantic shape).
  */
class Round5QueriesSpec extends SparkSpec {

  test("d24: redaction leaves no residual PII and the salt guarantees work") {
    val out = TextQueries.d24PiiRedact(spark, sfDir)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+1-555-[0-9]{4}"
    val ip = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    // at least one detection of each family per document (the injected salt)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1 ||
      col("n_ips") < 1).isEmpty)
    // nothing matching any family survives in the redacted text
    val residual = out.filter(
      size(regexp_extract_all(col("redacted"), lit(email), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"), lit(phone), lit(0))) > 0 ||
      size(regexp_extract_all(col("redacted"), lit(ip), lit(0))) > 0)
    assert(residual.isEmpty)
    // placeholders actually landed
    assert(out.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>") ||
      !col("redacted").contains("<IP>")).isEmpty)
  }

  test("d25: only train docs are flagged, with positive overlap evidence") {
    val out = TextQueries.d25Decontaminate(spark, sfDir)
    assert(out.filter(col("doc_id") % 40 === 0).isEmpty)
    assert(out.filter(col("leaked_shingles") < 1 || col("eval_docs_hit") < 1)
      .isEmpty)
  }

  test("d26: temperature thresholds are valid and anti-monotone in size") {
    val rows = TextQueries.d26DomainMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, total, pct, kept) =>
      assert(pct >= 0 && pct <= 100)
      assert(kept >= 0 && kept <= total)
    }
    // the smallest source keeps everything (rate 100); larger sources keep
    // proportionally less: keep_pct is anti-monotone in total
    val minTotal = rows.map(_._2).min
    rows.filter(_._2 == minTotal).foreach { case (_, _, pct, _) =>
      assert(pct == 100)
    }
    val sorted = rows.sortBy(_._2)
    sorted.zip(sorted.tail).foreach { case ((_, t1, p1, _), (_, t2, p2, _)) =>
      assert(p2 <= p1, s"keep_pct not anti-monotone: ($t1,$p1) vs ($t2,$p2)")
    }
  }

  test("d27: keep is exactly the sign of the margin") {
    val out = TextQueries.d27QualityClassifier(spark, sfDir)
    assert(out.filter(col("logit").isNull || isnan(col("logit"))).isEmpty)
    assert(out.filter(col("keep") =!= (col("logit") > 0.0)).isEmpty)
  }

  test("e13: the refined top-k is drawn from the ADC shortlist, re-ordered exactly") {
    val refined = VectorQueries.e13PqRefine(spark, sfDir)
    val shortlist = VectorQueries.e11PqAdc(spark, sfDir, k = 10)
      .select(col("query_id"), col("neighbor_id"))
    // stage 2 can only re-rank stage-1 candidates, never introduce new ones
    assert(refined.join(shortlist, Seq("query_id", "neighbor_id"), "left_anti")
      .isEmpty)
    // per query: exactly k rows, ranks 1..k, similarity non-increasing
    val perQ = refined.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("mn"), max("rank").as("mx"))
    assert(perQ.filter(col("n") =!= 3 || col("mn") =!= 1 || col("mx") =!= 3)
      .isEmpty)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rank")
    assert(refined
      .withColumn("prev", lag(col("refined_sim"), 1).over(w))
      .filter(col("prev").isNotNull && col("refined_sim") > col("prev"))
      .isEmpty)
  }

  test("st7: hourly rollup agrees with the single-level streaming hourly counts") {
    // both queries share the watermark-closure rule but replay different
    // scopes (st7 is glob-pruned to days 01-09; st1 replays the full month),
    // so the contract is subset-agreement on the shared scope: every hour the
    // chained (15min -> hour) pyramid emits must appear in st1 with the SAME
    // event count, and st7 must emit a non-trivial number of hours
    val st1 = IngestParityQueries.st1StreamingHourly(spark, sfDir)
      .select(col("hour_ts"), col("cnt").as("cnt1"))
    val st7 = IngestParityQueries.st7ChainedAgg(spark, sfDir)
      .select(col("hour_ts"), col("cnt"))
    assert(st7.count() > 0)
    // st7 ⊆ st1: no st7 hour missing from st1
    assert(st7.join(st1, Seq("hour_ts"), "left_anti").isEmpty)
    // and on the shared hours the counts agree exactly
    assert(st7.join(st1, Seq("hour_ts")).filter(col("cnt") =!= col("cnt1"))
      .isEmpty)
    // and the quarter-level metadata is internally consistent
    val bad = IngestParityQueries.st7ChainedAgg(spark, sfDir)
      .filter(col("n_quarters") < 1 || col("n_quarters") > 4 ||
        col("max_quarter") > col("cnt"))
    assert(bad.isEmpty)
  }
}
