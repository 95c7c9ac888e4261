package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stop-shingle regression pins for the x1/st19 near-dup stage.
  *
  * The pathology (r15, found at x100): a corpus-wide boilerplate tail —
  * here the exact placeholder suffix the PII scrub stamps on every
  * redacted document — dominates short documents' minhash minima, so all
  * short docs band into ONE bucket (candidate pairs ∝ corpus²) and the
  * shared tail alone lifts the exact Jaccard of two UNRELATED documents
  * past the 0.5 removal threshold, mass-deleting distinct content. The
  * cure is a document-frequency cap: [[CorpusPipeline.stopShingles]]
  * (df > n/2, trained once and frozen) and
  * [[CorpusPipeline.contentShingles]] (banding AND verification both run
  * on the df-capped sets). This spec pins BOTH directions on a synthetic
  * boilerplate corpus: the pathology exists on full shingle sets (so the
  * cap is load-bearing, not decorative) and is gone on content shingles,
  * while a genuine near-dup pair is still caught.
  */
class StopShingleSpec extends SparkSpec {

  // the shared boilerplate tail: 7 tokens → five pure-tail 3-gram
  // shingles, the placeholder-suffix shape the scrub manufactures
  private val tail = "contact <EMAIL> call <PHONE> from <IP> now"

  // 40 unrelated one-word documents + one pure-boilerplate document +
  // one near-dup pair (20 content words differing in ONE mid-word)
  private lazy val corpus: DataFrame = {
    val sess = spark
    import sess.implicits._
    val unrelated = (1 to 40).map(i => (i.toLong, s"unique$i $tail"))
    val boilerOnly = Seq((90L, tail))
    val base = (1 to 20).map(j => s"w$j")
    val nearA = (100L, (base :+ tail).mkString(" "))
    val nearB = (101L, (base.updated(9, "CHANGED") :+ tail).mkString(" "))
    (unrelated ++ boilerOnly ++ Seq(nearA, nearB))
      .toDF("doc_id", "text")
      .withColumn("t", split(trim(col("text")), "\\s+"))
  }

  private lazy val stop = CorpusPipeline.stopShingles(corpus)
  private lazy val full = DedupQueries.shingleFrameFrom(corpus)
  private lazy val content = CorpusPipeline.contentShingles(full, stop)

  test("stop set is exactly the pure-boilerplate shingles, bounded") {
    // only the five pure-tail 3-grams reach df > n/2; every shingle
    // touching a content word has df ≤ 2. Boundedness by construction:
    // a df > n/2 shingle consumes n/2 of the Σ|sh| instances, so the
    // driver-side collect can never exceed 2·avg-shingles-per-doc.
    val tailToks = tail.split(" ")
    val pureTail = (0 to tailToks.length - 3)
      .map(i => tailToks.slice(i, i + 3).mkString(" ")).sorted
    assert(stop.toSeq == pureTail,
      s"stop set ${stop.toSeq} != pure-tail shingles $pureTail")
  }

  test("boilerplate-only docs drop out of the near-dup stage entirely") {
    val ids = content.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(90L), "a doc with ONLY stop shingles must not band")
    assert(ids.size == 42, "every doc with content must keep shingles")
    // and no stop shingle survives in any content set
    val leaked = content.select(explode(col("sh")).as("s"))
      .filter(col("s").isin(stop.toSeq: _*)).count()
    assert(leaked == 0, s"$leaked stop shingles leaked into content sets")
  }

  test("the pathology exists on FULL sets and is gone on content sets") {
    // full sets: the tail's five shared shingles overwhelm the one
    // content shingle of every short doc — unrelated docs pair up at
    // Jaccard ≥ 0.5 quadratically (the cap is load-bearing)
    val fullBad = DedupQueries.lshVerifiedPairsFrom(full)
      .filter(col("jaccard") >= 0.5)
      .filter(col("id_a") <= 40 && col("id_b") <= 40).count()
    assert(fullBad > 40L,
      s"expected ∝ n² false pairs among 40 unrelated docs on full " +
        s"shingle sets, got $fullBad — the synthetic pathology is broken")
    // content sets: zero pairs among the unrelated docs — at any corpus
    // size (the candidate join itself stays bounded, pinned below)
    val verified = DedupQueries.lshVerifiedPairsFrom(content)
      .filter(col("jaccard") >= 0.5).collect()
    val bad = verified.filter(r => r.getLong(0) <= 40 && r.getLong(1) <= 40)
    assert(bad.isEmpty,
      s"unrelated docs removed as near-dups: ${bad.mkString(", ")}")
    // ...while the genuine near-dup pair (19 of 20 content words shared,
    // content-shingle Jaccard ≈ 0.6) is STILL banded and verified — the
    // df cap must not destroy recall
    assert(verified.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L),
      s"the true near-dup pair was lost; verified=${verified.mkString(", ")}")
  }

  test("candidate pairs are bounded by true dups, not corpus²") {
    val candFull = DedupQueries.lshCandidatePairsFrom(
      DedupQueries.minhashBandsFrom(full)).count()
    val candContent = DedupQueries.lshCandidatePairsFrom(
      DedupQueries.minhashBandsFrom(content)).count()
    assert(candFull > 400L,
      s"full-set banding should collapse the corpus into one bucket " +
        s"(∝ n²/2 candidates), got $candFull")
    assert(candContent <= 3L,
      s"content-set banding must emit only true-dup candidates, got $candContent")
  }
}
