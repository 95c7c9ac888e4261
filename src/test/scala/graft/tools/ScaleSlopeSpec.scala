package graft.tools

import graft.SparkSpec
import java.nio.file.Files

/** Regression protection for the scale story (VERDICT r9 #5): the property
  * that makes the dedup family survive 100 TB is that its OUTPUT (and so
  * its join work) grows LINEARLY in corpus replicas — a quadratic
  * cross-replica pair explosion is exactly the all-pairs regression the
  * replica design exists to expose. Wall-clock slopes live in
  * `target/scaleslope.json` (ScaleSlope tool; timings on a shared host are
  * not spec material) — here the linearity is asserted on deterministic
  * cardinalities, which is the signal a timing slope would detect, minus
  * the host noise.
  *
  * Replica semantics under test (ScaleSlope.replicateDocs): each replica's
  * tokens are remapped by a replica-salted hash, so duplicate structure is
  * reproduced INSIDE each replica and never across replicas.
  */
class ScaleSlopeSpec extends SparkSpec {

  private val factor = 4

  private lazy val scaled: String = {
    val out = Files.createTempDirectory("graft-scalespec").toString
    ScaleSlope.replicateDocs(spark, sfDir, out, factor)
    out
  }

  test("d13 LSH verified pairs scale ~linearly in corpus replicas") {
    val base = graft.SparkEntry.queries("d13_lsh_pairs")(spark, sfDir).count()
    val big = graft.SparkEntry.queries("d13_lsh_pairs")(spark, scaled).count()
    // ~linear, not exact: the collision-free remap preserves each replica's
    // TRUE Jaccard structure bijectively, but each replica's minhash values
    // differ, so banding catches a slightly different subset of the
    // borderline pairs per replica (measured: 235 vs 4x54=216 at factor 4 —
    // LSH recall variance, deterministic per corpus). What must NOT happen
    // is the quadratic regression this spec exists for: naive copying makes
    // every doc a cross-replica duplicate and the verified pair count jumps
    // to >= docs*C(factor,2) ≈ 3000 here. A generous linear band separates
    // the two regimes by an order of magnitude.
    assert(base > 0, "fixture must produce pairs")
    assert(big >= (factor * base * 0.7).toLong &&
      big <= (factor * base * 1.4).toLong,
      s"expected ~${factor}x$base, got $big")
  }

  test("d15 surviving-document total scales exactly linearly in replicas") {
    import org.apache.spark.sql.functions.sum
    def survivors(dir: String): Long =
      graft.SparkEntry.queries("d15_corpus_dedup")(spark, dir)
        .agg(sum("survivors")).collect()(0).getLong(0)
    // the query's output is per-source stats (fixed row count); the
    // replica-linear quantity is the TOTAL of surviving docs
    val base = survivors(sfDir)
    val big = survivors(scaled)
    assert(base > 0)
    assert(big == factor * base, s"expected ${factor}x$base, got $big")
  }

  test("embedding replicas: sign flip preserves within-replica dots EXACTLY and decorrelates across replicas") {
    import org.apache.spark.sql.functions._
    // the property the d36 slope's meaning depends on: a per-replica ±1
    // diagonal is orthogonal, so replica r's similarity structure is the
    // original's, bit-for-bit — while cross-replica images of the SAME
    // vector stop being near-duplicates (else the slope would measure a
    // factor-way duplicate explosion, a data property, not the engine)
    val out = Files.createTempDirectory("graft-scalespec-emb").toString
    ScaleSlope.replicateEmb(spark, sfDir, out, 2)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val span = emb.count() / 2
    def dotCol(a: String, b: String) =
      aggregate(zip_with(col(a), col(b),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // within-replica: dot(v_i, v_j) identical in replica 0 and replica 1
    // for the first 20 ids — exact equality, not approximate
    val r0 = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("i"), col("embedding").as("e0"))
    val r1 = emb.filter(col("vec_id") >= span && col("vec_id") < span + 20)
      .select((col("vec_id") - span).as("i"), col("embedding").as("e1"))
    val paired = r0.crossJoin(r0.select(col("i").as("j"), col("e0").as("f0")))
      .filter(col("i") < col("j"))
      .join(r1, "i")
      .join(r1.select(col("i").as("j"), col("e1").as("f1")), "j")
      .select(dotCol("e0", "f0").as("d0"), dotCol("e1", "f1").as("d1"),
        dotCol("e0", "e1").as("cross"),
        sqrt(dotCol("e0", "e0")).as("n0"), sqrt(dotCol("e1", "e1")).as("n1"))
      .collect()
    assert(paired.nonEmpty)
    paired.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"within-replica dot not preserved: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // cross-replica: the same vector's two images are far from duplicates
    // (cosine well below the d36 threshold 0.25 on average; individual
    // vectors vary, so assert the mean)
    val crossCos = paired.map(r => math.abs(r.getDouble(2)) /
      (r.getDouble(3) * r.getDouble(4)))
    assert(crossCos.sum / crossCos.length < 0.25,
      s"cross-replica images still correlated: mean ${crossCos.sum / crossCos.length}")
  }
}
