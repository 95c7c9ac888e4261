package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** d41 IMI co-bin recall: structural invariants of the measurement (the
  * exact value is oracle-checked at the gate).
  */
class D41CobinSpec extends SparkSpec {

  test("d41: recall is a true fraction of the flat pair set") {
    val r = VectorQueries.d41ImiCobinRecall(spark, sfDir).collect()(0)
    val nFlat = r.getAs[Long]("n_flat_pairs")
    val nCo = r.getAs[Long]("n_cobinned")
    val recall = r.getAs[Double]("cobin_recall")
    assert(nFlat > 0, "gate fixture must produce flat near-dup pairs")
    assert(nCo >= 0 && nCo <= nFlat)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(math.abs(recall - nCo.toDouble / nFlat) < 1e-5)
  }

  test("d41: IMI co-binning agrees with d40's bin assignment") {
    // every pair counted as co-binned must land in one d40 bin together:
    // restate the IMI assignment through d36's forceK=16 path and bound
    // the co-binned count by the within-bin pair capacity the d40 census
    // implies — the POSITIVE case, which the gate fixture exercises (the
    // degenerate no-2+-bin case would pin nothing here)
    val d40 = DedupQueries.d36SemanticDedup(spark, sfDir, forceK = Some(16))
    val capacity = d40.select(
      sum((col("n_vectors") * (col("n_vectors") - 1) / 2).cast("long"))
        .as("cap"))
      .collect()(0).getAs[Long]("cap")
    val r = VectorQueries.d41ImiCobinRecall(spark, sfDir).collect()(0)
    val nCo = r.getAs[Long]("n_cobinned")
    if (capacity == 0) assert(nCo == 0,
      "no IMI bin holds 2+ vectors, nothing can co-bin")
    else {
      assert(capacity > 0 && nCo <= capacity,
        s"$nCo co-binned pairs exceed the $capacity within-bin pairs " +
          "d40's census allows — the two assignments disagree")
      // the gate fixture is built to have SOME flat near-dup pair land in
      // a shared IMI cell; a zero here would mean the d41 join is broken
      // even though capacity exists
      assert(nCo > 0,
        s"capacity $capacity within-bin pairs exist but none of the flat " +
          "near-dup pairs co-binned — d41's endpoint join is suspect")
    }
  }
}
