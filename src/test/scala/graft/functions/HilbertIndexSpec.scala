package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_hilbert: curve-math properties (bijection, unit-step adjacency —
  * the locality the c5 layout depends on), SQL registration/codegen parity,
  * and clamping totality.
  */
class HilbertIndexSpec extends SparkSpec {

  test("bijective on the full grid at order 3") {
    val n = 1 << 3
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex.compute(x.toLong, y.toLong, 3)
    assert(ds.toSet == (0L until (n.toLong * n)).toSet,
      "every cell maps to a distinct curve position covering [0, n²)")
  }

  test("consecutive curve positions are grid neighbors (locality)") {
    val order = 5
    val n = 1 << order
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertIndex.compute(x.toLong, y.toLong, order) -> (x, y)).toMap
    (1L until n.toLong * n).foreach { d =>
      val (x0, y0) = byD(d - 1)
      val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"curve step $d jumps from ($x0,$y0) to ($x1,$y1)")
    }
  }

  test("out-of-range coordinates clamp instead of failing") {
    val order = 4
    val hi = (1L << order) - 1
    assert(HilbertIndex.compute(-5L, 3L, order) ==
      HilbertIndex.compute(0L, 3L, order))
    assert(HilbertIndex.compute(99L, 3L, order) ==
      HilbertIndex.compute(hi, 3L, order))
  }

  test("SQL registration + codegen matches the static compute") {
    import spark.implicits._
    val order = 6
    val n = 1L << order
    val df = spark.range(0, 400)
      .select((col("id") * 37L % n).as("x"), (col("id") * 101L % n).as("y"))
    val got = df.select(col("x"), col("y"),
      GraftFunctions.hilbert(col("x"), col("y"), order).as("d")).collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        HilbertIndex.compute(r.getLong(0), r.getLong(1), order))
    }
    df.createOrReplaceTempView("hil_t")
    val viaSql = spark.sql(
      s"SELECT graft_hilbert(x, y, $order) AS d FROM hil_t").collect()
    assert(viaSql.map(_.getLong(0)).toSeq == got.map(_.getLong(2)).toSeq)
    // non-literal order is an analysis-time error, not a wrong answer
    intercept[Exception](
      spark.sql("SELECT graft_hilbert(x, y, x) FROM hil_t").collect())
  }

  test("null propagates") {
    import spark.implicits._
    val r = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(GraftFunctions.hilbert(col("x"), col("y"), 4)).collect()
    assert(r(0).isNullAt(0))
  }
}
