package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins graft_percentile_disc's array form to the built-in scalar
  * percentile_disc, element by element, over data engineered to hit the
  * boundary cases that distinguish disc implementations: heavy ties,
  * single-row groups, and percentages landing exactly on cumulative-count
  * edges. The function IS Spark's PercentileDisc expression (array support
  * is native to PercentileBase), so this is a wiring regression guard,
  * not a numeric re-derivation.
  */
class PercentileDiscArraySpec extends SparkSpec {

  test("graft_percentile_disc(col, array) matches scalar percentile_disc") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 3 groups: skewed tied values, uniform, and a 1-row group
    val rows =
      (1 to 500).map(i => ("a", (rnd.nextInt(7) * rnd.nextInt(3)).toDouble)) ++
      (1 to 97).map(i => ("b", rnd.nextDouble() * 100)) ++
      Seq(("c", 5.0))
    rows.toDF("g", "v").createOrReplaceTempView("pdisc_probe")
    val ps = Seq(0.0, 0.1, 0.25, 0.3333333333333333, 0.5, 0.9, 0.99, 1.0)
    val arr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val scalarCols = ps.zipWithIndex.map { case (p, i) =>
      s"percentile_disc(${p}D) WITHIN GROUP (ORDER BY v) AS s$i"
    }.mkString(", ")
    val got = spark.sql(
      s"""SELECT g, graft_percentile_disc(v, $arr) AS qa, $scalarCols
         |FROM pdisc_probe GROUP BY g""".stripMargin).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val qa = r.getSeq[Double](1)
      assert(qa.length == ps.length)
      ps.indices.foreach { i =>
        assert(qa(i) == r.getDouble(2 + i),
          s"group ${r.getString(0)} p=${ps(i)}: array=${qa(i)} " +
            s"scalar=${r.getDouble(2 + i)}")
      }
    }
  }
}
