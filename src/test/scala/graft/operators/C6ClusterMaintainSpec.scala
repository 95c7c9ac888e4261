package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c6 recurring Hilbert re-cluster: the contracts the box-aggregate oracle
  * can't see — the maintenance pass never touches the historical
  * generation's files, and re-clustering the appends strictly improves box
  * pruning over the arrival-order layout.
  */
class C6ClusterMaintainSpec extends SparkSpec {

  private lazy val diag = MaintenanceQueries.c6Run(spark, sfDir)

  test("c6: maintenance preserves the historical generation's file identity") {
    // copy-on-write at 100 TB: the re-cluster job must rewrite ONLY the
    // appended generation — same base paths, same mtimes, nothing read
    // back and re-landed
    assert(diag.baseFilesBefore.nonEmpty)
    assert(diag.baseFilesAfter == diag.baseFilesBefore,
      s"base generation changed: before=${diag.baseFilesBefore.size} " +
        s"after=${diag.baseFilesAfter.size}")
  }

  test("c6: re-clustering the appends strictly improves box pruning") {
    // before: delta files landed in arrival order — full-width boxes that
    // intersect any query box; after: compact Hilbert boxes. Fewer files
    // selected AND fewer live files (re-cluster also coalesced deltas).
    assert(diag.selAfter < diag.selBefore,
      s"box prune did not improve: ${diag.selBefore}/${diag.totBefore} -> " +
        s"${diag.selAfter}/${diag.totAfter}")
    assert(diag.selAfter < diag.totAfter,
      s"box query still opens every file: ${diag.selAfter}/${diag.totAfter}")
  }

  test("c6: the maintained layout answers the box aggregate exactly") {
    val ev = RelationalQueries.eventsTable(spark, sfDir)
    val b = ev.agg(min(col("user_id")), max(col("user_id")),
      min(col("event_id")), max(col("event_id"))).collect()(0)
    val (uMn, uMx, eMn, eMx) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val expected = ev
      .filter(col("user_id").between(uMn + (uMx - uMn) / 4,
        uMn + (uMx - uMn) / 2) &&
        col("event_id").between(eMn + (eMx - eMn) / 8,
          eMn + 3 * (eMx - eMn) / 8))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("event_id")).as("sum_eid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val got = diag.result
      .select(col("event_type"), col("cnt"), col("sum_eid"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.nonEmpty && got.sameElements(expected))
  }
}
